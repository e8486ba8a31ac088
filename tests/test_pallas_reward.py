"""Fused whole-network Pallas kernel (ops/pallas_reward.py) vs the XLA
structured runners.

On CPU the kernel runs in interpret mode, so these tests check the fused
step's *semantics* (ordering, visit gating, dopamine decay, trace
alternation) against the XLA paths that are themselves golden-tested
against the reference transcriptions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn


def _standalone(use_pallas, iters, with_reward=True, rows=12, cols=12):
    lat = snn.RewardModulatedLattice(snn.Izhikevich())
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                and x != y)
    v0 = np.random.default_rng(0).uniform(-65, 30, rows * cols)
    lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
    lat.use_pallas = use_pallas
    if with_reward:
        lat.run_lattice_with_reward(0.5, iters)
    else:
        lat.dopamine = 0.3
        lat.run_lattice(iters)
    return lat


def _assert_lattice_match(a, b):
    np.testing.assert_allclose(np.asarray(b.state["v"]),
                               np.asarray(a.state["v"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.state["w"]),
                               np.asarray(a.state["w"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(b.state["last_firing_time"]),
        np.asarray(a.state["last_firing_time"]))
    np.testing.assert_array_equal(np.asarray(b.state["is_spiking"]),
                                  np.asarray(a.state["is_spiking"]))
    np.testing.assert_allclose(np.asarray(b.graph.weights),
                               np.asarray(a.graph.weights),
                               rtol=1e-5, atol=1e-5)


def test_fused_standalone_rstdp_matches_xla():
    """Whole-lattice R-STDP: weights, traces, dopamine, spike timing.
    121 steps exercises the 16-step chunking plus the remainder launch."""
    a = _standalone(False, 121)
    b = _standalone(True, 121)
    assert b._last_run_fused and not a._last_run_fused
    _assert_lattice_match(a, b)
    for k in ("c", "dw"):
        np.testing.assert_allclose(np.asarray(b.trace[k]),
                                   np.asarray(a.trace[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(b.trace["counter"]),
                                  np.asarray(a.trace["counter"]))
    assert abs(a.dopamine - b.dopamine) <= 1e-5 * max(1.0, abs(a.dopamine))


def test_fused_standalone_without_reward():
    """run_lattice keeps the stale dopamine (no decay) but still modulates."""
    a = _standalone(False, 40, with_reward=False)
    b = _standalone(True, 40, with_reward=False)
    _assert_lattice_match(a, b)
    assert abs(a.dopamine - 0.3) < 1e-6 and abs(b.dopamine - 0.3) < 1e-6


def _network(train, seed=2, n_side=8):
    rng = np.random.default_rng(seed)
    rlat = snn.RewardModulatedLattice(snn.Izhikevich(), id=0)
    rlat.populate(n_side, n_side, gap_conductance=10.0)
    rlat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                 and x != y)
    plain = snn.Lattice(snn.Izhikevich(), id=1)
    plain.populate(n_side, n_side, gap_conductance=10.0)
    plain.connect_stencil(radius=2.0, keep_prob=0.8, seed=4)
    plain.do_plasticity = True
    plain.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-65, 25, n_side * n_side), jnp.float32)})
    st = snn.SpikeTrainLattice(train, id=2)
    st.populate(n_side, n_side)
    if isinstance(train, snn.PoissonSpikeTrain):
        st.state = st.model.init_from_firing_rate(n_side * n_side,
                                                  hertz=40.0, dt=0.1)
    else:
        st.state = st.model.init_state(n_side * n_side, rate=1.0, dt=0.1)
    net = snn.RewardModulatedLatticeNetwork()
    net.add_lattice(rlat)
    net.add_lattice(plain)
    net.add_spike_train_lattice(st)
    net.connect(2, 1, lambda a, b: a == b, lambda a, b: 5.0)
    net.connect_with_reward_modulation(1, 0, lambda a, b: a == b,
                                       lambda a, b: 1.0)
    return net


def test_fused_network_matches_xla_deterministic():
    """The bench topology (reward + plastic + spike-train lattices, mixed
    plain/reward one-to-one connections) with a deterministic Rate train:
    the fused kernel must reproduce the XLA structured runner."""
    def run(use_pallas):
        net = _network(snn.RateSpikeTrain())
        net.use_pallas = use_pallas
        net.run_lattices_with_reward(0.5, 100)
        return net

    a, b = run(False), run(True)
    for lid in (0, 1):
        la = a.reward_modulated_lattices.get(lid) or a.lattices[lid]
        lb = b.reward_modulated_lattices.get(lid) or b.lattices[lid]
        _assert_lattice_match(la, lb)
    sta, stb = a.spike_train_lattices[2], b.spike_train_lattices[2]
    np.testing.assert_array_equal(
        np.asarray(stb.state["last_firing_time"]),
        np.asarray(sta.state["last_firing_time"]))
    np.testing.assert_allclose(np.asarray(stb.state["step"]),
                               np.asarray(sta.state["step"]), atol=1e-6)
    tr_a = a.reward_modulated_lattices[0].trace
    tr_b = b.reward_modulated_lattices[0].trace
    for k in ("c", "dw"):
        np.testing.assert_allclose(np.asarray(tr_b[k]), np.asarray(tr_a[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(tr_b["counter"]),
                                  np.asarray(tr_a["counter"]))
    for key in a.reward_connections:
        ca, cb = a.reward_connections[key], b.reward_connections[key]
        for i in (2, 3, 4):     # w, c, dw host mirrors
            np.testing.assert_allclose(np.asarray(cb[i]), np.asarray(ca[i]),
                                       rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(cb[5]), np.asarray(ca[5]))
    for key in a.connections:
        np.testing.assert_allclose(np.asarray(b.connections[key][2]),
                                   np.asarray(a.connections[key][2]),
                                   rtol=1e-5, atol=1e-5)
    assert abs(a.dopamine - b.dopamine) <= 1e-4 * max(1.0, abs(a.dopamine))


def test_fused_network_poisson_statistical():
    """Poisson trains use a different (pre-generated) uniform stream in the
    fused kernel; agreement is statistical — dopamine (spike-independent)
    is exact, firing fractions close."""
    def run(use_pallas):
        net = _network(snn.PoissonSpikeTrain(), seed=3)
        net.use_pallas = use_pallas
        net.run_lattices_with_reward(0.2, 400)
        lft = np.asarray(net.lattices[1].state["last_firing_time"])
        st_lft = np.asarray(
            net.spike_train_lattices[2].state["last_firing_time"])
        return (lft >= 0).mean(), (st_lft >= 0).mean(), float(net.dopamine)

    fa, sa, da = run(False)
    fb, sb, db = run(True)
    assert abs(fa - fb) <= 0.2
    assert abs(sa - sb) <= 0.2
    assert abs(da - db) <= 1e-4 * max(1.0, abs(da))


def test_fused_fallback_on_unsupported_config():
    """A chemical-synapse reward lattice is outside the fused class; with
    use_pallas=True it must silently fall back to the XLA path and still
    match use_pallas=False."""
    def run(use_pallas):
        lat = snn.RewardModulatedLattice(snn.Izhikevich())
        lat.populate(6, 6, gap_conductance=10.0)
        lat.connect(lambda x, y: x != y)   # dense support -> stencil decomp
        lat.electrical_synapse = True
        lat.chemical_synapse = True
        lat.state = lat.model.insert_neurotransmitter(
            lat.state, "AMPA", t_max=1.0)
        v0 = np.random.default_rng(5).uniform(-65, 30, 36)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
        lat.use_pallas = use_pallas
        lat.run_lattice_with_reward(0.4, 30)
        return lat

    a, b = run(False), run(True)
    np.testing.assert_array_equal(np.asarray(b.state["v"]),
                                  np.asarray(a.state["v"]))
    np.testing.assert_array_equal(np.asarray(b.graph.weights),
                                  np.asarray(a.graph.weights))


# ---------------------------------------------------------------------------
# IF-family models + plain LatticeNetwork fused path
# ---------------------------------------------------------------------------


def _plain_net(model_a, model_b, train, rows=8, cols=8, seed=6,
               plastic_b=True):
    rng = np.random.default_rng(seed)
    n = rows * cols
    a = snn.Lattice(model_a, id=0)
    a.populate(rows, cols, gap_conductance=10.0)
    a.connect_stencil(radius=2.0, keep_prob=0.8, seed=3)
    a.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-75, -50, n), jnp.float32)})
    b = snn.Lattice(model_b, id=1)
    b.populate(rows, cols, gap_conductance=10.0)
    b.connect_stencil(radius=1.5, keep_prob=0.9, seed=4)
    b.do_plasticity = plastic_b
    b.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-75, -50, n), jnp.float32)})
    st = snn.SpikeTrainLattice(train, id=2)
    st.populate(rows, cols)
    if isinstance(train, snn.PoissonSpikeTrain):
        st.state = st.model.init_from_firing_rate(n, hertz=80.0, dt=0.1)
    else:
        st.state = st.model.init_state(n, rate=1.0, dt=0.1)
    net = snn.LatticeNetwork.generate_network([a, b], [st])
    net.connect(2, 0, lambda x, y: x == y, lambda x, y: 30.0)
    net.connect(0, 1, lambda x, y: x == y, lambda x, y: 8.0)
    return net


def _net_match(a, b, lids=(0, 1), check_w=True, check_refr=False):
    for lid in lids:
        la, lb = a.get_lattice(lid), b.get_lattice(lid)
        np.testing.assert_allclose(np.asarray(lb.state["v"]),
                                   np.asarray(la.state["v"]),
                                   rtol=1e-5, atol=1e-4, err_msg=f"v{lid}")
        np.testing.assert_array_equal(
            np.asarray(lb.state["last_firing_time"]),
            np.asarray(la.state["last_firing_time"]), err_msg=f"lft{lid}")
        if check_w and "w" in la.state:
            np.testing.assert_allclose(np.asarray(lb.state["w"]),
                                       np.asarray(la.state["w"]),
                                       rtol=1e-5, atol=1e-4,
                                       err_msg=f"w{lid}")
        if check_refr and "refractory_count" in la.state:
            np.testing.assert_array_equal(
                np.asarray(lb.state["refractory_count"]),
                np.asarray(la.state["refractory_count"]),
                err_msg=f"refr{lid}")
        np.testing.assert_allclose(np.asarray(lb.graph.weights),
                                   np.asarray(la.graph.weights),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"gw{lid}")
    for key in a.connections:
        np.testing.assert_allclose(np.asarray(b.connections[key][2]),
                                   np.asarray(a.connections[key][2]),
                                   rtol=1e-5, atol=1e-5, err_msg=str(key))


def test_fused_plain_network_alif_rate():
    """Plain LatticeNetwork of ALIF lattices + Rate train through the
    fused kernel (deterministic) must match the XLA structured runner,
    including refractory counters and STDP on the plastic lattice and
    the one-to-one connections."""
    def run(use_pallas):
        net = _plain_net(snn.AdaptiveLeakyIntegrateAndFire(),
                         snn.AdaptiveLeakyIntegrateAndFire(),
                         snn.RateSpikeTrain())
        net.use_pallas = use_pallas
        net.run_lattices(137)     # chunks + remainder
        return net

    a, b = run(False), run(True)
    assert b._last_run_fused and not a._last_run_fused
    _net_match(a, b, check_refr=True)
    lft = np.asarray(a.get_lattice(0).state["last_firing_time"])
    assert (lft >= 0).any()       # the drive actually makes neurons fire


def test_fused_plain_network_lif():
    """LIF network (no adaptation current; refractory reset handler)
    through the per-model dispatch of the fused kernel."""
    def run(use_pallas):
        net = _plain_net(snn.LeakyIntegrateAndFire(),
                         snn.LeakyIntegrateAndFire(),
                         snn.RateSpikeTrain(), plastic_b=True)
        net.use_pallas = use_pallas
        net.run_lattices(100)
        return net

    a, b = run(False), run(True)
    assert b._last_run_fused
    _net_match(a, b, check_refr=True)


def test_fused_plain_network_poisson_statistical():
    """Poisson-driven plain network: different (equally valid) uniform
    stream, statistical agreement (see module docstring)."""
    def run(use_pallas):
        net = _plain_net(snn.AdaptiveLeakyIntegrateAndFire(),
                         snn.AdaptiveLeakyIntegrateAndFire(),
                         snn.PoissonSpikeTrain())
        net.use_pallas = use_pallas
        net.run_lattices(400)
        lft = np.asarray(net.get_lattice(0).state["last_firing_time"])
        st_lft = np.asarray(
            net.spike_train_lattices[2].state["last_firing_time"])
        return (lft >= 0).mean(), (st_lft >= 0).mean()

    fa, sa = run(False)
    fb, sb = run(True)
    assert abs(fa - fb) <= 0.25
    assert abs(sa - sb) <= 0.2


def test_fused_reward_network_alif():
    """All-ALIF reward network: the per-model dispatch must compose with
    the reward machinery (R-STDP traces, dopamine, reward connections)."""
    def run(use_pallas):
        rng = np.random.default_rng(2)
        n_side = 8
        rlat = snn.RewardModulatedLattice(
            snn.AdaptiveLeakyIntegrateAndFire(), id=0)
        rlat.populate(n_side, n_side, gap_conductance=10.0)
        rlat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                     and x != y)
        rlat.apply(lambda s: {**s, "v": jnp.asarray(
            rng.uniform(-75, -50, n_side * n_side), jnp.float32)})
        plain = snn.Lattice(snn.AdaptiveLeakyIntegrateAndFire(), id=1)
        plain.populate(n_side, n_side, gap_conductance=10.0)
        plain.connect_stencil(radius=2.0, keep_prob=0.8, seed=4)
        plain.do_plasticity = True
        plain.apply(lambda s: {**s, "v": jnp.asarray(
            rng.uniform(-75, -50, n_side * n_side), jnp.float32)})
        st = snn.SpikeTrainLattice(snn.RateSpikeTrain(), id=2)
        st.populate(n_side, n_side)
        st.state = st.model.init_state(n_side * n_side, rate=1.0, dt=0.1)
        net = snn.RewardModulatedLatticeNetwork()
        net.add_lattice(rlat)
        net.add_lattice(plain)
        net.add_spike_train_lattice(st)
        net.connect(2, 1, lambda a, b: a == b, lambda a, b: 30.0)
        net.connect_with_reward_modulation(1, 0, lambda a, b: a == b,
                                           lambda a, b: 1.0)
        net.use_pallas = use_pallas
        net.run_lattices_with_reward(0.5, 90)
        return net

    a, b = run(False), run(True)
    assert b._last_run_fused
    for lid in (0, 1):
        la = a.reward_modulated_lattices.get(lid) or a.lattices[lid]
        lb = b.reward_modulated_lattices.get(lid) or b.lattices[lid]
        np.testing.assert_allclose(np.asarray(lb.state["v"]),
                                   np.asarray(la.state["v"]),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(lb.state["last_firing_time"]),
            np.asarray(la.state["last_firing_time"]))
        np.testing.assert_allclose(np.asarray(lb.graph.weights),
                                   np.asarray(la.graph.weights),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(b.lattices[1].state["refractory_count"]),
        np.asarray(a.lattices[1].state["refractory_count"]))
    assert abs(a.dopamine - b.dopamine) <= 1e-4 * max(1.0, abs(a.dopamine))


def test_fused_standalone_alif_rstdp():
    """Standalone ALIF R-STDP lattice through the fused path (model
    dispatch + refractory counter + eligibility traces)."""
    def run(use_pallas):
        lat = snn.RewardModulatedLattice(snn.AdaptiveLeakyIntegrateAndFire())
        lat.populate(8, 8, gap_conductance=10.0)
        lat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                    and x != y)
        v0 = np.random.default_rng(1).uniform(-75, -52, 64)
        lft0 = np.full(64, -1, np.int32)
        lft0[::3] = 2
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32),
                             "last_firing_time": jnp.asarray(lft0)})
        lat.use_pallas = use_pallas
        lat.run_lattice_with_reward(0.5, 77)
        return lat

    a, b = run(False), run(True)
    assert b._last_run_fused
    _assert_lattice_match(a, b)
    np.testing.assert_array_equal(
        np.asarray(b.state["refractory_count"]),
        np.asarray(a.state["refractory_count"]))
    for k in ("c", "dw"):
        np.testing.assert_allclose(np.asarray(b.trace[k]),
                                   np.asarray(a.trace[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


# ---------------------------------------------------------------------------
# Mixed shapes, resample connections, grid-history emission
# ---------------------------------------------------------------------------


def _mixed_net(train, rows=8, cols=8, hist=None, w_pool=0.5, w_up=-0.8):
    """The EEG+STDP bench topology at test scale: a plastic excitatory
    grid, a half-size inhibitory grid wired through pooling/upsampling
    resample connections, and a spike-train source."""
    rng = np.random.default_rng(11)
    exc = snn.Lattice(snn.Izhikevich(), id=0)
    exc.populate(rows, cols, gap_conductance=10.0)
    exc.connect_stencil(radius=2.0, keep_prob=0.8, seed=5)
    exc.do_plasticity = True
    exc.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-75, -50, rows * cols), jnp.float32)})
    if hist is not None:
        exc.grid_history = hist
        exc.update_grid_history = True
    inh = snn.Lattice(snn.Izhikevich(), id=1)
    inh.populate(rows // 2, cols // 2, gap_conductance=10.0)
    inh.connect_stencil(radius=1.5, seed=6)
    inh.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-75, -50, rows * cols // 4), jnp.float32)})
    st = snn.SpikeTrainLattice(train, id=2)
    st.populate(rows, cols)
    if isinstance(train, snn.PoissonSpikeTrain):
        st.state = st.model.init_from_firing_rate(rows * cols, hertz=80.0,
                                                  dt=0.1)
    else:
        st.state = st.model.init_state(rows * cols, rate=1.0, dt=0.1)
    net = snn.LatticeNetwork.generate_network([exc, inh], [st])
    net.connect(2, 0, lambda x, y: x == y, lambda x, y: 25.0)
    net.connect_vectorized(0, 1, lambda pr, pc, qr, qc: np.where(
        (pr // 2 == qr) & (pc // 2 == qc), w_pool, np.nan))
    net.connect_vectorized(1, 0, lambda pr, pc, qr, qc: np.where(
        (pr == qr // 2) & (pc == qc // 2), w_up, np.nan))
    return net


def test_fused_mixed_shape_resample_network():
    """Mixed 8x8/4x4 network with pooling + upsampling resample
    connections (both plastic: the exc endpoint gates STDP visits on
    them) through the fused kernel must match the XLA structured runner,
    including the per-tap resample connection weights."""
    def run(use_pallas):
        net = _mixed_net(snn.RateSpikeTrain())
        net.use_pallas = use_pallas
        net.run_lattices(137)     # chunks + remainder
        return net

    a, b = run(False), run(True)
    assert b._last_run_fused and not a._last_run_fused
    _net_match(a, b)
    lft = np.asarray(a.get_lattice(0).state["last_firing_time"])
    assert (lft >= 0).any()


@pytest.mark.parametrize("kind", ["grid", "average", "eeg", "spikes"])
def test_fused_network_grid_histories(kind):
    """Lattice grid histories (all four kinds) ride the fused kernel as
    emitted pre-reset voltage planes; readouts must match the XLA
    runner's per-step readouts."""
    from spiking_neural_networks_tpu.core.history import HISTORY_KINDS

    def run(use_pallas):
        net = _mixed_net(snn.RateSpikeTrain(), hist=HISTORY_KINDS[kind]())
        net.use_pallas = use_pallas
        net.run_lattices(53)
        return net

    a, b = run(False), run(True)
    assert b._last_run_fused
    _net_match(a, b)
    ha = a.get_lattice(0).grid_history.history
    hb = b.get_lattice(0).grid_history.history
    assert len(ha) == len(hb) == 53
    if kind == "spikes":
        np.testing.assert_array_equal(np.stack(hb), np.stack(ha))
    else:
        # the fused kernel matches the XLA runner to ~1-2 ulp (same
        # tolerance class as _net_match), not bitwise
        np.testing.assert_allclose(np.asarray(hb), np.asarray(ha),
                                   rtol=1e-5, atol=1e-3)


def test_fused_mixed_net_poisson_statistical():
    """Poisson-driven mixed-shape network engages the fused path and
    agrees statistically (different uniform stream by design)."""
    def run(use_pallas):
        net = _mixed_net(snn.PoissonSpikeTrain())
        net.use_pallas = use_pallas
        net.run_lattices(400)
        lft = np.asarray(net.get_lattice(0).state["last_firing_time"])
        return (lft >= 0).mean()

    fa, fb = run(False), run(True)
    assert abs(fa - fb) <= 0.25


def test_use_pallas_auto_default():
    """use_pallas defaults to None = auto: fused kernels on TPU, XLA on
    CPU (kernels would run in slow interpret mode there).  Explicit
    True/False overrides (VERDICT r03 item 2: fast by default)."""
    from spiking_neural_networks_tpu.core.lattice import resolve_pallas

    assert resolve_pallas(True) is True
    assert resolve_pallas(False) is False
    assert resolve_pallas(None) == (jax.default_backend() == "tpu")
    for obj in (snn.Lattice(snn.Izhikevich()),
                snn.RewardModulatedLattice(snn.Izhikevich()),
                snn.LatticeNetwork()):
        assert obj.use_pallas is None


def _stdp_lattice(use_pallas, iters, rows=12, cols=12, history=False):
    rng = np.random.default_rng(9)
    lat = snn.Lattice(snn.Izhikevich(), id=0)
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=5)
    lat.do_plasticity = True
    lat.update_grid_history = history
    lat.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-65, 25, rows * cols), jnp.float32)})
    lat.use_pallas = use_pallas
    lat.run_lattice(iters)
    return lat


def test_fused_plain_stdp_lattice_matches_xla():
    """Standalone plain Lattice + STDP (BASELINE 'STDP exc/inh lattice'
    config; VERDICT r04 task 6): routed through the reward kernel
    family's 'plastic' class — weights, spikes, histories agree.  260
    steps exercises chunking plus the remainder launch AND is long enough
    for this config to start firing (first spikes ~step 190)."""
    a = _stdp_lattice(False, 260, history=True)
    b = _stdp_lattice(True, 260, history=True)
    assert not a._last_run_fused
    assert isinstance(b._last_run_fused, tuple) \
        and b._last_run_fused[0] == "stdp"
    # must actually spike, or plasticity is never exercised
    assert (np.asarray(a.state["last_firing_time"]) >= 0).any()
    for k in ("v", "w"):
        np.testing.assert_allclose(np.asarray(b.state[k]),
                                   np.asarray(a.state[k]),
                                   rtol=1e-5, atol=1e-4, err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(b.state["last_firing_time"]),
        np.asarray(a.state["last_firing_time"]))
    np.testing.assert_allclose(np.asarray(b.graph.weights),
                               np.asarray(a.graph.weights),
                               rtol=1e-5, atol=1e-5)
    ha = np.stack([np.asarray(x) for x in a.grid_history.history])
    hb = np.stack([np.asarray(x) for x in b.grid_history.history])
    assert ha.shape == hb.shape == (260, 12, 12)
    np.testing.assert_allclose(hb, ha, rtol=1e-5, atol=1e-4)


def test_fused_plain_stdp_lattice_weights_actually_move():
    """Guard against a vacuous pass: the STDP run must CHANGE weights."""
    before = _stdp_lattice(True, 0)
    after = _stdp_lattice(True, 200)
    assert isinstance(after._last_run_fused, tuple)
    assert np.abs(np.asarray(after.graph.weights)
                  - np.asarray(before.graph.weights)).max() > 1e-3


def test_fused_standalone_max_lane_width():
    """cols == 128 (the full lane width, the 128x128 bench row's class)
    stays on the fused path and matches XLA.  Fewer rows keep interpret
    mode cheap; the lane-dim layout is what 128 columns exercises."""
    a = _standalone(False, 40, rows=4, cols=128)
    b = _standalone(True, 40, rows=4, cols=128)
    assert b._last_run_fused and not a._last_run_fused
    _assert_lattice_match(a, b)


@pytest.mark.parametrize("cols", [130, 192])
def test_fused_wide_cols_fall_back(cols):
    """Widths past the proven 128-lane layout (non-multiples like 130 and
    multiples like 192) must DECLINE the kernel and produce the XLA
    result unchanged."""
    a = _standalone(False, 25, rows=4, cols=cols)
    b = _standalone(True, 25, rows=4, cols=cols)
    assert not b._last_run_fused
    _assert_lattice_match(a, b)
