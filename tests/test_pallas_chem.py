"""Fused CHEMICAL network kernel (ops/pallas_reward.py, round-5) vs the
XLA structured runner.

The reference's flagship science workloads (the Bayesian / schizophrenia /
dopamine pipelines, `/root/reference/interface_gpu/lixirnet/src/lib.rs:22-79`)
run DopaGluGABA-Izhikevich *chemical* networks; its GPU runtime executes
them fully on-device (`gpu_lattices/mod.rs:2585+`).  These tests pin the
fused Mosaic kernel's chemical arm — per-type NT planes, receptor kinetics,
ligand currents, NT release, dopamine gain modulation — against the XLA
structured runner that is itself golden-tested against hand transcriptions.

On CPU the kernel runs in interpret mode: identical f32 ops, so
deterministic (rate-train) configs must agree to f32 round-off and
integer/boolean fields exactly.  Also covers the FLAT (1, N) dense-graph
layout (Hopfield-style `connect`) and the empty-connection keep mapping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.ops.receptors import (
    IonotropicReceptors, DopaGluGABAReceptors)
from spiking_neural_networks_tpu.ops.graph import DenseGraph


def _mk_model(family, rec_kinetics, nt_kinetics):
    recs = (DopaGluGABAReceptors(rec_kinetics) if family == "dopaglugaba"
            else IonotropicReceptors(rec_kinetics))
    return snn.Izhikevich(nt_kinetics=nt_kinetics,
                          rec_kinetics=rec_kinetics, receptors=recs)


def _chem_net(family="ionotropic", rec_kinetics="approximate",
              nt_kinetics="approximate", rows=8, cols=8, electrical=False,
              plastic=False, train=None, seed=11):
    """2 lattices + 1 rate train; lattice 0 excites lattice 1 chemically
    (one-to-one), the train drives lattice 0."""
    rng = np.random.default_rng(seed)
    n = rows * cols
    lats = []
    for lid in range(2):
        model = _mk_model(family, rec_kinetics, nt_kinetics)
        lat = snn.Lattice(model, id=lid)
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect_stencil(radius=1.5, keep_prob=0.8, seed=3 + lid)
        s = lat.state
        # raised excitatory reversal (60 > v_th) so the chemical drive can
        # actually elicit spikes — with the default e=0 the receptor
        # current pins v at the reversal below threshold and nothing in
        # the NT-release / STDP / lft machinery would be exercised
        if family == "dopaglugaba":
            s = model.insert_receptor(s, "Glutamate", g_ampa=25.0,
                                      e_ampa=60.0)
            s = model.insert_receptor(s, "GABA")
            s = model.insert_neurotransmitter(s, "Glutamate")
        else:
            s = model.insert_receptor(s, "AMPA", g=25.0, e=60.0)
            s = model.insert_receptor(s, "NMDA")
            s = model.insert_neurotransmitter(s, "AMPA")
            s = model.insert_neurotransmitter(s, "NMDA")
        s = dict(s)
        s["v"] = jnp.asarray(rng.uniform(-60, -40, n), jnp.float32)
        lat.state = s
        lat.do_plasticity = plastic and lid == 1
        lats.append(lat)
    st_model = train if train is not None else snn.RateSpikeTrain(
        nt_kinetics=nt_kinetics)
    st = snn.SpikeTrainLattice(st_model, id=2)
    st.populate(rows, cols)
    if isinstance(st_model, snn.PoissonSpikeTrain):
        st.state = st.model.init_from_firing_rate(n, hertz=120.0, dt=0.1)
    else:
        st.state = st.model.init_state(n, rate=1.0, dt=0.1)
    # spike-train NT types are positional; the DopaGluGABA axis has the
    # same cardinality, so the ionotropic slot-0 name aliases Glutamate
    # (the lixirnet surface maps indices 1:1, lixirnet.py:643)
    st.state = st.model.insert_neurotransmitter(st.state, "AMPA")
    net = snn.LatticeNetwork.generate_network(lats, [st])
    net.connect(2, 0, lambda x, y: x == y, lambda x, y: 3.0)
    net.connect(0, 1, lambda x, y: x == y, lambda x, y: 1.5)
    net.electrical_synapse = electrical
    net.chemical_synapse = True
    return net


CHEM_KEYS = ("nt$t", "rec$r", "rec$current")
DOPA_KEYS = CHEM_KEYS + ("rec$r2", "rec$inh_modifier", "rec$nmda_modifier")


def _match(a, b, keys=CHEM_KEYS, lids=(0, 1)):
    """Float fields to f32 round-off (the kernel factors sums differently
    from XLA's batched-plane reduction — same contract as the electrical
    fused tests); spike flags and firing times EXACT."""
    for lid in lids:
        la, lb = a.get_lattice(lid), b.get_lattice(lid)
        for k in ("v", "w") + keys:
            x, y = np.asarray(la.state[k]), np.asarray(lb.state[k])
            np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-4,
                                       err_msg=f"{k}[{lid}]")
        np.testing.assert_array_equal(
            np.asarray(lb.state["last_firing_time"]),
            np.asarray(la.state["last_firing_time"]), err_msg=f"lft{lid}")
        np.testing.assert_array_equal(
            np.asarray(lb.state["is_spiking"]),
            np.asarray(la.state["is_spiking"]), err_msg=f"spk{lid}")


@pytest.mark.parametrize("rec_kin,nt_kin", [
    ("approximate", "approximate"),
    ("bounded", "bounded"),                 # the lixirnet GPU kinetics
    ("destexhe", "destexhe"),
    ("exponential_decay", "exponential_decay"),
])
def test_chemical_network_fused_bit_exact(rec_kin, nt_kin):
    """Ionotropic chemical network, all four kinetics families: the fused
    kernel must agree with the XLA structured runner bit-for-bit on a
    deterministic rate-driven config (121 steps = chunked + remainder)."""
    def run(use_pallas):
        net = _chem_net(rec_kinetics=rec_kin, nt_kinetics=nt_kin)
        net.use_pallas = use_pallas
        net.run_lattices(121)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    # the config must actually engage the chemistry, or this test would
    # pass vacuously: receptor gating active everywhere; spikes + lattice
    # NT release for the fast kinetics (destexhe/exp-decay receptors ramp
    # too slowly to fire in 121 steps at this drive)
    assert np.asarray(a.get_lattice(0).state["rec$r"]).max() > 0.0
    if rec_kin in ("approximate", "bounded"):
        assert (np.asarray(a.get_lattice(0).state["last_firing_time"])
                >= 0).any()
        assert np.asarray(a.get_lattice(0).state["nt$t"]).max() > 0.0
    _match(a, b)
    # the spike-train NT carry must round-trip too (rate trains are
    # deterministic: identical release sequence)
    np.testing.assert_allclose(
        np.asarray(b.spike_train_lattices[2].state["nt$t"]),
        np.asarray(a.spike_train_lattices[2].state["nt$t"]),
        rtol=1e-6, atol=1e-6)


def test_dopaglugaba_network_fused_bit_exact():
    """DopaGluGABA (flagship lixirnet receptor set): glu currents, NMDA
    3.57 Mg block, dopamine D1/D2 modifier rewrites — bit-exact, with a
    dopamine-releasing third lattice driving lattice 1's modifiers."""
    def run(use_pallas):
        net = _chem_net(family="dopaglugaba", rec_kinetics="bounded",
                        nt_kinetics="bounded")
        # add a dopamine source lattice targeting lattice 1
        model = _mk_model("dopaglugaba", "bounded", "bounded")
        dopa = snn.Lattice(model, id=3)
        dopa.populate(8, 8, gap_conductance=10.0)
        dopa.connect_stencil(radius=1.0, keep_prob=1.0, seed=9)
        s = model.insert_neurotransmitter(dopa.state, "Dopamine")
        s = dict(s)
        s["v"] = jnp.asarray(np.random.default_rng(7).uniform(
            -60, -30, 64), jnp.float32)
        dopa.state = s
        net.add_lattice(dopa)
        # receptor side: lattice 1 carries D2 receptors with gain 0.05
        l1 = net.get_lattice(1)
        l1.state = l1.model.insert_receptor(l1.state, "Dopamine",
                                            s_d2=0.05, s_d1=0.02)
        net.connect(3, 1, lambda x, y: x == y, lambda x, y: 1.0)
        net.use_pallas = use_pallas
        net.run_lattices(90)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    _match(a, b, keys=DOPA_KEYS, lids=(0, 1, 3))


def test_chemical_plus_electrical_fused_bit_exact():
    """Both synapse kinds at once: gap-junction phase A rides alongside the
    NT gather (reference networks can enable both flags)."""
    def run(use_pallas):
        net = _chem_net(electrical=True)
        net.use_pallas = use_pallas
        net.run_lattices(75)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    _match(a, b)


def test_chemical_stdp_fused_bit_exact():
    """Chemical network with STDP on the postsynaptic lattice: plastic
    stencil weights must evolve identically."""
    def run(use_pallas):
        net = _chem_net(plastic=True, rec_kinetics="bounded",
                        nt_kinetics="bounded")
        net.use_pallas = use_pallas
        net.run_lattices(121)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    _match(a, b)
    np.testing.assert_allclose(
        np.asarray(b.get_lattice(1).graph.weights),
        np.asarray(a.get_lattice(1).graph.weights), rtol=1e-5, atol=1e-5)


def test_chemical_poisson_statistical():
    """Poisson-driven chemical net: the fused kernel draws its own uniform
    stream, so require statistical (not bitwise) agreement."""
    def run(use_pallas):
        net = _chem_net(train=snn.PoissonSpikeTrain(
            nt_kinetics="approximate"), rows=10, cols=10)
        net.use_pallas = use_pallas
        net.run_lattices(400)
        lft = np.asarray(net.get_lattice(0).state["last_firing_time"])
        t = np.asarray(net.get_lattice(1).state["nt$t"])
        return (lft >= 0).mean(), t.mean()

    fa, ta = run(False)
    fb, tb = run(True)
    assert abs(fa - fb) < 0.25
    assert ta == pytest.approx(tb, rel=0.5, abs=1e-3)


def _dense_net(seed=5, n=60, chemical=False, plastic=False):
    """Hopfield-style irregular dense intra graphs -> FLAT (1, N) kernel
    layout with MXU matmul gathers."""
    rng = np.random.default_rng(seed)
    lats = []
    for lid in range(2):
        model = _mk_model("ionotropic", "bounded", "bounded")
        lat = snn.Lattice(model, id=lid)
        lat.populate(1, n, gap_conductance=10.0)
        mask = rng.random((n, n)) < 0.3
        np.fill_diagonal(mask, False)
        w = rng.uniform(0.2, 1.0, (n, n)).astype(np.float32)
        lat.graph = DenseGraph(jnp.asarray(np.where(mask, w, 0.0)),
                               jnp.asarray(mask))
        s = dict(lat.state)
        s["v"] = jnp.asarray(rng.uniform(-70, -40, n), jnp.float32)
        if chemical:
            s2 = lat.model.insert_receptor(s, "AMPA")
            s2 = lat.model.insert_neurotransmitter(s2, "AMPA")
            s = s2
        lat.state = s
        lat.do_plasticity = plastic
        lats.append(lat)
    st = snn.SpikeTrainLattice(snn.RateSpikeTrain(nt_kinetics="bounded"),
                               id=2)
    st.populate(1, n)
    st.state = st.model.init_state(n, rate=1.0, dt=0.1)
    if chemical:
        st.state = st.model.insert_neurotransmitter(st.state, "AMPA")
    net = snn.LatticeNetwork.generate_network(lats, [st])
    net.connect(2, 0, lambda x, y: x == y, lambda x, y: 8.0)
    # an irregular (dense-block) inter-lattice connection
    conn_mask = rng.random((n, n)) < 0.1
    net.connect(0, 1, lambda x, y: bool(conn_mask[x[1], y[1]]),
                lambda x, y: 0.9)
    net.chemical_synapse = chemical
    net.electrical_synapse = not chemical
    return net


def test_dense_flat_network_fused_bit_exact():
    """FLAT mode: dense intra graphs + a dense inter-lattice block run as
    (1, N) HIGHEST-precision matmuls in-kernel; bit-exact vs XLA."""
    def run(use_pallas):
        net = _dense_net()
        net.use_pallas = use_pallas
        net.run_lattices(121)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    for lid in (0, 1):
        la, lb = a.get_lattice(lid), b.get_lattice(lid)
        for k in ("v", "w"):
            np.testing.assert_allclose(np.asarray(lb.state[k]),
                                       np.asarray(la.state[k]),
                                       rtol=1e-5, atol=1e-4,
                                       err_msg=f"{k}[{lid}]")
        np.testing.assert_array_equal(
            np.asarray(lb.state["last_firing_time"]),
            np.asarray(la.state["last_firing_time"]))


def test_dense_flat_chemical_fused_bit_exact():
    """FLAT mode + chemical synapses: the per-type NT gather as matmuls."""
    def run(use_pallas):
        net = _dense_net(chemical=True)
        net.use_pallas = use_pallas
        net.run_lattices(90)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    _match(a, b)


def test_dense_flat_plastic_falls_back():
    """Dense-edge STDP has no Mosaic transpose: must fall back to XLA."""
    net = _dense_net(plastic=True)
    net.use_pallas = True
    net.run_lattices(20)
    assert not net._last_run_fused


def test_empty_connection_keep_mapping():
    """A connection whose predicate selects no edges classifies as an
    EmptyBlock and is dropped from the kernel spec; its conn_ws slot must
    pass through the fused runner unchanged (donation re-adoption)."""
    def run(use_pallas):
        net = _chem_net()
        # no (x, y) pair satisfies this: empty op between 1 -> 0
        net.connect(1, 0, lambda x, y: x[0] > 10**6, lambda x, y: 1.0)
        net.use_pallas = use_pallas
        net.run_lattices(60)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    _match(a, b)


def test_chemical_grid_history_emission():
    """Chemical net + grid history: per-step planes emitted in-kernel must
    match the XLA runner's recorded history exactly."""
    def run(use_pallas):
        net = _chem_net()
        lat = net.get_lattice(0)
        lat.update_grid_history = True
        net.use_pallas = use_pallas
        net.run_lattices(40)
        return net

    a, b = run(False), run(True)
    assert not a._last_run_fused and b._last_run_fused
    ha = np.stack([np.asarray(x) for x in
                   a.get_lattice(0).grid_history.history])
    hb = np.stack([np.asarray(x) for x in
                   b.get_lattice(0).grid_history.history])
    assert ha.shape == hb.shape
    np.testing.assert_allclose(hb, ha, rtol=1e-5, atol=1e-4)
    _match(a, b)


def _bayesian_net(seed=5):
    """The flagship Bayesian-pipeline configuration via the lixirnet
    surface (experiments/bayesian_inference_pipeline.py ==
    /root/reference/interface_gpu/experiments/bayesian_inference_pipeline.py):
    DopaIzhikevich (models/dopa.py) lattices — 7x7 exc with Hopfield-dense
    intra weights + grid history, 3x3 inh — chemically coupled, plus two
    Poisson cue lattices (glutamate + dopamine NTs).  The cue rates are 0
    so both arms are deterministic; the chemical cascade is seeded by
    starting a third of the exc neurons above threshold."""
    import spiking_neural_networks_tpu.lixirnet as ln

    rng = np.random.default_rng(seed)
    exc_n, inh_n = 7, 3
    num = exc_n * exc_n
    w = rng.normal(0.0, 1.0, (num, num))
    w[np.abs(w) < 0.8] = 0.0
    np.fill_diagonal(w, 0.0)

    kin = dict(clearance_constant=0.001)
    exc_nts = {ln.DopaGluGABANeurotransmitterType.Glutamate:
               ln.BoundedNeurotransmitterKinetics(**kin)}
    inh_nts = {ln.DopaGluGABANeurotransmitterType.GABA:
               ln.BoundedNeurotransmitterKinetics(**kin)}
    dopa_nts = {ln.DopaGluGABANeurotransmitterType.Dopamine:
                ln.BoundedNeurotransmitterKinetics(**kin)}
    receptors = ln.DopaGluGABA()
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Glutamate,
                     ln.GlutamateReceptor(
                         ampa_r=ln.BoundedReceptorKinetics(r_max=10),
                         nmda_r=ln.BoundedReceptorKinetics(r_max=10)))
    receptors.insert(ln.DopaGluGABANeurotransmitterType.GABA,
                     ln.GABAReceptor())
    receptors.insert(ln.DopaGluGABANeurotransmitterType.Dopamine,
                     ln.DopamineReceptor(s_d1=0.0, s_d2=0.5))
    exc_neuron = ln.IzhikevichNeuron()
    exc_neuron.set_synaptic_neurotransmitters(exc_nts)
    exc_neuron.set_receptors(receptors)
    inh_neuron = ln.IzhikevichNeuron()
    inh_neuron.set_synaptic_neurotransmitters(inh_nts)
    inh_neuron.set_receptors(receptors)
    poisson = ln.PoissonNeuron()
    poisson.set_synaptic_neurotransmitters(exc_nts)
    poisson_dopa = ln.PoissonNeuron()
    poisson_dopa.set_synaptic_neurotransmitters(dopa_nts)

    v0 = rng.uniform(-65.0, -45.0, num)
    v0[rng.permutation(num)[:num // 3]] = 40.0   # above v_th: spike at t=0

    def setup(pos, neuron):
        neuron.current_voltage = float(v0[pos[0] * exc_n + pos[1]])
        neuron.c_m = 25.0
        return neuron

    inh = ln.IzhikevichNeuronLattice(0)
    inh.populate(inh_neuron, inh_n, inh_n)
    exc = ln.IzhikevichNeuronLattice(1)
    exc.populate(exc_neuron, exc_n, exc_n)
    exc.apply_given_position(setup)
    p2i = exc.position_to_index
    exc.connect(lambda x, y: bool(w[p2i[x]][p2i[y]] != 0),
                lambda x, y: float(w[p2i[x]][p2i[y]]))
    exc.update_grid_history = True
    cue_main = ln.PoissonLattice(2)
    cue_main.populate(poisson, exc_n, exc_n)
    cue_bayes = ln.PoissonLattice(3)
    cue_bayes.populate(poisson_dopa, exc_n, exc_n)

    net = ln.IzhikevichNeuronNetwork()
    net.add_lattice(inh)
    net.add_lattice(exc)
    net.add_spike_train_lattice(cue_main)
    net.add_spike_train_lattice(cue_bayes)
    net.connect(0, 1, lambda x, y: True, lambda x, y: 0.5)
    net.connect(1, 0, lambda x, y: (x[0] + y[1]) % 2 == 0,
                lambda x, y: 1.0)
    net.connect(2, 1, lambda x, y: x == y, lambda x, y: 5.0)
    net.connect(3, 1, lambda x, y: x == y, lambda x, y: 2.0)
    net.set_dt(1.0)
    net.electrical_synapse = False
    net.chemical_synapse = True
    return net


def test_lixirnet_bayesian_network_fused_bit_exact():
    """The flagship DopaGluGABA-Izhikevich Bayesian network must ENGAGE the
    fused chemical kernel through the lixirnet surface (DopaIzhikevich
    rides the izhikevich kernel class) and agree with the XLA runner."""
    def run(use_pallas):
        net = _bayesian_net()
        net._inner.use_pallas = use_pallas
        net.run_lattices(121)
        return net

    a, b = run(False), run(True)
    assert not a._inner._last_run_fused and b._inner._last_run_fused
    # real chemistry: the seeded spikes must cascade (NT release, receptor
    # gating, downstream firing in the inh pool via the dense inter block)
    assert (np.asarray(
        a._inner.lattices[1].state["last_firing_time"]) >= 0).any()
    assert np.asarray(a._inner.lattices[1].state["nt$t"]).max() > 0.0
    assert np.asarray(a._inner.lattices[0].state["rec$r"]).max() > 0.0
    _match(a._inner, b._inner, keys=DOPA_KEYS)
    ha = np.stack(a.get_lattice(1).history)
    hb = np.stack(b.get_lattice(1).history)
    assert ha.shape == hb.shape == (121, 7, 7)
    np.testing.assert_allclose(hb, ha, rtol=1e-5, atol=1e-4)
