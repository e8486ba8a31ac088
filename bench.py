"""Benchmark: neuron-updates/sec on the BASELINE.json north-star config.

Primary: 512x512 Izhikevich lattice, electrical gap junctions only, dt=0.1,
radius-2 / 80%-keep connectivity (the reference backend's lattice example,
examples/lattice/main.rs) — target >= 1e9 neuron-updates/sec on one v5e chip.

Secondary (reported in "extra"): Hodgkin-Huxley chemical lattice with
receptor kinetics + STDP plasticity, steps/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)



def timed_repeats(run, sync, iters, repeats=5):
    """Run `run` (post-warmup) `repeats` times in-process; return
    (best steps_or_updates/s, all values).  TPU run-to-run variance over
    the tunnel is +-25% BETWEEN sessions (CLAUDE.md); repeating in one
    process separates real regressions from session noise.  Successive
    repeats also RAMP upward within a session (first post-compile runs
    measured 30-50% below steady state), so `best` needs >=5 samples —
    run cost is ~0.1 s/row vs ~minutes of compile."""
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        sync()
        vals.append(iters / (time.perf_counter() - t0))
    return max(vals), vals


def median(vals):
    return sorted(vals)[len(vals) // 2] if vals else 0.0


def row_result(xla_vals, pl_vals, key="pallas_fused"):
    """Uniform per-row report (VERDICT r04 item 5): the row value is the
    winning arm's MEDIAN (not best — medians damp the within-session ramp),
    and the detail carries every raw run plus the variance-immune
    pallas/xla median ratio (both arms ride the same session, so the
    tunnel/session factor cancels in the ratio)."""
    xm, pm = median(xla_vals), median(pl_vals)
    detail = {"xla": xla_vals, key: pl_vals,
              "median": {"xla": xm, key: pm}}
    if xm and pm:
        detail["ratio"] = pm / xm
    return max(xm, pm), detail


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_izhikevich(rows=512, cols=512, iters=2048):
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        lat = snn.Lattice(snn.Izhikevich())
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=7)
        # 4x-unrolled step loop amortizes the per-iteration multi-kernel
        # overhead floor (measured 53.7 -> 48.0 us/step in-process on v5e)
        lat.scan_unroll = 4
        lat.use_pallas = pallas
        v0 = np.random.default_rng(1).uniform(-65.0, 30.0, rows * cols)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
        return lat

    def measure(lat, label):
        log(f"compiling izhikevich lattice ({label}) ...")
        t0 = time.perf_counter()
        lat.run_lattice(iters)
        jax.block_until_ready(lat.state["v"])
        log(f"warmup (compile+run) {time.perf_counter() - t0:.1f}s")
        # headline row: 7 repeats, report the MEDIAN alongside best and
        # keep every raw run in the detail — the tunnel's +-25-40% session
        # variance showed up in r03 as unexplained headline swings;
        # median-of-7 plus the xla<->pallas ratio (below, both arms ride
        # the same session) separates session noise from real regressions
        # (VERDICT r03 item 5)
        best, vals = timed_repeats(
            lambda: lat.run_lattice(iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters, repeats=7)
        med = sorted(vals)[len(vals) // 2]
        log(f"izhikevich {rows}x{cols} [{label}]: best {rows*cols*best:.3e} "
            f"median {rows*cols*med:.3e} neuron-updates/s over {len(vals)} "
            f"runs (spread {min(vals) / max(vals):.2f})")
        return rows * cols * med, [rows * cols * v for v in vals]

    xla_ups, xla_vals = measure(build(False), "xla")
    try:
        # fused multi-step Pallas kernel: whole lattice VMEM-resident for
        # K=16 steps per launch (2.4x the XLA stencil path on v5e)
        pl_ups, pl_vals = measure(build(True), "pallas-multistep")
    except Exception as e:
        log("pallas path unavailable:", repr(e)[:200])
        pl_vals = []
    val, detail = row_result(xla_vals, pl_vals, "pallas_multistep")
    if detail.get("ratio"):
        log(f"izhikevich pallas/xla median ratio: {detail['ratio']:.2f}")
    return val, detail


def bench_izhikevich_large(rows=2048, cols=2048, iters=1024):
    """4.2M-neuron electrical lattice: weight planes (~200 MB) exceed VMEM,
    so use_pallas engages the temporal-blocked row-tile kernel
    (ops/pallas_stencil.fused_izhikevich_multistep_tiled)."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        lat = snn.Lattice(snn.Izhikevich())
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=4)
        v0 = np.random.default_rng(1).uniform(-65.0, 30.0, rows * cols)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
        lat.use_pallas = pallas
        return lat

    def measure(lat, label):
        lat.run_lattice(iters)
        best, vals = timed_repeats(
            lambda: lat.run_lattice(iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters, repeats=4)
        ups = rows * cols * best
        log(f"izhikevich {rows}x{cols} [{label}]: best {ups:.3e} "
            f"updates/s ({1e6 / best:.1f} us/step)")
        return ups, [rows * cols * v for v in vals]

    xla_ups, xla_vals = measure(build(False), "xla")
    try:
        pl_ups, pl_vals = measure(build(True), "pallas-tiled")
    except Exception as e:
        log("pallas tiled path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals, "pallas_tiled")


def bench_hh_stdp(rows=128, cols=128, iters=2000):
    """BASELINE config: HH with ion channels + receptor kinetics + STDP.
    Measures the XLA path and the fused multi-step chemical kernel
    (ops/pallas_hh.py); reports the best."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        lat = snn.Lattice(snn.HodgkinHuxley())
        lat.populate(rows, cols, gap_conductance=10.0)
        s = lat.state
        for t in ("AMPA", "NMDA", "GABA"):
            s = lat.model.insert_receptor(s, t)
            s = lat.model.insert_neurotransmitter(s, t)
        lat.state = s
        lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=11)
        lat.chemical_synapse = True
        lat.do_plasticity = True
        lat.plasticity = snn.STDP()
        lat.scan_unroll = 4  # 18.9k -> 21.7k steps/s in-process on v5e
        lat.use_pallas = pallas
        return lat

    def measure(lat, label):
        log(f"compiling HH+STDP lattice ({label}) ...")
        lat.run_lattice(iters)
        jax.block_until_ready(lat.state["v"])
        best, vals = timed_repeats(
            lambda: lat.run_lattice(iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters)
        log(f"HH+STDP {rows}x{cols} [{label}]: best {best:.1f} steps/s over "
            f"{len(vals)} runs (spread {min(vals) / max(vals):.2f})")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-multistep")
    except Exception as e:
        log("pallas HH path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals, "pallas_multistep")


def bench_lif_poisson_network(rows=64, cols=64, iters=5000):
    """BASELINE config 2: adaptive LIF lattice driven by a Poisson lattice.
    Measures the XLA structured runner and the fused whole-network kernel
    (ops/pallas_reward.plain_network_runner); reports the best."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        lat = snn.Lattice(snn.AdaptiveLeakyIntegrateAndFire(), id=0)
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=3)
        st = snn.SpikeTrainLattice(snn.PoissonSpikeTrain(), id=1)
        st.populate(rows, cols)
        st.state = st.model.init_from_firing_rate(rows * cols, hertz=50.0,
                                                  dt=0.1)
        net = snn.LatticeNetwork.generate_network([lat], [st])
        net.connect(1, 0, lambda x, y: x == y, lambda x, y: 5.0)
        net.use_pallas = pallas
        return net

    def measure(net, label):
        net.run_lattices(iters)
        jax.block_until_ready(net.get_lattice(0).state["v"])
        best, vals = timed_repeats(
            lambda: net.run_lattices(iters),
            lambda: jax.block_until_ready(net.get_lattice(0).state["v"]),
            iters)
        log(f"ALIF+Poisson network {rows}x{cols} [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f})")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-fused")
    except Exception as e:
        log("pallas plain-network path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_network_eeg_stdp(rows=64, cols=64, iters=15000):
    """BASELINE config 5: multi-lattice network, EEG readout, Poisson-encoded
    STDP classifier-style wiring.  Mixed lattice shapes (64x64 exc, 32x32
    inh) through pool/upsample resample connections: measures the XLA
    structured runner and the fused mixed-shape network kernel
    (ops/pallas_reward.py, which emits the EEG planes in-kernel);
    reports the best.  15000 iters: the fused kernel's marginal step time
    is ~3.3 us (measured r05: 2000/5000/15000-iter runs fit fixed ~120 ms
    + 3.3 us/step), so shorter runs measure the tunnel's fixed
    dispatch+pull cost, not the runtime; reference EEG pipelines run
    25000-step episodes (interface_gpu/experiments TOMLs)."""
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.core.history import EEGHistory

    def build(pallas):
        exc = snn.Lattice(snn.Izhikevich(), id=0)
        exc.populate(rows, cols, gap_conductance=10.0)
        exc.connect_stencil(radius=2.0, keep_prob=0.8, seed=5)
        exc.do_plasticity = True
        exc.grid_history = EEGHistory()
        exc.update_grid_history = True
        inh = snn.Lattice(snn.Izhikevich(), id=1)
        inh.populate(rows // 2, cols // 2, gap_conductance=10.0)
        inh.connect_stencil(radius=1.5, seed=6)
        st = snn.SpikeTrainLattice(snn.PoissonSpikeTrain(), id=2)
        st.populate(rows, cols)
        st.state = st.model.init_from_firing_rate(rows * cols, hertz=25.0,
                                                  dt=0.1)
        net = snn.LatticeNetwork.generate_network([exc, inh], [st])
        net.connect(2, 0, lambda x, y: x == y, lambda x, y: 4.0)
        net.connect_vectorized(0, 1, lambda pr, pc, qr, qc: np.where(
            (pr // 2 == qr) & (pc // 2 == qc), 0.5, np.nan))
        net.connect_vectorized(1, 0, lambda pr, pc, qr, qc: np.where(
            (pr == qr // 2) & (pc == qc // 2), -0.8, np.nan))
        net.history_chunk = iters
        net.scan_unroll = 4  # 13.2k -> 14.8k steps/s in-process on v5e
        net.use_pallas = pallas
        return net, exc

    def measure(pallas, label):
        net, exc = build(pallas)
        net.run_lattices(iters)
        best, vals = timed_repeats(
            lambda: net.run_lattices(iters),
            lambda: jax.block_until_ready(net.get_lattice(0).state["v"]),
            iters)
        log(f"EEG+STDP network [{label}]: best {best:.1f} steps/s "
            f"(spread {min(vals) / max(vals):.2f}); fused="
            f"{net._last_run_fused}; EEG samples "
            f"{len(exc.grid_history.history)}")
        return best, vals

    xla_best, xla_vals = measure(False, "xla")
    try:
        pl_best, pl_vals = measure(True, "pallas-fused")
    except Exception as e:
        log("pallas EEG-network path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_rstdp_lattice(rows=64, cols=64, iters=12800):
    # 12800 iters: amortize the fixed per-call dispatch+pull (see the
    # reward-network row) so the row measures the runtime's marginal
    """Reward-modulated STDP lattice: per-edge eligibility traces on a
    radius-2 graph (stencil-decomposed), two visits per edge per step.
    Measures the XLA path and the fused whole-step Pallas kernel
    (ops/pallas_reward.py); reports the best."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        lat = snn.RewardModulatedLattice(snn.Izhikevich())
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                    and x != y)
        lat.scan_unroll = 4  # 17.9k -> 25.5k steps/s in-process on v5e
        lat.use_pallas = pallas
        return lat

    def measure(lat, label):
        lat.run_lattice_with_reward(0.5, iters)
        best, vals = timed_repeats(
            lambda: lat.run_lattice_with_reward(0.5, iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters)
        log(f"R-STDP lattice {rows}x{cols} [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f})")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-fused")
    except Exception as e:
        log("pallas reward path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_reward_network(n_side=32, iters=3000):
    """RewardModulatedLatticeNetwork (reward lattice + plastic plain lattice
    + Poisson drive, mixed plain/reward connections) on the structured
    runner (core/reward_structured.py; 6.2x over the flat COO path).

    Each arm builds its own network with use_pallas set EXPLICITLY:
    leaving the xla arm on the auto default silently ran it fused on TPU
    since the round-4 auto-on change (the r04 'collapsed margin',
    VERDICT weak #4, was this bug — both arms were the kernel)."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        rng = np.random.default_rng(2)
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
        st = snn.SpikeTrainLattice(snn.PoissonSpikeTrain(), id=2)
        st.populate(n_side, n_side)
        st.state = st.model.init_from_firing_rate(n_side * n_side,
                                                  hertz=40.0, dt=0.1)
        net = snn.RewardModulatedLatticeNetwork()
        net.add_lattice(rlat)
        net.add_lattice(plain)
        net.add_spike_train_lattice(st)
        net.connect(2, 1, lambda a, b: a == b, lambda a, b: 5.0)
        net.connect_with_reward_modulation(1, 0, lambda a, b: a == b,
                                           lambda a, b: 1.0)
        net.use_pallas = pallas
        return net

    def measure(net, label):
        net.run_lattices_with_reward(0.5, iters)
        best, vals = timed_repeats(
            lambda: net.run_lattices_with_reward(0.5, iters),
            lambda: jax.block_until_ready(
                net.get_reward_modulated_lattice(0).state["v"]), iters)
        log(f"reward network {n_side}x{n_side} [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f}); "
            f"fused={bool(net._last_run_fused)}")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-fused")
    except Exception as e:
        log("pallas reward-network path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_closed_loop(iters=6400):
    """Fused on-device RL loop (interactable.JitEnvironment): reward ->
    R-STDP agent update -> env state -> cue encoding, one lax.scan.
    use_pallas additionally fuses the WHOLE loop — env callbacks traced
    into K=16-step kernel launches (the callbacks are shape-polymorphic,
    so the flat/(R, C) equivalence gate engages it); reports the best of
    both.  iters amortizes the ~130 ms fixed dispatch+pull cost of one
    episode call over the tunnel (CLAUDE.md)."""
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.interactable import JitEnvironment

    def encoder(e, s):
        # clamp the first 6 neurons high (row-major), written shape-
        # polymorphically so it traces on flat (N,) state (XLA scan) and
        # on (R, C) planes (in-kernel env) identically
        v = s["v"]
        if v.ndim == 1:
            fi = jax.lax.iota(jnp.int32, v.shape[0])
        else:
            r = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            c = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            fi = r * v.shape[1] + c
        return {**s, "v": jnp.where(fi < 6, jnp.float32(31.0), v)}

    def build(pallas):
        lat = snn.RewardModulatedLattice(snn.Izhikevich())
        lat.populate(10, 10, gap_conductance=10.0)
        lat.connect_stencil(radius=2.0, keep_prob=1.0, seed=5)
        v0 = np.random.default_rng(0).uniform(-65, 30,
                                              100).astype(np.float32)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0)})
        lat.use_pallas = pallas
        env = JitEnvironment(
            lat, {"rate": jnp.float32(0.0)},
            encoder,
            lambda e, s: jnp.clip(0.08 - e["rate"], -0.05, 0.05),
            lambda e, s: {"rate": 0.9 * e["rate"]
                          + 0.1 * s["is_spiking"].astype(jnp.float32).mean()})
        return lat, env

    def measure(pallas, label):
        lat, env = build(pallas)
        env.run_with_reward(iters)
        best, vals = timed_repeats(
            lambda: env.run_with_reward(iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters)
        log(f"closed-loop RL (JitEnvironment) [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f}) "
            f"env_fused={env.last_build_env_fused}")
        return best, vals

    xla_best, xla_vals = measure(False, "xla")
    try:
        pl_best, pl_vals = measure(True, "pallas-env-fused")
    except Exception as e:
        log("pallas closed-loop path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)



def bench_chemical_network(rows=64, cols=64, iters=12800):
    # 12800 iters: amortizes the fixed ~120 ms dispatch+pull per call so
    # the row measures the runtime (science trials run 2500 steps but
    # batch many trials; the per-trial wall is its own bench row)
    """CHEMICAL (DopaGluGABA-class) network — the reference's flagship
    science workload (Bayesian/schizophrenia/dopamine pipelines,
    interface_gpu/lixirnet/src/lib.rs:22-79; GPU chemical runtime
    gpu_lattices/mod.rs:2585+): two Izhikevich lattices with DopaGluGABA
    receptors and bounded kinetics, glutamate release 0 -> 1, a Poisson
    glutamate drive.  Measures the XLA structured runner vs the fused
    chemical network kernel (ops/pallas_reward.py round-5)."""
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.ops.receptors import DopaGluGABAReceptors

    def mk_model():
        return snn.Izhikevich(nt_kinetics="bounded", rec_kinetics="bounded",
                              receptors=DopaGluGABAReceptors("bounded"))

    def build(pallas):
        rng = np.random.default_rng(7)
        n = rows * cols
        lats = []
        for lid in range(2):
            model = mk_model()
            lat = snn.Lattice(model, id=lid)
            lat.populate(rows, cols, gap_conductance=10.0)
            lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=3 + lid)
            s = model.insert_receptor(lat.state, "Glutamate")
            s = model.insert_receptor(s, "GABA")
            s = model.insert_neurotransmitter(s, "Glutamate")
            s = dict(s)
            s["v"] = jnp.asarray(rng.uniform(-70, -40, n), jnp.float32)
            lat.state = s
            lats.append(lat)
        st = snn.SpikeTrainLattice(
            snn.PoissonSpikeTrain(nt_kinetics="bounded"), id=2)
        st.populate(rows, cols)
        st.state = st.model.init_from_firing_rate(n, hertz=50.0, dt=0.1)
        st.state = st.model.insert_neurotransmitter(st.state, "AMPA")
        net = snn.LatticeNetwork.generate_network(lats, [st])
        net.connect(2, 0, lambda x, y: x == y, lambda x, y: 3.0)
        net.connect(0, 1, lambda x, y: x == y, lambda x, y: 1.5)
        net.electrical_synapse = False
        net.chemical_synapse = True
        net.use_pallas = pallas
        return net

    def measure(net, label):
        net.run_lattices(iters)
        jax.block_until_ready(net.get_lattice(0).state["v"])
        best, vals = timed_repeats(
            lambda: net.run_lattices(iters),
            lambda: jax.block_until_ready(net.get_lattice(0).state["v"]),
            iters)
        log(f"chemical network {rows}x{cols} [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f}); "
            f"fused={net._last_run_fused}")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-fused")
    except Exception as e:
        log("pallas chemical path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_stdp_lattice(rows=64, cols=64, iters=12800):
    # 12800 iters: same fixed-cost amortization as the reward rows
    """Standalone plain Lattice with STDP (BASELINE's 'STDP exc/inh
    lattice' config): XLA vs the fused single-lattice STDP path."""
    import spiking_neural_networks_tpu as snn

    def build(pallas):
        rng = np.random.default_rng(9)
        lat = snn.Lattice(snn.Izhikevich(), id=0)
        lat.populate(rows, cols, gap_conductance=10.0)
        lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=5)
        lat.do_plasticity = True
        lat.apply(lambda s: {**s, "v": jnp.asarray(
            rng.uniform(-65, 25, rows * cols), jnp.float32)})
        lat.scan_unroll = 4
        lat.use_pallas = pallas
        return lat

    def measure(lat, label):
        lat.run_lattice(iters)
        best, vals = timed_repeats(
            lambda: lat.run_lattice(iters),
            lambda: jax.block_until_ready(lat.state["v"]), iters)
        log(f"STDP lattice {rows}x{cols} [{label}]: best {best:.1f} "
            f"steps/s (spread {min(vals) / max(vals):.2f}); "
            f"fused={getattr(lat, '_last_run_fused', None)}")
        return best, vals

    xla_best, xla_vals = measure(build(False), "xla")
    try:
        pl_best, pl_vals = measure(build(True), "pallas-fused")
    except Exception as e:
        log("pallas STDP-lattice path unavailable:", repr(e)[:200])
        pl_vals = []
    return row_result(xla_vals, pl_vals)


def bench_experiment_trial():
    """End-to-end wall time of ONE full Bayesian-inference trial (the size
    class the reference's science pipelines actually run at:
    interface_gpu/experiments/bayesian_inference_pipeline.py:1-534 — a
    7x7 exc Hopfield + 3x3 inh network, chemical synapses, 2500 steps, plus
    the peaks + correlation-accuracy analysis)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "experiments"))
    import bayesian_inference_rate_based as b
    from pipeline_setup import generate_patterns

    parsed = {"simulation_parameters": dict(
        filename="bench_trial.json", iterations1=2500, first_window=1000,
        d1=True, use_correlation_as_accuracy=True, a=-1, b=0, skew=0.1,
        trials=1),
        "variables": dict(s_d1=[1], spike_train_to_exc=[4],
                          bayesian_to_exc=[0.4], prob_of_exc_to_inh=[1])}
    b.fill_defaults(parsed)
    sp = parsed["simulation_parameters"]
    cs = {k: v[0] for k, v in parsed["variables"].items()}
    rng = np.random.default_rng(0)
    patterns = generate_patterns(49, 0.5, 3, sp["correlation_threshold"],
                                 rng=rng)
    bayes = generate_patterns(49, 0.5, 3, sp["correlation_threshold"],
                              rng=rng)
    # warmup trial compiles the step program; the timed trials rebuild the
    # network host-side each time, exactly like the pipeline's trial loop
    b.run_trial(sp, cs, patterns, bayes, np.random.default_rng(1))
    vals = []
    for k in range(2):
        t0 = time.perf_counter()
        b.run_trial(sp, cs, patterns, bayes, np.random.default_rng(2 + k))
        vals.append(time.perf_counter() - t0)
    best = min(vals)
    log(f"bayesian trial: best {best:.2f}s wall per trial over "
        f"{len(vals)} runs {['%.2f' % v for v in vals]}")
    return best, vals


def main():
    log("devices:", jax.devices())
    ups, up_runs = bench_izhikevich()
    extra = {"izhikevich_runs": up_runs}
    for name, fn in [("izhikevich_updates_per_sec_2048x2048",
                      bench_izhikevich_large),
                     ("izhikevich_updates_per_sec_4096x4096",
                      lambda: bench_izhikevich_large(4096, 4096, 256)),
                     ("hh_stdp_steps_per_sec_128x128", bench_hh_stdp),
                     ("alif_poisson_network_steps_per_sec_64x64",
                      bench_lif_poisson_network),
                     ("chemical_network_steps_per_sec_64x64",
                      bench_chemical_network),
                     ("eeg_stdp_network_steps_per_sec_64x64",
                      bench_network_eeg_stdp),
                     ("rstdp_lattice_steps_per_sec_64x64",
                      bench_rstdp_lattice),
                     ("stdp_lattice_steps_per_sec_64x64",
                      bench_stdp_lattice),
                     ("reward_network_steps_per_sec_32x32",
                      bench_reward_network),
                     ("reward_network_steps_per_sec_32x32_12800iters",
                      lambda: bench_reward_network(iters=12800)),
                     # 12800 iters: at 128x128 the ~80-155 ms fixed
                     # dispatch+pull per call masks the kernel's ~4x
                     # marginal step-time win at 3000-iter runs (measured
                     # r05: pallas 27.3k vs xla 14.9k at 3000)
                     ("reward_network_steps_per_sec_128x128",
                      lambda: bench_reward_network(n_side=128,
                                                   iters=12800)),
                     ("closed_loop_rl_steps_per_sec", bench_closed_loop),
                     ("bayesian_experiment_trial_seconds",
                      bench_experiment_trial)]:
        try:
            extra[name], extra[name + "_runs"] = fn()
        except Exception as e:  # secondary metrics must not sink the primary
            log(name, "failed:", repr(e))
            extra[name] = None
    result = {
        "metric": "neuron-updates/sec (512x512 Izhikevich lattice, electrical)",
        "value": ups,
        "unit": "updates/s",
        "vs_baseline": ups / 1e9,
        "extra": extra,
    }
    # Full detail blob first, compact summary LAST: the driver's artifact
    # keeps only the final ~2000 chars of stdout, and all four prior rounds'
    # BENCH_r*.json lost the headline to that truncation (VERDICT r04 item 4).
    # The last line alone must carry every row's median and pallas/xla ratio.
    print(json.dumps(result), flush=True)
    summary = {"headline_512x512_median_updates_per_sec": round(ups),
               "vs_baseline": round(ups / 1e9, 3),
               "headline_ratio": round(up_runs.get("ratio", 0.0), 2)}
    for name in list(extra):
        if name.endswith("_runs") or extra[name] is None:
            continue
        runs = extra.get(name + "_runs")
        row = {"v": round(extra[name], 1)}
        if isinstance(runs, dict) and runs.get("ratio"):
            row["ratio"] = round(runs["ratio"], 2)
        summary[name] = row
    print(json.dumps({"metric": result["metric"], "value": ups,
                      "unit": "updates/s", "vs_baseline": ups / 1e9,
                      "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
