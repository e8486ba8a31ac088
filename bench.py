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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_izhikevich(rows=512, cols=512, iters=2000):
    import spiking_neural_networks_tpu as snn

    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=7)
    # 4x-unrolled step loop amortizes the per-iteration multi-kernel
    # overhead floor (measured 53.7 -> 48.0 us/step in-process on v5e)
    lat.scan_unroll = 4
    v0 = np.random.default_rng(1).uniform(-65.0, 30.0, rows * cols)
    lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})

    log("compiling izhikevich lattice ...")
    t0 = time.perf_counter()
    lat.run_lattice(iters)
    jax.block_until_ready(lat.state["v"])
    log(f"warmup (compile+run) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    lat.run_lattice(iters)
    jax.block_until_ready(lat.state["v"])
    dt = time.perf_counter() - t0

    ups = rows * cols * iters / dt
    log(f"izhikevich {rows}x{cols}: {iters} steps in {dt:.3f}s -> "
        f"{ups:.3e} neuron-updates/s")
    return ups, dt


def bench_hh_stdp(rows=128, cols=128, iters=2000):
    import spiking_neural_networks_tpu as snn

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

    log("compiling HH+STDP lattice ...")
    lat.run_lattice(iters)
    jax.block_until_ready(lat.state["v"])

    t0 = time.perf_counter()
    lat.run_lattice(iters)
    jax.block_until_ready(lat.state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"HH+STDP {rows}x{cols}: {iters} steps in {dt:.3f}s -> {sps:.1f} steps/s")
    return sps


def bench_lif_poisson_network(rows=64, cols=64, iters=5000):
    """BASELINE config 2: adaptive LIF lattice driven by a Poisson lattice."""
    import spiking_neural_networks_tpu as snn

    lat = snn.Lattice(snn.AdaptiveLeakyIntegrateAndFire(), id=0)
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=3)
    st = snn.SpikeTrainLattice(snn.PoissonSpikeTrain(), id=1)
    st.populate(rows, cols)
    st.state = st.model.init_from_firing_rate(rows * cols, hertz=50.0, dt=0.1)
    net = snn.LatticeNetwork.generate_network([lat], [st])
    net.connect(1, 0, lambda x, y: x == y, lambda x, y: 5.0)

    net.run_lattices(iters)
    jax.block_until_ready(lat.state["v"])
    t0 = time.perf_counter()
    net.run_lattices(iters)
    jax.block_until_ready(net.get_lattice(0).state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"ALIF+Poisson network {rows}x{cols}: {sps:.1f} steps/s")
    return sps


def bench_network_eeg_stdp(rows=64, cols=64, iters=5000):
    """BASELINE config 5: multi-lattice network, EEG readout, Poisson-encoded
    STDP classifier-style wiring."""
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.core.history import EEGHistory

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
    st.state = st.model.init_from_firing_rate(rows * cols, hertz=25.0, dt=0.1)
    net = snn.LatticeNetwork.generate_network([exc, inh], [st])
    net.connect(2, 0, lambda x, y: x == y, lambda x, y: 4.0)
    net.connect_vectorized(0, 1, lambda pr, pc, qr, qc: np.where(
        (pr // 2 == qr) & (pc // 2 == qc), 0.5, np.nan))
    net.connect_vectorized(1, 0, lambda pr, pc, qr, qc: np.where(
        (pr == qr // 2) & (pc == qc // 2), -0.8, np.nan))
    net.history_chunk = iters
    net.scan_unroll = 4  # 13.2k -> 14.8k steps/s in-process on v5e

    net.run_lattices(iters)
    t0 = time.perf_counter()
    net.run_lattices(iters)
    jax.block_until_ready(net.get_lattice(0).state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"EEG+STDP network: {sps:.1f} steps/s; EEG samples "
        f"{len(exc.grid_history.history)}")
    return sps


def bench_rstdp_lattice(rows=64, cols=64, iters=3000):
    """Reward-modulated STDP lattice: per-edge eligibility traces on a
    radius-2 graph (stencil-decomposed), two visits per edge per step."""
    import spiking_neural_networks_tpu as snn

    lat = snn.RewardModulatedLattice(snn.Izhikevich())
    lat.populate(rows, cols, gap_conductance=10.0)
    lat.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                and x != y)
    lat.scan_unroll = 4  # 17.9k -> 25.5k steps/s in-process on v5e
    lat.run_lattice_with_reward(0.5, iters)
    t0 = time.perf_counter()
    lat.run_lattice_with_reward(0.5, iters)
    jax.block_until_ready(lat.state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"R-STDP lattice {rows}x{cols}: {sps:.1f} steps/s")
    return sps


def bench_reward_network(n_side=32, iters=3000):
    """RewardModulatedLatticeNetwork (reward lattice + plastic plain lattice
    + Poisson drive, mixed plain/reward connections) on the structured
    runner (core/reward_structured.py; 6.2x over the flat COO path)."""
    import spiking_neural_networks_tpu as snn

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
    st.state = st.model.init_from_firing_rate(n_side * n_side, hertz=40.0,
                                              dt=0.1)
    net = snn.RewardModulatedLatticeNetwork()
    net.add_lattice(rlat)
    net.add_lattice(plain)
    net.add_spike_train_lattice(st)
    net.connect(2, 1, lambda a, b: a == b, lambda a, b: 5.0)
    net.connect_with_reward_modulation(1, 0, lambda a, b: a == b,
                                       lambda a, b: 1.0)

    net.run_lattices_with_reward(0.5, iters)
    t0 = time.perf_counter()
    net.run_lattices_with_reward(0.5, iters)
    jax.block_until_ready(net.get_reward_modulated_lattice(0).state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"reward network {n_side}x{n_side}: {sps:.1f} steps/s")
    return sps


def bench_closed_loop(iters=1500):
    """Fused on-device RL loop (interactable.JitEnvironment): reward ->
    R-STDP agent update -> env state -> cue encoding, one lax.scan."""
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.interactable import JitEnvironment

    lat = snn.RewardModulatedLattice(snn.Izhikevich())
    lat.populate(10, 10, gap_conductance=10.0)
    lat.connect_stencil(radius=2.0, keep_prob=1.0, seed=5)
    v0 = np.random.default_rng(0).uniform(-65, 30, 100).astype(np.float32)
    lat.apply(lambda s: {**s, "v": jnp.asarray(v0)})
    env = JitEnvironment(
        lat, {"rate": jnp.float32(0.0)},
        lambda e, s: {**s, "v": s["v"].at[:6].set(31.0)},
        lambda e, s: jnp.clip(0.08 - e["rate"], -0.05, 0.05),
        lambda e, s: {"rate": 0.9 * e["rate"]
                      + 0.1 * s["is_spiking"].astype(jnp.float32).mean()})
    env.run_with_reward(iters)
    t0 = time.perf_counter()
    env.run_with_reward(iters)
    jax.block_until_ready(lat.state["v"])
    dt = time.perf_counter() - t0
    sps = iters / dt
    log(f"closed-loop RL (JitEnvironment): {sps:.1f} steps/s")
    return sps


def main():
    log("devices:", jax.devices())
    ups, _ = bench_izhikevich()
    extra = {}
    for name, fn in [("hh_stdp_steps_per_sec_128x128", bench_hh_stdp),
                     ("alif_poisson_network_steps_per_sec_64x64",
                      bench_lif_poisson_network),
                     ("eeg_stdp_network_steps_per_sec_64x64",
                      bench_network_eeg_stdp),
                     ("rstdp_lattice_steps_per_sec_64x64",
                      bench_rstdp_lattice),
                     ("reward_network_steps_per_sec_32x32",
                      bench_reward_network),
                     ("closed_loop_rl_steps_per_sec", bench_closed_loop)]:
        try:
            extra[name] = fn()
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
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
