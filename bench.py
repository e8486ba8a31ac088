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


def bench_hh_stdp(rows=128, cols=128, iters=500):
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


def main():
    log("devices:", jax.devices())
    ups, _ = bench_izhikevich()
    try:
        hh_sps = bench_hh_stdp()
    except Exception as e:  # secondary metric must not sink the primary
        log("HH+STDP bench failed:", repr(e))
        hh_sps = None
    result = {
        "metric": "neuron-updates/sec (512x512 Izhikevich lattice, electrical)",
        "value": ups,
        "unit": "updates/s",
        "vs_baseline": ups / 1e9,
        "extra": {"hh_stdp_steps_per_sec_128x128": hh_sps},
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
