"""Step-time counters and profiler hooks.

The reference has no built-in profiling (SURVEY.md §5: the OpenCL queue
enables profiling but never reads it).  Here: wall-clock step-rate
measurement for any runnable (lattice/network) plus a thin wrapper over the
JAX profiler for trace capture.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Measures steady-state steps/sec and neuron-updates/sec of a runnable
    (`Lattice.run_lattice` / `LatticeNetwork.run_lattices`)."""

    def __init__(self, obj):
        self.obj = obj
        self.results = {}

    def _run(self, iterations):
        if hasattr(self.obj, "run_lattices"):
            self.obj.run_lattices(iterations)
        else:
            self.obj.run_lattice(iterations)
        leaf = next(iter(
            self.obj.lattices.values())).state["v"] \
            if hasattr(self.obj, "lattices") else self.obj.state["v"]
        jax.block_until_ready(leaf)

    def measure(self, iterations=1000, warmup=True):
        if iterations <= 0:
            raise ValueError("iterations must be positive")
        if warmup:
            self._run(iterations)
        t0 = time.perf_counter()
        self._run(iterations)
        dt = time.perf_counter() - t0
        n = ((sum(l.n for l in self.obj.lattices.values())
              + sum(l.n for l in getattr(self.obj,
                                         "reward_modulated_lattices",
                                         {}).values())
              + sum(s.n for s in self.obj.spike_train_lattices.values()))
             if hasattr(self.obj, "lattices") else self.obj.n)
        self.results = {
            "seconds": dt,
            "steps_per_sec": iterations / dt,
            "step_time_us": dt / iterations * 1e6,
            "neuron_updates_per_sec": n * iterations / dt,
        }
        return self.results


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """Capture a JAX profiler trace around a block (view with xprof/
    tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
