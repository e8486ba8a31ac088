"""Liquid manifold generation: on/off input phases → voltage trajectories
→ low-dimensional neural manifold.

Port of the reference's
`/root/reference/interface/experiments/liquid_custom_manifold_generation.py`
(and `liquid_manifold_generation.py`): drive defined regions of a recurrent
liquid with an input for an *on phase*, silence it for an *off phase*,
record the full voltage grid over time, report per-phase signal-to-noise of
the mean voltage, and export the flattened trajectories.  Where the
reference leaves the manifold determination to an offline plotting script,
here we also compute the PCA embedding directly (SVD of the centered
trajectory matrix) and report explained variance of the leading components.

Run: python experiments/liquid_manifold_generation.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from pipeline_setup import output_path, signal_to_noise

import jax
import jax.numpy as jnp
import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.ops.graph import DenseGraph


def build_liquid(rows=10, cols=10, seed=42, input_region=None):
    """Fixed recurrent liquid + a Poisson input lattice wired one-to-one into
    `input_region` (boolean grid mask; default: left half)."""
    rng = np.random.default_rng(seed)
    n = rows * cols
    liquid = snn.Lattice(snn.Izhikevich(), id=0)
    liquid.populate(rows, cols, gap_conductance=10.0)
    mask = rng.random((n, n)) < 0.1
    np.fill_diagonal(mask, False)
    w = rng.uniform(0.5, 1.5, (n, n)) * np.where(
        rng.random((n, n)) < 0.2, -1.0, 1.0)
    liquid.graph = DenseGraph(jnp.asarray(np.where(mask, w, 0.0), jnp.float32),
                              jnp.asarray(mask))
    liquid.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-65, 20, n), jnp.float32)})
    liquid.update_grid_history = True

    if input_region is None:
        input_region = np.zeros((rows, cols), bool)
        input_region[:, : cols // 2] = True

    inp = snn.SpikeTrainLattice(snn.PoissonSpikeTrain(), id=1)
    inp.populate(rows, cols)
    net = snn.LatticeNetwork.generate_network([liquid], [inp])
    net.connect(1, 0, lambda x, y: x == y, lambda x, y: 6.0)
    return net, liquid, inp, input_region


def set_firing(inp, region, rate_hz, dt=0.1):
    chance = snn.PoissonSpikeTrain.rate_to_chance(rate_hz, dt) if rate_hz \
        else 0.0
    inp.state = dict(inp.state)
    inp.state["chance_of_firing"] = jnp.asarray(
        np.where(region.reshape(-1), chance, 0.0), jnp.float32)


def main(on_phase=300, off_phase=500, rate_hz=80.0, n_components=3,
         filename="liquid_manifold_output.json"):
    net, liquid, inp, region = build_liquid()
    inp.key = jax.random.PRNGKey(0)

    # on phase: drive the region; off phase: silence and let the liquid relax
    set_firing(inp, region, rate_hz)
    net.run_lattices(on_phase)
    set_firing(inp, region, 0.0)
    net.run_lattices(off_phase)

    hist = np.stack(liquid.grid_history.history)          # (T, rows, cols)
    T = hist.shape[0]
    traj = hist.reshape(T, -1)                            # (T, N)
    voltages = traj.mean(axis=1)

    snr = {
        "first_half_on": float(signal_to_noise(voltages[: on_phase // 2])),
        "second_half_on": float(signal_to_noise(
            voltages[on_phase // 2: on_phase])),
        "off": float(signal_to_noise(voltages[on_phase:])),
    }

    # PCA of the centered trajectory: the liquid's neural manifold
    centered = traj - traj.mean(axis=0, keepdims=True)
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    var = s ** 2 / (s ** 2).sum()
    embedding = centered @ vt[:n_components].T            # (T, k)

    print(f"on-phase mean v {voltages[:on_phase].mean():.2f}, "
          f"off-phase mean v {voltages[on_phase:].mean():.2f}")
    print("signal-to-noise:", {k: round(v, 3) for k, v in snr.items()})
    print(f"explained variance (top {n_components}): "
          f"{[round(float(x), 3) for x in var[:n_components]]} "
          f"(total {var[:n_components].sum():.3f})")

    with open(output_path(filename), "w") as f:
        json.dump({
            "voltages": voltages.tolist(),
            "signal_to_noise": snr,
            "explained_variance": var[:n_components].tolist(),
            "embedding": embedding.tolist(),
        }, f)
    return snr, var[:n_components]


if __name__ == "__main__":
    main()
