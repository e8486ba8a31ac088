"""Temporal-blocked (tiled halo) multi-step kernel vs the whole-lattice
multi-step kernel and the XLA runner (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.ops.graph import StencilGraph, radius_offsets
from spiking_neural_networks_tpu.ops import pallas_stencil
from spiking_neural_networks_tpu.ops.pallas_stencil import (
    fused_izhikevich_multistep, fused_izhikevich_multistep_tiled,
    tiled_overlap_weights)


def test_tiled_multistep_matches_whole_lattice_kernel():
    """4 row tiles with halo 16 (oversized halo is legal) reproduce the
    single-block multi-step kernel exactly — halo garbage never reaches
    the core rows."""
    rows, cols = 256, 128
    offsets = radius_offsets(2.0)
    g = StencilGraph.build(rows, cols, offsets, keep_prob=0.8, seed=7)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.uniform(-65, 30, (rows, cols)), jnp.float32)
    w = jnp.full((rows, cols), 30.0, jnp.float32)
    lft = jnp.full((rows, cols), -1, jnp.int32)
    f = lambda val: jnp.full((rows, cols), val, jnp.float32)
    params = jnp.asarray([0.02, 0.2, -55.0, 8.0, 30.0, 10.0, 1.0, 100.0,
                          0.1], jnp.float32)

    vr, wr, lftr, spkr = fused_izhikevich_multistep(
        v, w, lft, g.weights, g.in_deg, f(0.02), f(0.2), f(-55.0), f(8.0),
        f(30.0), f(10.0), f(1.0), f(100.0), f(0.1), 100,
        offsets=g.offsets, n_steps=8)

    wst_ov, ind_ov = tiled_overlap_weights(g.weights, g.in_deg, 64, 16)
    vt, wt, lftt, spkt = fused_izhikevich_multistep_tiled(
        v, w, lft, wst_ov, ind_ov, params, 100, offsets=g.offsets,
        n_steps=8, tile_r=64, halo=16)

    np.testing.assert_allclose(np.asarray(vt), np.asarray(vr),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wt), np.asarray(wr),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lftt), np.asarray(lftr))
    np.testing.assert_array_equal(np.asarray(spkt) > 0, np.asarray(spkr) > 0)


def test_tiled_runner_path_matches_xla():
    """End-to-end through Lattice.run_lattice with the VMEM check forced
    to fail, so the runner engages the tiled kernel (incl. the remainder
    launch: 50 = 6*8 + 2)."""
    orig = pallas_stencil.multistep_vmem_ok
    pallas_stencil.multistep_vmem_ok = lambda g, *a, **kw: False
    try:
        def run(use_pallas):
            lat = snn.Lattice(snn.Izhikevich())
            lat.populate(256, 128, gap_conductance=10.0)
            lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=7)
            v0 = np.random.default_rng(5).uniform(-65, 30, 256 * 128)
            lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
            lat.use_pallas = use_pallas
            lat.run_lattice(50)
            return lat

        a, b = run(False), run(True)
        np.testing.assert_allclose(np.asarray(b.state["v"]),
                                   np.asarray(a.state["v"]),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(b.state["last_firing_time"]),
            np.asarray(a.state["last_firing_time"]))
    finally:
        pallas_stencil.multistep_vmem_ok = orig


def test_tiled_runner_requires_uniform_params():
    """Non-uniform params fall back to the per-step kernel path (float
    tolerance, not bit-exact) and stay correct."""
    orig = pallas_stencil.multistep_vmem_ok
    pallas_stencil.multistep_vmem_ok = lambda g, *a, **kw: False
    try:
        def run(use_pallas):
            lat = snn.Lattice(snn.Izhikevich())
            lat.populate(128, 128, gap_conductance=10.0)
            lat.connect_stencil(radius=2.0, keep_prob=0.8, seed=9)
            rng = np.random.default_rng(6)
            lat.apply(lambda s: {
                **s,
                "v": jnp.asarray(rng.uniform(-65, 30, 128 * 128),
                                 jnp.float32),
                "a": jnp.asarray(rng.uniform(0.01, 0.03, 128 * 128),
                                 jnp.float32)})
            lat.use_pallas = use_pallas
            lat.run_lattice(10)
            return lat

        a, b = run(False), run(True)
        np.testing.assert_allclose(np.asarray(b.state["v"]),
                                   np.asarray(a.state["v"]),
                                   rtol=1e-5, atol=1e-4)
    finally:
        pallas_stencil.multistep_vmem_ok = orig


def test_uniform_lattice_params_detection():
    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(8, 8, gap_conductance=10.0)
    assert pallas_stencil.uniform_lattice_params(lat.state)
    lat.apply(lambda s: {**s, "b": s["b"].at[3].set(0.5)})
    assert not pallas_stencil.uniform_lattice_params(lat.state)
