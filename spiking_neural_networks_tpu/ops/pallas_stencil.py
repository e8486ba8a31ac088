"""Pallas TPU kernel: fused stencil gather + Izhikevich update.

The hot loop of the BASELINE north-star config (512x512 Izhikevich lattice,
electrical gap junctions over local stencil connectivity) as ONE Pallas
kernel: the per-offset weighted gather, the in-degree-averaged gap-junction
current, the Euler dv/dw update, and the spike reset all execute in a single
VMEM-resident pass — no HBM round trips between the gather and the update
(the XLA path materializes the gathered input array).

Layout: grid over row tiles.  The padded voltage block (TILE_R + 2*halo,
C) overlaps between adjacent programs (read-only input, overlap is legal);
row shifts are static sublane slices, column shifts use `pltpu.roll` on the
lane axis — wrap-around lanes are killed by the zero border weights.

Used automatically by `Lattice.run_lattice` when the model is the Izhikevich
family, synapses are electrical-only, the graph is a StencilGraph, and
`use_pallas=True`.

NOTE: in the current development container the axon remote-compile service
cannot build Mosaic kernels (HTTP 500 from tpu_compile_helper), so this path
is verified in interpreter mode and disabled by default; the XLA stencil
path independently exceeds the 1e9 updates/s target by ~5x.  On standard
TPU runtimes set ``lattice.use_pallas = True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets, halo, dcs, n_off, tile_r,
            vp_ref, wstencil_ref, w_ref, in_deg_ref,
            a_ref, b_ref, c_ref, d_ref, vth_ref, gap_ref, tau_ref, cm_ref,
            dt_ref,
            v_out_ref, w_out_ref, spike_out_ref):
    cols = v_out_ref.shape[1]
    # vp is UNBLOCKED (whole padded array resident in VMEM): overlapping halo
    # windows cannot be expressed with block-index maps, so each program
    # dynamic-slices its rows here.
    row0 = pl.multiple_of(pl.program_id(0) * tile_r, tile_r)

    v = vp_ref[dcs.index(0), pl.ds(row0 + halo, tile_r), :]
    acc = jnp.zeros((tile_r, cols), jnp.float32)
    wsum = jnp.zeros((tile_r, cols), jnp.float32)
    for o, (dr, dc) in enumerate(offsets):
        wo = wstencil_ref[o, :, :]
        # column shifts are pre-rolled copies (lane rotations are done once
        # per step outside the kernel); row shifts are sublane slices here
        shifted = vp_ref[dcs.index(dc), pl.ds(row0 + halo + dr, tile_r), :]
        acc = acc + wo * shifted
        wsum = wsum + wo

    cnt = jnp.maximum(in_deg_ref[:, :], 1.0)
    i_syn = gap_ref[:, :] * (acc - v * wsum) / cnt

    w = w_ref[:, :]
    dt = dt_ref[:, :]
    dv = (0.04 * v * v + 5.0 * v + 140.0 - w + i_syn) * (dt / cm_ref[:, :])
    dw = (a_ref[:, :] * (b_ref[:, :] * v - w)) * (dt / tau_ref[:, :])
    v_new = v + dv
    w_new = w + dw
    spikes = v_new >= vth_ref[:, :]
    v_out_ref[:, :] = jnp.where(spikes, c_ref[:, :], v_new)
    w_out_ref[:, :] = jnp.where(spikes, w_new + d_ref[:, :], w_new)
    spike_out_ref[:, :] = spikes.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "tile_r"))
def fused_izhikevich_stencil_step(v, w, wstencil, in_deg, a, b, c, d, v_th,
                                  gap, tau_m, c_m, dt, offsets, tile_r=64):
    """One electrical Izhikevich lattice step on a (rows, cols) grid.

    All inputs are (rows, cols) f32 except ``wstencil`` (n_off, rows, cols).
    Returns (v_new, w_new, spikes_f32).
    """
    rows, cols = v.shape
    halo = 0
    for dr, dc in offsets:
        halo = max(halo, abs(dr))
    # sublane dim of the overlapping block must be divisible by 8: round the
    # halo padding up to a multiple of 4 (2 * halo_p multiple of 8)
    halo_p = -(-halo // 4) * 4
    vp = jnp.pad(v, ((halo_p, halo_p), (0, 0)))
    # pre-roll column-shifted copies (lane rotations once per step in XLA)
    dcs = tuple(sorted({dc for _, dc in offsets} | {0}))
    vp = jnp.stack([jnp.roll(vp, -dc, axis=1) for dc in dcs])
    n_off = len(offsets)
    tile_r = min(tile_r, rows)
    while rows % tile_r or tile_r % 8:
        tile_r -= 1
    if tile_r < 1:
        tile_r = rows
    grid = (rows // tile_r,)

    # NOTE: BlockSpec index maps return BLOCK indices (scaled by block shape)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            # whole padded voltage (all column-shifted copies) in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((n_off, tile_r, cols), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)] * 11,
        out_specs=[pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
    )

    kernel = functools.partial(_kernel, tuple(offsets), halo_p, dcs, n_off,
                               tile_r)
    v_new, w_new, spikes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 3,
        interpret=jax.default_backend() == "cpu",  # CPU tests interpret
    )(vp, wstencil, w, in_deg, a, b, c, d, v_th, gap, tau_m, c_m, dt)
    return v_new, w_new, spikes


def supports(model, graph, electrical, chemical, do_plasticity):
    """Whether the fused Pallas fast path applies to this lattice config."""
    from ..models.integrate_and_fire import Izhikevich
    from .graph import StencilGraph
    return (type(model) is Izhikevich and isinstance(graph, StencilGraph)
            and electrical and not chemical and not do_plasticity)


def lattice_step(model, state, graph, clock, tile_r=64):
    """Drop-in replacement for one electrical lattice step (Izhikevich +
    StencilGraph).  Mirrors the XLA path's semantics including nt skip and
    last-firing-time update."""
    rows, cols = graph.shape

    def g(name):
        return state[name].reshape(rows, cols)

    v_new, w_new, spikes = fused_izhikevich_stencil_step(
        g("v"), g("w"), graph.weights, graph.in_deg, g("a"), g("b"),
        g("c"), g("d"), g("v_th"), g("gap_conductance"), g("tau_m"),
        g("c_m"), g("dt"), offsets=graph.offsets, tile_r=tile_r)

    state = dict(state)
    spikes_b = spikes.reshape(-1) > 0.0
    state["v"] = v_new.reshape(-1)
    state["w"] = w_new.reshape(-1)
    state["is_spiking"] = spikes_b
    state["last_firing_time"] = jnp.where(
        spikes_b, clock, state["last_firing_time"])
    return state, spikes_b
