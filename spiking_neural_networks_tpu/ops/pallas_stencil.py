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
`use_pallas=True`.  Without histories the runner upgrades to the
MULTI-STEP kernel (`fused_izhikevich_multistep`): the whole lattice stays
resident in VMEM for K=16 steps per launch, so the ~35 MB of weight+param
HBM traffic is amortized 16x — measured 21 us/step at 512x512 on v5e
(1.24e10 neuron-updates/s) vs 45-52 us for the best XLA stencil path.

Two Mosaic gotchas this file works around (round-3 findings):
* dynamic row slices of UNBLOCKED refs miscompile when the lane dim
  exceeds 128 — all unblocked arrays are laid out (rows, L, 128);
* the default VMEM budget rejects kernels whose weight planes + roll
  temporaries exceed ~10 MB — `_compiler_params` raises
  ``vmem_limit_bytes`` (v5e has 128 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params(vmem_bytes=100 * 1024 * 1024):
    """Raise Mosaic's VMEM budget: the default limit rejects kernels whose
    weight planes + roll temporaries exceed ~10 MB (the compile helper
    exits 1), even though v5e VMEM is 128 MB."""
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    except (AttributeError, TypeError):
        return pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_bytes)


def _kernel(offsets, halo, dcs, n_off, tile_r, rows_p,
            vp_ref, wstencil_ref, w_ref, in_deg_ref,
            a_ref, b_ref, c_ref, d_ref, vth_ref, gap_ref, tau_ref, cm_ref,
            dt_ref,
            v_out_ref, w_out_ref, spike_out_ref):
    shape = v_out_ref.shape        # (tile_r, L, lane)
    # vp is UNBLOCKED (whole padded array resident in VMEM): overlapping halo
    # windows cannot be expressed with block-index maps, so each program
    # dynamic-slices its rows here.  The column-shifted copies are stacked
    # ALONG THE ROW AXIS (a static per-copy base offset): Mosaic's dynamic
    # row slice of an unblocked ref miscompiles when the lane dim exceeds
    # 128, so every array is laid out (rows, L, 128) with columns split
    # across the L axis and the dynamic slice kept on the leading row axis.
    row0 = pl.multiple_of(pl.program_id(0) * tile_r, tile_r)

    v = vp_ref[pl.ds(dcs.index(0) * rows_p + row0 + halo, tile_r), :, :]
    acc = jnp.zeros(shape, jnp.float32)
    wsum = jnp.zeros(shape, jnp.float32)
    for o, (dr, dc) in enumerate(offsets):
        wo = wstencil_ref[o, :, :, :]
        # column shifts are pre-rolled copies (lane rotations are done once
        # per step outside the kernel); row shifts are sublane slices here
        base = dcs.index(dc) * rows_p
        shifted = vp_ref[pl.ds(base + row0 + halo + dr, tile_r), :, :]
        acc = acc + wo * shifted
        wsum = wsum + wo

    cnt = jnp.maximum(in_deg_ref[:, :, :], 1.0)
    i_syn = gap_ref[:, :, :] * (acc - v * wsum) / cnt

    w = w_ref[:, :, :]
    dt = dt_ref[:, :, :]
    dv = (0.04 * v * v + 5.0 * v + 140.0 - w + i_syn) * (dt / cm_ref[:, :, :])
    dw = (a_ref[:, :, :] * (b_ref[:, :, :] * v - w)) * (dt / tau_ref[:, :, :])
    v_new = v + dv
    w_new = w + dw
    spikes = v_new >= vth_ref[:, :, :]
    v_out_ref[:, :, :] = jnp.where(spikes, c_ref[:, :, :], v_new)
    w_out_ref[:, :, :] = jnp.where(spikes, w_new + d_ref[:, :, :], w_new)
    spike_out_ref[:, :, :] = spikes.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "tile_r"))
def fused_izhikevich_stencil_step(v, w, wstencil, in_deg, a, b, c, d, v_th,
                                  gap, tau_m, c_m, dt, offsets, tile_r=64):
    """One electrical Izhikevich lattice step on a (rows, cols) grid.

    All inputs are (rows, cols) f32 except ``wstencil`` (n_off, rows, cols).
    Returns (v_new, w_new, spikes_f32).
    """
    rows, cols = v.shape
    # split columns into lanes of <=128 (see _kernel layout note).  cols
    # that are neither <=128 nor a multiple of 128 would force lane > 128
    # and hit the documented Mosaic unblocked-ref miscompile — callers must
    # check `step_kernel_ok` first (the runner falls back to XLA).
    if cols > 128 and cols % 128:
        raise ValueError(
            f"fused_izhikevich_stencil_step needs cols <= 128 or a "
            f"multiple of 128 (got {cols}); see step_kernel_ok")
    lane = 128 if cols % 128 == 0 else cols
    L = cols // lane
    halo = 0
    for dr, dc in offsets:
        halo = max(halo, abs(dr))
    # sublane dim of the overlapping block must be divisible by 8: round the
    # halo padding up to a multiple of 4 (2 * halo_p multiple of 8)
    halo_p = -(-halo // 4) * 4
    rows_p = rows + 2 * halo_p
    vp = jnp.pad(v, ((halo_p, halo_p), (0, 0)))
    # pre-roll column-shifted copies (lane rotations once per step in XLA),
    # stacked along the row axis so the kernel's dynamic slice stays on the
    # leading dim
    dcs = tuple(sorted({dc for _, dc in offsets} | {0}))
    vp = jnp.concatenate([jnp.roll(vp, -dc, axis=1) for dc in dcs], axis=0)
    vp = vp.reshape(len(dcs) * rows_p, L, lane)
    n_off = len(offsets)
    tile_r = min(tile_r, rows)
    while tile_r > 1 and (rows % tile_r or tile_r % 8):
        tile_r -= 1
    if rows % tile_r or tile_r % 8:
        # no divisor of rows is a multiple of 8: one full-row block
        tile_r = rows
    grid = (rows // tile_r,)

    def to3(x):
        return x.reshape(rows, L, lane)

    # NOTE: BlockSpec index maps return BLOCK indices (scaled by block shape)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            # whole padded voltage (all column-shifted copies) in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((n_off, tile_r, L, lane), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((tile_r, L, lane), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)] * 11,
        out_specs=[pl.BlockSpec((tile_r, L, lane), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 3,
    )

    kernel = functools.partial(_kernel, tuple(offsets), halo_p, dcs, n_off,
                               tile_r, rows_p)
    v_new, w_new, spikes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, L, lane), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",  # CPU tests interpret
    )(vp, wstencil.reshape(n_off, rows, L, lane), to3(w), to3(in_deg),
      to3(a), to3(b), to3(c), to3(d), to3(v_th), to3(gap), to3(tau_m),
      to3(c_m), to3(dt))
    back = (rows, cols)
    return v_new.reshape(back), w_new.reshape(back), spikes.reshape(back)


def _kernel_multi(offsets, n_off, n_steps, emit,
                  clock_ref, v_ref, w_ref, lft_ref, wst_ref, in_deg_ref,
                  a_ref, b_ref, c_ref, d_ref, vth_ref, gap_ref, tau_ref,
                  cm_ref, dt_ref,
                  v_out_ref, w_out_ref, lft_out_ref, spike_out_ref,
                  *hist_refs):
    """K simulation steps with the WHOLE lattice resident in VMEM.

    grid=(1,): every array is a single full block, so HBM traffic
    (weights + params + state, ~35 MB at 512x512) is paid once per K steps
    instead of once per step.  Column/row shifts are static `jnp.roll`s on
    VALUES (not refs — Mosaic's unblocked-ref dynamic slice is what breaks
    at >128 lanes); wrap-around contributions are killed by the stencil's
    zero border weights (StencilGraph.build pads borders with 0).

    With ``emit`` True a single extra (n_steps, R, C) output receives the
    PRE-RESET voltage of every step, written with STATIC step indices (a
    Python loop replaces the fori_loop — a dynamic leading-dim store would
    hit the >128-lane unblocked-ref gotcha at wide grids).  Only v_pre is
    emitted: storing any per-step value derived from a pure select chain
    (the spike predicate, lft, even behind optimization_barrier) triggers
    a superlinear XLA:CPU compile blowup under scan (16x16 K=16 went 4s
    -> 135s+, growing with body size); v_pre is plain arithmetic and the
    caller reconstructs spikes (v_pre >= v_th) and post-reset v exactly."""
    v = v_ref[:, :]
    w = w_ref[:, :]
    lft = lft_ref[:, :]
    wst = [wst_ref[o, :, :] for o in range(n_off)]
    wsum = sum(wst)
    cnt = jnp.maximum(in_deg_ref[:, :], 1.0)
    a = a_ref[:, :]
    b = b_ref[:, :]
    c = c_ref[:, :]
    d = d_ref[:, :]
    v_th = vth_ref[:, :]
    gap = gap_ref[:, :]
    dt_tau = dt_ref[:, :] / tau_ref[:, :]
    dt_cm = dt_ref[:, :] / cm_ref[:, :]
    clock0 = clock_ref[0]

    def step_math(v, w):
        acc = jnp.zeros_like(v)
        for o, (dr, dc) in enumerate(offsets):
            shifted = v
            if dr:
                shifted = jnp.roll(shifted, -dr, 0)
            if dc:
                shifted = jnp.roll(shifted, -dc, 1)
            acc = acc + wst[o] * shifted
        i_syn = gap * (acc - v * wsum) / cnt
        dv = (0.04 * v * v + 5.0 * v + 140.0 - w + i_syn) * dt_cm
        dw = (a * (b * v - w)) * dt_tau
        return v + dv, w + dw

    def body(k, carry):
        v, w, lft, _ = carry
        v_pre, w_pre = step_math(v, w)
        spikes = v_pre >= v_th
        v_new = jnp.where(spikes, c, v_pre)
        w_new = jnp.where(spikes, w_pre + d, w_pre)
        lft = jnp.where(spikes, clock0 + k, lft)
        return v_new, w_new, lft, spikes

    spk0 = jnp.zeros(v.shape, jnp.bool_)
    if emit:
        # static-index history stores: unrolled Python loop
        spk = spk0
        for k in range(n_steps):
            v_pre, w_pre = step_math(v, w)
            hist_refs[0][k, :, :] = v_pre
            spk = v_pre >= v_th
            v = jnp.where(spk, c, v_pre)
            w = jnp.where(spk, w_pre + d, w_pre)
            lft = jnp.where(spk, clock0 + k, lft)
    else:
        v, w, lft, spk = jax.lax.fori_loop(0, n_steps, body,
                                           (v, w, lft, spk0), unroll=True)
    v_out_ref[:, :] = v
    w_out_ref[:, :] = w
    lft_out_ref[:, :] = lft
    spike_out_ref[:, :] = spk.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "n_steps", "emit"))
def fused_izhikevich_multistep(v, w, lft, wstencil, in_deg, a, b, c, d,
                               v_th, gap, tau_m, c_m, dt, clock, offsets,
                               n_steps, emit=()):
    """Run ``n_steps`` electrical Izhikevich steps in ONE kernel launch.
    Returns (v, w, last_firing_time, final-step spikes as f32[, v_pre])
    where v_pre is the (n_steps, rows, cols) pre-reset voltage sequence
    when ``emit`` is truthy (see _kernel_multi for why only v_pre)."""
    rows, cols = v.shape
    n_off = len(offsets)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_multi, tuple(offsets), n_off,
                               int(n_steps), bool(emit))
    out_shape = [jax.ShapeDtypeStruct((rows, cols), jnp.float32),
                 jax.ShapeDtypeStruct((rows, cols), jnp.float32),
                 jax.ShapeDtypeStruct((rows, cols), jnp.int32),
                 jax.ShapeDtypeStruct((rows, cols), jnp.float32)]
    if emit:
        out_shape += [jax.ShapeDtypeStruct((int(n_steps), rows, cols),
                                           jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[full] * 14,
            out_specs=[full] * len(out_shape)),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([clock], jnp.int32), v, w, lft, wstencil, in_deg, a, b, c,
      d, v_th, gap, tau_m, c_m, dt)


def lattice_multistep(model, state, graph, clock, n_steps, emit=()):
    """Advance ``n_steps`` steps with the multi-step VMEM-resident kernel
    (electrical Izhikevich + StencilGraph).  With ``emit``, also returns
    per-step 'v' / 'spike' planes for history readouts."""
    rows, cols = graph.shape

    def g(name):
        return state[name].reshape(rows, cols)

    out = fused_izhikevich_multistep(
        g("v"), g("w"), state["last_firing_time"].reshape(rows, cols),
        graph.weights, graph.in_deg, g("a"), g("b"), g("c"), g("d"),
        g("v_th"), g("gap_conductance"), g("tau_m"), g("c_m"), g("dt"),
        clock, offsets=graph.offsets, n_steps=n_steps, emit=tuple(emit))
    v, w, lft, spikes = out[:4]
    new_state = dict(state)
    new_state["v"] = v.reshape(-1)
    new_state["w"] = w.reshape(-1)
    new_state["last_firing_time"] = lft.reshape(-1)
    new_state["is_spiking"] = spikes.reshape(-1) > 0.0
    if not emit:
        return new_state
    # Reconstruct per-step spike and post-reset-v planes from the emitted
    # pre-reset voltages with the SAME ops the kernel applies (spikes =
    # v_pre >= v_th; v_post = where(spikes, c, v_pre)) — bit-exact, and
    # it keeps select-chain values out of the kernel's history stores
    # (the XLA:CPU compile blowup documented on _kernel_multi).
    v_pre = out[4]
    hists = {}
    spk_planes = None
    if "spike" in emit or "v" in emit:
        spk_planes = v_pre >= g("v_th")[None]
    if "v" in emit:
        hists["v"] = jnp.where(spk_planes, g("c")[None], v_pre)
    if "spike" in emit:
        hists["spike"] = spk_planes.astype(jnp.float32)
    return new_state, hists


def multistep_vmem_ok(graph, n_params=13, emit=0, n_steps=16):
    """Whether the whole lattice (weights + params + state) fits in VMEM.

    The x2 covers Mosaic's roll/select temporaries in the unrolled step
    loop — the same factor `multistep_tiled_config` applies (measured ~2.1x
    the naive plane estimate); without it mid-size lattices select this
    kernel and fail VMEM compile instead of falling back to tiled/XLA.
    ``emit`` (0 or 1): the v_pre history output adds n_steps whole planes
    (written once, no temporary factor)."""
    n_off = graph.weights.shape[0]
    n = graph.shape[0] * graph.shape[1]
    total = 4 * n * (n_off + n_params + 6) * 2
    total += 4 * n * n_steps * emit
    return total < 90 * 1024 * 1024


def step_kernel_ok(graph):
    """Whether the per-step kernel's (rows, L, 128) layout can represent
    this lattice: cols <= 128 (single lane group) or a multiple of 128.
    Other widths would need lane > 128, which miscompiles on Mosaic's
    dynamic row slice of unblocked refs (module docstring gotcha (a))."""
    cols = graph.shape[1]
    return cols <= 128 or cols % 128 == 0


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


# ---------------------------------------------------------------------------
# Temporal-blocked (tiled halo) multi-step kernel: lattices whose weight
# planes exceed VMEM (2048x2048 radius-2 = ~200 MB of planes).  Grid over
# row tiles; each program advances K steps on a tile padded by halo
# h = K * pad rows and discards the halo (overlap-and-discard temporal
# blocking) — weight/param HBM traffic is amortized K-fold while only
# 2h/tile_r of the compute is redundant.  Izhikevich params must be
# spatially uniform (checked host-side, `uniform_lattice_params`) so they
# ride the scalar-prefetch SMEM path instead of 9 more full planes.
# ---------------------------------------------------------------------------

PARAM_ORDER = ("a", "b", "c", "d", "v_th", "gap_conductance", "tau_m",
               "c_m", "dt")


@functools.partial(jax.jit, static_argnames=("keys",))
def _param_spans(state, keys):
    return [(jnp.min(state[k]), jnp.max(state[k])) for k in keys]


def uniform_lattice_params(state, keys=PARAM_ORDER):
    """Whether every model-parameter plane holds a single value (one
    batched reduction + one host fetch)."""
    spans = jax.device_get(_param_spans(state, tuple(keys)))
    return all(float(lo) == float(hi) for lo, hi in spans)


def _kernel_multi_tiled(offsets, n_off, n_steps, halo, tile_r,
                        clock_ref, par_ref,
                        v_ref, w_ref, lft_ref, wst_ref, ind_ref,
                        v_out_ref, w_out_ref, lft_out_ref, spike_out_ref):
    """K steps on one (rows_t = tile_r + 2*halo, C) padded row tile.

    Rolls wrap WITHIN the tile: wrapped garbage enters at the tile edges
    and creeps inward `pad` rows per step, staying inside the halo for all
    K steps; the core rows written out are exact.  Column wrap-around is
    killed by the zero global border weights as in `_kernel_multi`."""
    v = v_ref[0]
    w = w_ref[0]
    lft = lft_ref[0]
    wst = [wst_ref[0, o] for o in range(n_off)]
    wsum = sum(wst)
    cnt = jnp.maximum(ind_ref[0], 1.0)
    a, b, c, d, v_th, gap, tau_m, c_m, dt = [par_ref[i] for i in range(9)]
    dt_cm = dt / c_m
    dt_tau = dt / tau_m
    clock0 = clock_ref[0]

    def body(k, carry):
        v, w, lft, _ = carry
        acc = jnp.zeros_like(v)
        for o, (dr, dc) in enumerate(offsets):
            shifted = v
            if dr:
                shifted = jnp.roll(shifted, -dr, 0)
            if dc:
                shifted = jnp.roll(shifted, -dc, 1)
            acc = acc + wst[o] * shifted
        i_syn = gap * (acc - v * wsum) / cnt
        dv = (0.04 * v * v + 5.0 * v + 140.0 - w + i_syn) * dt_cm
        dw = (a * (b * v - w)) * dt_tau
        v_new = v + dv
        w_new = w + dw
        spikes = v_new >= v_th
        v_new = jnp.where(spikes, c, v_new)
        w_new = jnp.where(spikes, w_new + d, w_new)
        lft = jnp.where(spikes, clock0 + k, lft)
        return v_new, w_new, lft, spikes

    spk0 = jnp.zeros(v.shape, jnp.bool_)
    v, w, lft, spk = jax.lax.fori_loop(0, n_steps, body, (v, w, lft, spk0),
                                       unroll=True)
    v_out_ref[0] = v[halo:halo + tile_r, :]
    w_out_ref[0] = w[halo:halo + tile_r, :]
    lft_out_ref[0] = lft[halo:halo + tile_r, :]
    spike_out_ref[0] = spk[halo:halo + tile_r, :].astype(jnp.float32)


def _overlap_rows(x, tile_r, halo, axis=0):
    """(..., R, ...) -> stacked overlapping row windows (n_tiles, ...,
    rows_t, ...) along a new leading axis."""
    rows = x.shape[axis]
    n_tiles = rows // tile_r
    rows_t = tile_r + 2 * halo
    pads = [(0, 0)] * x.ndim
    pads[axis] = (halo, halo)
    xp = jnp.pad(x, pads)
    return jnp.stack([
        jax.lax.slice_in_dim(xp, i * tile_r, i * tile_r + rows_t, axis=axis)
        for i in range(n_tiles)])


@functools.partial(jax.jit, static_argnames=("tile_r", "halo"))
def tiled_overlap_weights(wstencil, in_deg, tile_r, halo):
    """Pre-overlapped weight/in-degree layouts — loop-invariant across
    launches, so computed ONCE per run before the launch scan."""
    return (_overlap_rows(wstencil, tile_r, halo, axis=1),
            _overlap_rows(in_deg, tile_r, halo, axis=0))


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n_steps", "tile_r", "halo"))
def fused_izhikevich_multistep_tiled(v, w, lft, wst_ov, ind_ov, params,
                                     clock, offsets, n_steps, tile_r, halo):
    """``n_steps`` steps with row-tile temporal blocking.

    ``params`` is the (9,) scalar vector in PARAM_ORDER; ``wst_ov`` /
    ``ind_ov`` come from `tiled_overlap_weights`.  Returns
    (v, w, last_firing_time, final-step spikes as f32)."""
    rows, cols = v.shape
    n_off = wst_ov.shape[1]
    n_tiles = rows // tile_r
    rows_t = tile_r + 2 * halo

    def overlap(x):
        return _overlap_rows(x, tile_r, halo)

    kernel = functools.partial(_kernel_multi_tiled, tuple(offsets), n_off,
                               int(n_steps), int(halo), int(tile_r))
    # index maps under PrefetchScalarGridSpec also receive the scalar
    # prefetch refs — accept and ignore them
    state_spec = pl.BlockSpec((1, rows_t, cols), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_r, cols), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, n_off, rows_t, cols),
                          lambda i, *_: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_new, w_new, lft_new, spikes = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[state_spec, state_spec, state_spec, w_spec,
                      state_spec],
            out_specs=[out_spec, out_spec, out_spec, out_spec]),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_r, cols), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_r, cols), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_r, cols), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, tile_r, cols), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([clock], jnp.int32), params,
      overlap(v), overlap(w), overlap(lft), wst_ov, ind_ov)
    back = (rows, cols)
    return (v_new.reshape(back), w_new.reshape(back),
            lft_new.reshape(back), spikes.reshape(back))


def lattice_multistep_tiled(model, state, graph, wst_ov, ind_ov, clock,
                            n_steps, tile_r, halo):
    """Advance ``n_steps`` with the temporal-blocked kernel (electrical
    Izhikevich + StencilGraph, uniform params, no histories).  ``wst_ov`` /
    ``ind_ov`` from `tiled_overlap_weights` (computed once per run)."""
    rows, cols = graph.shape
    params = jnp.stack([state[k].reshape(-1)[0] for k in PARAM_ORDER])
    v, w, lft, spikes = fused_izhikevich_multistep_tiled(
        state["v"].reshape(rows, cols), state["w"].reshape(rows, cols),
        state["last_firing_time"].reshape(rows, cols), wst_ov,
        ind_ov, params, clock, offsets=graph.offsets,
        n_steps=n_steps, tile_r=tile_r, halo=halo)
    state = dict(state)
    state["v"] = v.reshape(-1)
    state["w"] = w.reshape(-1)
    state["last_firing_time"] = lft.reshape(-1)
    state["is_spiking"] = spikes.reshape(-1) > 0.0
    return state


def multistep_tiled_config(graph):
    """(tile_r, halo, n_steps) for the temporal-blocked kernel, or None.

    Picks the largest K (steps per launch), then the largest row tile,
    whose per-program working set (weight + state + temporary planes)
    stays within ~60 MB of VMEM, requiring the redundant halo compute to
    stay under 25% of the tile.  Huge grids (4096x4096: each plane is
    64 MB) only fit with a smaller K — a 4x weight-traffic amortization
    still beats the XLA path's per-step reload."""
    rows, cols = graph.shape
    n_off = graph.weights.shape[0]
    pad = 0
    for dr, dc in graph.offsets:
        pad = max(pad, abs(dr))
    if pad == 0 or pad > 4 or cols < 128:
        return None
    for n_steps in (8, 4, 2):
        halo = -(-n_steps * pad // 8) * 8
        for tile_r in (512, 256, 128, 64):
            if rows % tile_r or 2 * halo > tile_r // 4:
                continue
            rows_t = tile_r + 2 * halo
            # the x2 covers Mosaic's roll/select temporaries in the
            # unrolled step loop (measured: tile_r=256 at 2048 cols
            # allocated 122 MB against the naive (n_off + 12)-plane
            # estimate of 57 MB)
            vmem = rows_t * cols * 4 * (n_off + 12) * 2
            if vmem < 95 * 1024 * 1024:
                return tile_r, halo, n_steps
    return None


def sharded_multistep_config(graph, mesh):
    """(K, g) for the SHARDED multi-step kernel, or None.

    Composes the VMEM-resident multi-step kernel with a row-block device
    mesh (VERDICT r04 task 3): each device runs the unchanged
    `fused_izhikevich_multistep` on its row block EXTENDED by ``g`` ghost
    rows per side, refreshed from its mesh neighbors by `lax.ppermute`
    once per K-step launch (overlap-and-discard at the shard level — the
    same temporal-blocking argument as `multistep_tiled_config`, with the
    tile boundary placed on the shard boundary).  Influence propagates at
    most ``halo`` rows/step, so ``g = halo * K`` ghost rows make the owned
    block BIT-EXACT vs the single-device kernel after K steps.  At the
    mesh edges the missing ghost slab is filled with the block's own
    boundary row (any FINITE fill is correct: boundary destinations carry
    zero weights from `StencilGraph.build`, but a `ppermute` zero-fill
    would zero ghost in_deg/c_m/dt and make the ghost-row update NaN,
    which 0-weight reads do NOT nullify — see the runner in
    core/lattice.py).

    Requirements: 1-D mesh, rows divisible by mesh size, ghost reach
    within ONE neighbor (g <= block), extended block + weight planes
    within the VMEM budget (same x2 temporary factor as
    `multistep_vmem_ok`)."""
    if len(mesh.axis_names) != 1 or mesh.size <= 1:
        return None
    rows, cols = graph.shape
    n_dev = mesh.size
    if rows % n_dev:
        return None
    block = rows // n_dev
    halo = 0
    for dr, dc in graph.offsets:
        halo = max(halo, abs(dr))
    if halo == 0:
        return None  # no cross-row coupling: GSPMD needs no halo anyway
    n_off = graph.weights.shape[0]
    for K in (16, 8, 4, 2, 1):
        g = -(-halo * K // 8) * 8  # sublane-aligned ghost depth
        if g > block:
            g = halo * K
        if g > block:
            continue
        n_ext = (block + 2 * g) * cols
        if 4 * n_ext * (n_off + 13 + 6) * 2 < 90 * 1024 * 1024:
            return K, g


# ---------------------------------------------------------------------------
# Generic-model multi-step kernel: the model's own `step()` traced into the
# kernel body.
#
# The reference DSL generates a GPU kernel for every model it compiles
# (nb_macro/src/lib.rs:469 `generate_gpu_kernel`); the TPU-native analog is
# that a NeuronModel's `step(s, i, skip_nt=True)` is pure elementwise jnp —
# including the DSL interpreter (dsl/builder.py run_statements/eval_expr) —
# so it traces straight into a Pallas body.  This kernel therefore covers
# EVERY elementwise model (the whole IF family, DSL-built neurons, peak-
# detection models), not just the hand-specialized Izhikevich above, and is
# bit-exact vs the SAME model's XLA path in interpret mode (the meaningful
# contract: a DSL Izhikevich is deliberately NOT bit-identical to the
# handwritten one — `(expr/c_m)*dt` vs `expr*(dt/c_m)` association, see
# tests/test_dsl.py:38 — so substituting the specialized kernel would
# silently change a DSL model's trajectory).
#
# Same VMEM-residency scheme as `fused_izhikevich_multistep`: grid=(1,),
# whole lattice + weights resident for n_steps per launch.  Unchanged
# fields (params) are read once outside the step loop; only fields the
# step actually writes (discovered by jaxpr forwarding analysis in
# `_model_kernel_fields`) ride the fori_loop carry.  No history emission:
# lattices with histories stay on the XLA path (per-step stores of
# select-chain values are the XLA:CPU compile blowup documented on
# `_kernel_multi`).
# ---------------------------------------------------------------------------

# models whose kernel compile failed at runtime (config_key set); checked
# by supports_model so one failure falls back to XLA permanently instead of
# retrying every chunk
_MODEL_KERNEL_BLOCKLIST = set()
# models whose kernel has EXECUTED successfully at least once: a later
# failure for these is a runtime error (donated buffers may be invalid,
# retrying with the same state is unsafe) and must propagate, not
# blocklist (core.lattice._run_chunk)
_MODEL_KERNEL_RAN = set()


@functools.lru_cache(maxsize=None)
def _model_kernel_fields(model):
    """((field, dtype), ...) the kernel ships + the subset `step` writes.

    Returns (fields, carry_keys) or None when the step cannot be traced
    over plane-shaped field dicts.  carry_keys is found by tracing one
    step and checking which outputs are forwarded invars in the jaxpr —
    forwarded fields are loop constants the kernel reads once."""
    fields = tuple((k, jnp.float32) for k in model.FIELDS) \
        + tuple((k, jnp.bool_) for k in model.BOOL_FIELDS) \
        + tuple((k, jnp.int32) for k in model.INT_FIELDS) \
        + (("is_spiking", jnp.bool_),)

    def f(s, i):
        s2, _ = model.step(dict(s), i, skip_nt=True)
        return tuple(s2[k] for k, _ in fields)

    try:
        dummy = {k: jax.ShapeDtypeStruct((2, 2), dt) for k, dt in fields}
        jaxpr = jax.make_jaxpr(f)(
            dummy, jax.ShapeDtypeStruct((2, 2), jnp.float32)).jaxpr
    except Exception:
        return None
    # a field is loop-constant ONLY if its output forwards its OWN invar
    # (positional: dict args flatten in sorted-key order, then the input
    # current).  Testing membership against ALL invars misclassifies a
    # cross-field copy (s2["x"] = s["y"]) as constant: "x" would be read
    # once before the loop and frozen while the XLA path updates it.
    invar_by_name = dict(zip(sorted(k for k, _ in fields), jaxpr.invars))
    carry = tuple(k for (k, _), ov in zip(fields, jaxpr.outvars)
                  if ov is not invar_by_name[k])
    if "is_spiking" not in carry:
        # degenerate spike detection (constant-folded) — keep the generic
        # runner's spike/lft bookkeeping well-defined by carrying it anyway
        carry = carry + ("is_spiking",)
    return fields, carry


def supports_model(model, graph, electrical, chemical, do_plasticity):
    """Whether the generic traced-step multi-step kernel applies."""
    from ..models.base import NeuronModel
    from .graph import StencilGraph
    if not (isinstance(model, NeuronModel)
            and getattr(model, "ELEMENTWISE_STEP", False)
            and isinstance(graph, StencilGraph)
            and electrical and not chemical and not do_plasticity):
        return False
    if not {"v", "dt", "gap_conductance"} <= set(model.FIELDS):
        return False
    try:
        if model.config_key() in _MODEL_KERNEL_BLOCKLIST:
            return False
    except Exception:
        return False
    return _model_kernel_fields(model) is not None


def block_model_kernel(model):
    """Permanently route this model config to the XLA path (called after a
    runtime Mosaic compile failure of the generic kernel)."""
    _MODEL_KERNEL_BLOCKLIST.add(model.config_key())


def model_multistep_vmem_ok(graph, model, n_steps=16):
    """VMEM feasibility for the generic kernel: weights + one plane per
    field + carry temporaries, x2 for Mosaic roll/select temporaries (the
    same measured factor `multistep_vmem_ok` applies)."""
    fk = _model_kernel_fields(model)
    if fk is None:
        return False
    fields, carry = fk
    n_off = graph.weights.shape[0]
    n = graph.shape[0] * graph.shape[1]
    total = 4 * n * (n_off + len(fields) + len(carry) + 6) * 2
    return total < 90 * 1024 * 1024


def _kernel_multi_model(model, fields, carry_keys, offsets, n_off, n_steps,
                        clock_ref, lft_ref, wst_ref, ind_ref, *refs):
    """n_steps of `model.step` with the whole lattice VMEM-resident.

    Bool planes ship as f32 0/1 (bool stores are avoided like the
    specialized kernels do) and convert exactly at the boundary; the
    electrical input uses the identical accumulation order as
    `_kernel_multi` (offset-order chained FMAs, wsum = sum of planes),
    which the multistep tests prove bit-exact vs
    StencilGraph.gather_electrical."""
    dtypes = dict(fields)
    in_refs = refs[:len(fields)]
    out_refs = refs[len(fields):]
    env0 = {}
    for (k, dt), r in zip(fields, in_refs):
        val = r[:, :]
        env0[k] = (val > 0.5) if dt == jnp.bool_ else val
    wst = [wst_ref[o, :, :] for o in range(n_off)]
    wsum = sum(wst)
    cnt = jnp.maximum(ind_ref[:, :], 1.0)
    clock0 = clock_ref[0]

    def body(k, carry):
        env = dict(env0)
        env.update(zip(carry_keys, carry[:-1]))
        lft = carry[-1]
        v = env["v"]
        acc = jnp.zeros_like(v)
        for o, (dr, dc) in enumerate(offsets):
            shifted = v
            if dr:
                shifted = jnp.roll(shifted, -dr, 0)
            if dc:
                shifted = jnp.roll(shifted, -dc, 1)
            acc = acc + wst[o] * shifted
        i_syn = env["gap_conductance"] * (acc - v * wsum) / cnt
        s2, spikes = model.step(env, i_syn, skip_nt=True)
        lft = jnp.where(spikes, clock0 + k, lft)
        return tuple(s2[k] for k in carry_keys) + (lft,)

    carry0 = tuple(env0[k] for k in carry_keys) + (lft_ref[:, :],)
    carry = jax.lax.fori_loop(0, n_steps, body, carry0, unroll=True)
    for r, k, val in zip(out_refs, carry_keys, carry[:-1]):
        r[:, :] = val.astype(jnp.float32) if dtypes[k] == jnp.bool_ else val
    out_refs[len(carry_keys)][:, :] = carry[-1]


@functools.partial(jax.jit, static_argnames=("model", "offsets", "n_steps"))
def fused_model_multistep(lft, wstencil, in_deg, field_vals, clock,
                          model=None, offsets=(), n_steps=1):
    """Run ``n_steps`` of ``model.step`` in ONE kernel launch.

    ``field_vals`` is a tuple of (rows, cols) planes in
    `_model_kernel_fields` order (bool fields already encoded f32).
    Returns (per-carry-field planes..., last_firing_time)."""
    rows, cols = lft.shape
    fields, carry_keys = _model_kernel_fields(model)
    dtypes = dict(fields)
    n_off = len(offsets)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_multi_model, model, fields,
                               carry_keys, tuple(offsets), n_off,
                               int(n_steps))
    out_shape = [jax.ShapeDtypeStruct(
        (rows, cols),
        jnp.float32 if dtypes[k] == jnp.bool_ else dtypes[k])
        for k in carry_keys]
    out_shape += [jax.ShapeDtypeStruct((rows, cols), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[full] * (3 + len(fields)),
            out_specs=[full] * len(out_shape)),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([clock], jnp.int32), lft, wstencil, in_deg, *field_vals)


def lattice_multistep_model(model, state, graph, clock, n_steps):
    """Advance ``n_steps`` steps of any elementwise model with the generic
    multi-step kernel (mirrors `lattice_multistep` for Izhikevich).
    Semantics match core.lattice.lattice_step with skip_nt=True: electrical
    stencil gather -> model.step -> last_firing_time update."""
    rows, cols = graph.shape
    fields, carry_keys = _model_kernel_fields(model)
    dtypes = dict(fields)
    vals = []
    for k, dt in fields:
        arr = state[k].reshape(rows, cols)
        vals.append(arr.astype(jnp.float32) if dt == jnp.bool_ else arr)
    out = fused_model_multistep(
        state["last_firing_time"].reshape(rows, cols), graph.weights,
        graph.in_deg, tuple(vals), clock, model=model,
        offsets=graph.offsets, n_steps=n_steps)
    new_state = dict(state)
    for k, val in zip(carry_keys, out[:-1]):
        flat = val.reshape(-1)
        new_state[k] = flat > 0.0 if dtypes[k] == jnp.bool_ else flat
    new_state["last_firing_time"] = out[-1].reshape(-1)
    return new_state
