"""Pallas TPU kernel: fused multi-step Hodgkin-Huxley chemical lattice.

The BASELINE "HH with ion channels + receptor kinetics" config
(hodgkin_huxley/mod.rs:49-242 stepped by neuron/mod.rs:884-982) as ONE
VMEM-resident kernel advancing K steps per launch: the electrical stencil
gather, the per-type chemical neurotransmitter gather, receptor kinetics +
ligand-gated currents (iterate_and_spike/mod.rs:1068-1313), the Na/K/K-leak
gating-variable updates (ion_channels/mod.rs:192-317), the voltage Euler
step, neurotransmitter release, peak-detection spiking, and deferred STDP
(plasticity/mod.rs:16-70) all execute in one pass per step with zero HBM
round trips between them.

Measured context: the XLA path runs the 128x128 HH+STDP lattice at
~46 us/step — a serialized chain of small fusions whose dispatch quanta
dominate at 16k neurons (same kernel-count floor as the reward network,
see CLAUDE.md).  All state + params for this config is ~90 planes = ~6 MB
at 128x128, so the whole lattice stays VMEM-resident for K steps.

Layout notes (same Mosaic constraints as ops/pallas_stencil.py):
* whole-lattice blocks, grid=(1,): shifts are `jnp.roll` on VALUES with
  wrap-around killed by the zero border weights / edge masks;
* (N, K=3) type-axis arrays are laid out (3, rows, cols) so the lane dim
  stays the column axis;
* scalars (clock, STDP rule params) ride SMEM via scalar prefetch.

Supported configuration (`supports`): HodgkinHuxley model with
IonotropicReceptors, destexhe/approximate NT + receptor kinetics,
StencilGraph, chemical synapses (electrical optional), STDP or no
plasticity, no histories.  Poisson-free (single lattice).  Anything else
falls back to the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import _compiler_params

# per-neuron f32 params, stacked into one (10, R, C) input ref
PARAM_ORDER = ("dt", "c_m", "v_th", "gap_conductance",
               "na$g", "na$e", "k$g", "k$e", "kleak$g", "kleak$e")

# STDP rule params, SMEM vector order
STDP_KEYS = ("a_plus", "a_minus", "tau_plus", "tau_minus", "dt")

NEVER = -1


def _nt_param_keys(nt_kind):
    if nt_kind == "destexhe":
        return ("nt$t_max", "nt$v_p", "nt$k_p")
    return ("nt$t_max", "nt$clearance_constant")   # approximate / bounded


def _rec_param_keys(rec_kind):
    # gating-kinetics params first, then the Ionotropic current params
    if rec_kind == "destexhe":
        return ("rec$alpha", "rec$beta", "rec$g", "rec$e", "rec$mg")
    return ("rec$g", "rec$e", "rec$mg")            # approximate


def _roll2(x, dr, dc):
    """out[r, c] = x[r + dr, c + dc] with wrap (killed by zero border
    weights), on the LAST two axes."""
    if dr:
        x = jnp.roll(x, -dr, axis=-2)
    if dc:
        x = jnp.roll(x, -dc, axis=-1)
    return x


def _kernel(offsets, n_off, n_steps, electrical, plastic, nt_kind, rec_kind,
            # scalar prefetch
            clock_ref, stdp_ref,
            # inputs
            v_ref, m_ref, h_ref, n_ref, wasinc_ref, spk_ref, lft_ref,
            ntt_ref, recr_ref, par_ref, ntp_ref, ntm_ref, recp_ref,
            recm_ref, wst_ref, emask_ref, ind_ref,
            # outputs
            v_out, m_out, h_out, n_out, wasinc_out, spk_out, lft_out,
            ntt_out, recr_out, reccur_out, chcur_out, wst_out):
    """K fused HH steps; semantics mirror core/lattice.lattice_step with
    models/hodgkin_huxley.HodgkinHuxley.step, statement for statement."""
    v = v_ref[:, :]
    m = m_ref[:, :]
    h = h_ref[:, :]
    n = n_ref[:, :]
    wasinc = wasinc_ref[:, :] > 0.0
    spk = spk_ref[:, :] > 0.0
    lft = lft_ref[:, :]
    ntt = ntt_ref[:, :, :]          # (3, R, C)
    recr = recr_ref[:, :, :]        # (3, R, C)

    dt, c_m, v_th, gap, na_g, na_e, k_g, k_e, kl_g, kl_e = [
        par_ref[i] for i in range(10)]
    ntm = ntm_ref[:, :, :]          # (3, R, C) f32 presence mask
    recm = recm_ref[:, :, :]        # (3, R, C) f32 receptor mask
    wst = [wst_ref[o] for o in range(n_off)]
    em = [emask_ref[o] for o in range(n_off)]
    cnt = jnp.maximum(ind_ref[:, :], 1.0)
    clock0 = clock_ref[0]

    n_nt = 3 if nt_kind == "destexhe" else 2
    ntp = [ntp_ref[i] for i in range(n_nt * 3)]     # kind-keyed (3,R,C) each
    n_rp = len(_rec_param_keys(rec_kind))
    recp = [recp_ref[i] for i in range(n_rp * 3)]

    if plastic:
        a_plus, a_minus, tau_plus, tau_minus, p_dt = [
            stdp_ref[1 + i] for i in range(5)]

    # NOTE on scheduling (A/B measured on v5e at 128x128): keeping ALL
    # per-step computation inside the body with chained per-offset FMAs
    # measured fastest (25.3k steps/s).  Two tempting rewrites REGRESS:
    # (a) stacking shifted planes + tree-reducing (21.7k) — the stacked
    # intermediates spill to VMEM where chained FMAs stay in vregs;
    # (b) hoisting the loop-invariant chemical in-degree / param stacks
    # out of the body (22.1k) — the hoisted planes stay live across the
    # 16x-unrolled body and raise register pressure.

    def body(k, carry):
        v, m, h, n, wasinc, spk, lft, ntt, recr, wst_c, _, _ = carry
        wst_l = [wst_c[o] for o in range(n_off)]

        # ---- Phase A: electrical gather (graph.gather_electrical) ----
        if electrical:
            acc = jnp.zeros_like(v)
            for o, (dr, dc) in enumerate(offsets):
                acc = acc + wst_l[o] * _roll2(v, dr, dc)
            i_elec = gap * (acc - v * sum(wst_l)) / cnt
        else:
            i_elec = jnp.zeros_like(v)

        # ---- chemical gather (StencilGraph.gather_chemical) ----
        sums = jnp.zeros_like(ntt)
        cnts = jnp.zeros_like(ntt)
        tm = ntt * ntm              # masked concentrations
        for o, (dr, dc) in enumerate(offsets):
            sums = sums + wst_l[o][None] * _roll2(tm, dr, dc)
            cnts = cnts + em[o][None] * _roll2(ntm, dr, dc)
        t_in = sums / jnp.maximum(cnts, 1.0)
        t_valid = cnts > 0.0

        # ---- receptor kinetics (kinetics.update_receptor_kinetics) ----
        if rec_kind == "destexhe":
            alpha = jnp.stack(recp[0:3])
            beta = jnp.stack(recp[3:6])
            new_r = recr + (alpha * t_in * (1.0 - recr)
                            - beta * recr) * dt[None]
        else:                       # approximate: r = t
            new_r = t_in
        recr = jnp.where(jnp.logical_and(t_valid, recm > 0.0), new_r, recr)

        # ---- Ionotropic currents at the PRE-update voltage ----
        off = 0 if rec_kind != "destexhe" else 6
        g = jnp.stack(recp[off:off + 3])
        e = jnp.stack(recp[off + 3:off + 6])
        mg_nmda = recp[off + 7]     # mg plane for the NMDA slot (index 1)
        base = g * recr * (v[None] - e)
        block = 1.0 / (1.0 + jnp.exp(-0.062 * v) * mg_nmda / 3.75)
        cur = jnp.stack([base[0], base[1] * block, base[2]])
        reccur = jnp.where(recm > 0.0, cur, 0.0)
        i_ligand = jnp.sum(reccur, axis=0) * (dt / c_m)

        # ---- gate updates from the old voltage (update_gates) ----
        m_alpha = 0.1 * ((v + 40.0) / (1.0 - jnp.exp(-(v + 40.0) / 10.0)))
        m_beta = 4.0 * jnp.exp(-(v + 65.0) / 18.0)
        h_alpha = 0.07 * jnp.exp(-(v + 65.0) / 20.0)
        h_beta = 1.0 / (jnp.exp(-(v + 35.0) / 10.0) + 1.0)
        m = m + dt * (m_alpha * (1.0 - m) - m_beta * m)
        h = h + dt * (h_alpha * (1.0 - h) - h_beta * h)
        n_alpha = 0.01 * (v + 55.0) / (1.0 - jnp.exp(-(v + 55.0) / 10.0))
        n_beta = 0.125 * jnp.exp(-(v + 65.0) / 80.0)
        n = n + dt * (n_alpha * (1.0 - n) - n_beta * n)
        i_na = m ** 3 * h * na_g * (v - na_e)
        i_k = n ** 4 * k_g * (v - k_e)
        i_kl = kl_g * (v - kl_e)
        chcur = jnp.stack([i_na, i_k, i_kl])

        # ---- voltage update (update_cell_voltage) ----
        last_v = v
        v = v + dt * (i_elec - (i_na + i_k + i_kl)) / c_m - i_ligand

        # ---- NT release: new voltage, PREVIOUS spike flag ----
        t_max = jnp.stack(ntp[0:3])
        if nt_kind == "destexhe":
            v_p = jnp.stack(ntp[3:6])
            k_p = jnp.stack(ntp[6:9])
            new_t = t_max / (1.0 + jnp.exp(-(v[None] - v_p) / k_p))
        else:                       # approximate
            clearance = jnp.stack(ntp[3:6])
            spike_f = spk.astype(jnp.float32)[None]
            new_t = ntt + dt[None] * -clearance * ntt + spike_f * t_max
            new_t = jnp.clip(new_t, 0.0, t_max)
        ntt = jnp.where(ntm > 0.0, new_t, 0.0)

        # ---- peak-detection spiking (_handle_peak_detection) ----
        inc_now = last_v < v
        spk = (v > v_th) & wasinc & jnp.logical_not(inc_now)
        wasinc = inc_now
        lft = jnp.where(spk, clock0 + k, lft)

        # ---- deferred STDP on the stencil planes (STDP.apply); chained
        #      per-offset form for the same in-kernel reason as above ----
        if plastic:
            spk_f = spk.astype(jnp.float32)
            post_has = lft != NEVER
            new_w = []
            for o, (dr, dc) in enumerate(offsets):
                pre_lft = _roll2(lft, dr, dc)
                pre_spk = _roll2(spk_f, dr, dc)
                both = jnp.logical_and(pre_lft != NEVER, post_has)
                diff = jnp.abs((pre_lft - lft).astype(jnp.float32)) * p_dt
                # one exp of the selected argument (bitwise identical)
                pre_first = pre_lft < lft
                e = jnp.exp(jnp.where(pre_first, -diff / tau_plus,
                                      -diff / tau_minus))
                dw = jnp.where(pre_first, a_plus * e,
                               jnp.where(pre_lft > lft, -a_minus * e, 0.0))
                dw = jnp.where(both, dw, 0.0) * (pre_spk + spk_f)
                new_w.append(jnp.where(em[o] > 0.0,
                                       wst_l[o] + dw, wst_l[o]))
            wst_c = jnp.stack(new_w)

        return (v, m, h, n, wasinc, spk, lft, ntt, recr, wst_c,
                reccur, chcur)

    zero3 = jnp.zeros_like(ntt)
    wst0 = jnp.stack(wst)
    carry = (v, m, h, n, wasinc, spk, lft, ntt, recr, wst0, zero3,
             jnp.zeros_like(ntt))
    # unroll for Mosaic (kernel-internal loop overhead); keep the rolled
    # form under CPU interpret where the 16x-unrolled body only bloats the
    # XLA:CPU compile (values are identical either way)
    (v, m, h, n, wasinc, spk, lft, ntt, recr, wst_c, reccur, chcur) = \
        jax.lax.fori_loop(0, n_steps, body, carry,
                          unroll=jax.default_backend() != "cpu")

    v_out[:, :] = v
    m_out[:, :] = m
    h_out[:, :] = h
    n_out[:, :] = n
    wasinc_out[:, :] = wasinc.astype(jnp.float32)
    spk_out[:, :] = spk.astype(jnp.float32)
    lft_out[:, :] = lft
    ntt_out[:, :, :] = ntt
    recr_out[:, :, :] = recr
    reccur_out[:, :, :] = reccur
    chcur_out[:, :, :] = chcur
    wst_out[:, :, :] = wst_c


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_steps", "electrical", "plastic",
                              "nt_kind", "rec_kind"))
def fused_hh_multistep(v, m, h, n, wasinc, spk, lft, ntt, recr, params,
                       ntp, ntm, recp, recm, wst, emask, in_deg, clock,
                       stdp_vec, offsets, n_steps, electrical, plastic,
                       nt_kind, rec_kind):
    """Run ``n_steps`` fused HH chemical steps in one kernel launch."""
    rows, cols = v.shape
    n_off = len(offsets)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, tuple(offsets), n_off, int(n_steps),
                               bool(electrical), bool(plastic), nt_kind,
                               rec_kind)
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((rows, cols), f32),            # v
        jax.ShapeDtypeStruct((rows, cols), f32),            # m
        jax.ShapeDtypeStruct((rows, cols), f32),            # h
        jax.ShapeDtypeStruct((rows, cols), f32),            # n
        jax.ShapeDtypeStruct((rows, cols), f32),            # was_increasing
        jax.ShapeDtypeStruct((rows, cols), f32),            # is_spiking
        jax.ShapeDtypeStruct((rows, cols), jnp.int32),      # lft
        jax.ShapeDtypeStruct((3, rows, cols), f32),         # nt$t
        jax.ShapeDtypeStruct((3, rows, cols), f32),         # rec$r
        jax.ShapeDtypeStruct((3, rows, cols), f32),         # rec$current
        jax.ShapeDtypeStruct((3, rows, cols), f32),         # na/k/kleak cur
        jax.ShapeDtypeStruct(wst.shape, f32),               # weights
    ]
    scalars = jnp.concatenate([jnp.asarray([clock], f32), stdp_vec])
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[full] * 17,
            out_specs=[full] * len(out_shape)),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([clock], jnp.int32), scalars,
      v, m, h, n, wasinc, spk, lft, ntt, recr, params, ntp, ntm, recp,
      recm, wst, emask, in_deg)


def _stack_tk(state, keys, rows, cols):
    """Stack (N, 3) state fields as one (len(keys)*3, rows, cols) array."""
    return jnp.concatenate(
        [jnp.moveaxis(state[k].reshape(rows, cols, 3), -1, 0)
         for k in keys], axis=0)


def lattice_multistep(model, state, graph, clock, n_steps, electrical,
                      plastic, stdp_params):
    """Advance ``n_steps`` with the fused HH kernel; returns (state, graph).
    Caller must have checked `supports`."""
    rows, cols = graph.shape
    nt_kind = model.nt_kinetics
    rec_kind = model.rec_kinetics

    def g(name):
        return state[name].reshape(rows, cols)

    def g3(name):
        return jnp.moveaxis(state[name].reshape(rows, cols, 3), -1, 0)

    params = jnp.stack([g(k) for k in PARAM_ORDER])
    ntp = _stack_tk(state, _nt_param_keys(nt_kind), rows, cols)
    recp = _stack_tk(state, _rec_param_keys(rec_kind), rows, cols)
    stdp_vec = jnp.stack(
        [jnp.float32(stdp_params.get(k, 0.0)) for k in STDP_KEYS]) \
        if stdp_params is not None else jnp.zeros(5, jnp.float32)

    (v, m, h, n, wasinc, spk, lft, ntt, recr, reccur, chcur,
     wst) = fused_hh_multistep(
        g("v"), g("na$m_state"), g("na$h_state"), g("k$n_state"),
        g("was_increasing").astype(jnp.float32),
        g("is_spiking").astype(jnp.float32), g("last_firing_time"),
        g3("nt$t"), g3("rec$r"), params, ntp,
        g3("nt$mask").astype(jnp.float32), recp,
        g3("rec$mask").astype(jnp.float32),
        graph.weights, graph.mask.astype(jnp.float32), graph.in_deg,
        clock, stdp_vec, offsets=graph.offsets, n_steps=n_steps,
        electrical=electrical, plastic=plastic, nt_kind=nt_kind,
        rec_kind=rec_kind)

    def back3(x):
        return jnp.moveaxis(x, 0, -1).reshape(-1, 3)

    state = dict(state)
    state["v"] = v.reshape(-1)
    state["na$m_state"] = m.reshape(-1)
    state["na$h_state"] = h.reshape(-1)
    state["k$n_state"] = n.reshape(-1)
    state["was_increasing"] = wasinc.reshape(-1) > 0.0
    state["is_spiking"] = spk.reshape(-1) > 0.0
    state["last_firing_time"] = lft.reshape(-1)
    state["nt$t"] = back3(ntt)
    state["rec$r"] = back3(recr)
    state["rec$current"] = back3(reccur)
    state["na$current"] = chcur[0].reshape(-1)
    state["k$current"] = chcur[1].reshape(-1)
    state["kleak$current"] = chcur[2].reshape(-1)
    if plastic:
        graph = graph.replace_weights(wst)
    return state, graph


def vmem_ok(graph):
    """Whole-lattice VMEM residency check: ~90 planes of state/params plus
    the 2x Mosaic roll/select temporary factor (see pallas_stencil).
    K only affects loop temporaries already covered by the 2x factor, not
    the resident plane count."""
    n_off = graph.weights.shape[0]
    n = graph.shape[0] * graph.shape[1]
    planes = 2 * n_off + 55 + 24     # weights+mask, scalar planes, (K,3)s
    return 4 * n * planes * 2 < 90 * 1024 * 1024


def supports(model, graph, chemical, do_plasticity, plasticity):
    """Fused HH fast-path predicate (mirrors pallas_stencil.supports).
    The electrical flag is NOT gated — both electrical settings are
    compiled into the kernel."""
    from ..models.hodgkin_huxley import HodgkinHuxley
    from ..core.plasticity import STDP
    from .receptors import IonotropicReceptors
    from .graph import StencilGraph
    if type(model) is not HodgkinHuxley:
        return False
    if type(model.receptors) is not IonotropicReceptors:
        return False
    if model.nt_kinetics not in ("destexhe", "approximate"):
        return False
    if model.rec_kinetics not in ("destexhe", "approximate"):
        return False
    # the receptor-kinetics params are read from the model's rec_kinetics
    # tables; the receptors object must share the kind
    if model.receptors.kinetics != model.rec_kinetics:
        return False
    if not (chemical and isinstance(graph, StencilGraph)):
        return False
    if do_plasticity and type(plasticity) is not STDP:
        return False
    return vmem_ok(graph)
