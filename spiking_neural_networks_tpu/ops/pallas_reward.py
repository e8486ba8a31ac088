"""Fused multi-step Pallas kernel for SMALL reward-modulated networks.

The 32x32 reward network (the size class the reference's science pipelines
actually run at — `interface_gpu/experiments/bayesian_inference_pipeline.py`)
is kernel-COUNT bound on TPU, not FLOP or bandwidth bound: xprof shows one
compiled XLA step is ~45 serialized tiny fusions at 0.3-4.4us each (~76us of
device time for ~1us of arithmetic).  This module collapses the ENTIRE
network step — spike-train sources, electrical phase A, the Izhikevich
phase B, STDP, the R-STDP double visit, reward-connection visits, and the
dopamine decay — into ONE Pallas kernel that runs K steps per launch with
every plane resident in VMEM.

Semantics replicated exactly (same ordering as `core/reward_structured.py`,
which mirrors `/root/reference/backend/src/neuron/mod.rs:5030-5290`):

1. spike-train refractoriness effects from the PREVIOUS step's firing times
   (trains step last, mod.rs:2445);
2. phase A: per-lattice electrical input with cross-component in-degree
   averaging (mod.rs:2115-2212);
3. dopamine decays with the reward before the visits
   (plasticity/mod.rs:204-206);
4. phase B: Izhikevich Euler update + spike handling, deferred
   last-firing-time;
5. STDP on plastic intra graphs and plain connections, gated per spiking
   plastic endpoint (mod.rs:4868-4947);
6. the R-STDP double visit on modulated intra graphs and gated visits on
   reward connections (plasticity/mod.rs:199-242, mod.rs:4742-4762);
7. spike trains step with the pre-increment clock.

Supported configuration (`network_runner` / `plain_network_runner` /
`supports_lattice`): Izhikevich/ALIF/LIF lattices on StencilGraphs (mixed
grid shapes allowed for plain networks), electrical synapses only, no
neurotransmitters, Poisson/Rate spike trains, one-to-one and resample
(pooling/upsampling, `core/structured.ResampleBlock` — lowered as
HIGHEST-precision selection-matrix sandwiches, since strided slices do
not lower in Mosaic) connections, STDP plasticity + RewardModulatedSTDP
modulation.  Plain-network lattice grid histories (grid/average/eeg/
spikes) ride along as per-step PRE-RESET voltage planes emitted by the
kernel and are reconstructed outside it.  Anything else falls back to
the XLA structured runner.

Poisson randomness: the XLA path threads a `jax.random` key through the
scan (one split per step).  Each K-step kernel launch instead reads a
(chunk * R, C) uniforms buffer drawn per chunk inside the launch scan
(`fold_in(train_key, chunk_index)`) — a different (equally valid) stream
with O(chunk) not O(run length) footprint, so Poisson-driven runs agree
with the XLA path statistically, not bitwise (the reference makes the same
choice for its GPU xorshift RNG vs thread_rng, spike_train/mod.rs:380-388).
Rate/Preset-driven and trainless configs are deterministic and match the
XLA path to float tolerance.

Mosaic notes: planes stay (R, C) (lane dim <= 128 at these sizes); shifts
are `jnp.roll` with wrap-around killed by the zero border weights; the
per-step uniforms are a dynamic ROW slice (k * R) of a (chunk * R, C)
ref (dynamic leading-dim slices are safe at <= 128 lanes); scalars
(clock, dopamine, rewards, rule parameters) live in SMEM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import NEVER
from .pallas_stencil import _compiler_params

LAT_PARAM_KEYS = ("a", "b", "c", "d", "v_th", "gap_conductance",
                  "tau_m", "c_m", "dt")
# per-model parameter planes (state keys, models/integrate_and_fire.py)
MODEL_PARAM_KEYS = {
    "izhikevich": LAT_PARAM_KEYS,
    "alif": ("v_th", "v_reset", "tref", "alpha", "beta", "leak_constant",
             "integration_constant", "gap_conductance", "e_l", "g_l",
             "tau_m", "c_m", "dt"),
    "lif": ("v_th", "v_reset", "tref", "leak_constant",
            "integration_constant", "gap_conductance", "e_l", "g_l",
            "tau_m", "dt"),
}
# models whose spike handler carries a refractory_count plane
REFRACTORY_MODELS = ("alif", "lif")
# models whose state carries an adaptation variable "w" (LIF does not;
# the kernel's internal w slot is a dummy zero plane there and must not
# leak into env-callback views)
W_MODELS = ("izhikevich", "alif")
PP_KEYS = ("a_plus", "a_minus", "tau_plus", "tau_minus", "dt")
RP_KEYS = ("a_plus", "a_minus", "tau_plus", "tau_minus", "dt",
           "tau_c", "tau_d")

# steps fused per kernel launch (amortizes the launch + chunk-slice kernels)
DEFAULT_CHUNK = 16
VMEM_BUDGET = 80 * 1024 * 1024


class LatSpec(NamedTuple):
    kind: str                  # 'plain' | 'plastic' | 'mod'
    offsets: tuple             # stencil offsets ((dr, dc), ...)
    model: str = "izhikevich"  # MODEL_PARAM_KEYS key
    shape: tuple = ()          # (R, C)
    emit: bool = False         # emit per-step PRE-RESET voltage planes
                               # (histories; izhikevich only)


class TrainSpec(NamedTuple):
    kind: str                  # 'poisson' | 'rate'
    refractoriness: str        # 'delta_dirac' | 'exponential_decay'
    shape: tuple = ()          # (R, C)


class ConnSpec(NamedTuple):
    pre_is_st: bool
    pre: int                   # index into lattices (or trains if pre_is_st)
    post: int                  # index into lattices
    reward: bool
    static: int                # static visit count (modulated endpoints)
    pre_plastic: bool
    post_plastic: bool
    updates: bool              # False: weights are read-only
    op: tuple = ("one2one",)   # ("one2one",) — elementwise, same shapes —
                               # or ("resample", R1, C1, R2, C2, fr, fc,
                               # taps): strided/up-sampled tap planes
                               # (core/structured.ResampleBlock.static)


class NetSpec(NamedTuple):
    lattices: tuple            # LatSpec, ...
    trains: tuple              # TrainSpec, ...
    conns: tuple               # ConnSpec, ...
    with_reward: bool


class EnvSpec(NamedTuple):
    """In-kernel closed-loop environment (interactable.JitEnvironment).

    The reference's `Environment::run_with_reward` loop
    (interactable/mod.rs:33-46) fused INTO the multi-step kernel: the env
    state is a pytree of f32 scalars carried through the step loop, and the
    three callbacks are traced into the kernel body against a restricted
    (R, C)-shaped view of the lattice state (keys ``v``, ``w``,
    ``last_firing_time``, ``is_spiking``, ``refractory_count``).  The
    chunk=1 launch-per-step form pays ~14 us of launch+carry cost per env
    step (measured r4); fusing K=16 env steps per launch amortizes it.

    Callbacks must be pure jnp and shape-polymorphic (the XLA path calls
    them on flat (N,) fields; `interactable._grid_callbacks_ok` verifies
    flat/(R, C) numeric agreement before this path engages).
    """
    reward_fn: object          # (env, sview) -> f32 scalar
    update_fn: object          # (env, sview) -> env
    encode_fn: object          # (env, sview) -> sview (v/w/refr writes)
    treedef: object            # env pytree structure (f32 scalar leaves)
    n_leaves: int


def _shift(x, dr, dc):
    """out[r, c] = x[r + dr, c + dc]; wrap-around is killed by zero border
    weights / the edge masks (StencilGraph.build masks off-grid slots)."""
    if dr:
        x = jnp.roll(x, -dr, 0)
    if dc:
        x = jnp.roll(x, -dc, 1)
    return x


def _sel_matrices(op):
    """Host-side selection matrices for a resample op.

    ``S_r[i, r, s] = 1`` iff ``s == f(r) + dr_i`` is in bounds, where f is
    ``r * fr`` (pooling) or ``r // -fr`` (upsampling) — the matmul form of
    `core/structured._resample_planes` (strided slices do not lower in
    Mosaic; probed bit-exact with HIGHEST precision, commit 6ec4897).
    Out-of-bounds taps produce zero rows, matching the zero padding of the
    XLA path; the per-tap edge masks gate them out of every update.
    Returns (S_r (n_dr, R2, R1), S_c (n_dc, C2, C1), dr order, dc order).
    """
    _, R1, C1, R2, C2, fr, fc, taps = op
    drs = sorted({int(dr) for dr, _ in taps})
    dcs = sorted({int(dc) for _, dc in taps})
    S_r = np.zeros((len(drs), R2, R1), np.float32)
    for i, dr in enumerate(drs):
        for r in range(R2):
            s = (r * fr if fr > 0 else r // -fr) + dr
            if 0 <= s < R1:
                S_r[i, r, s] = 1.0
    S_c = np.zeros((len(dcs), C2, C1), np.float32)
    for j, dc in enumerate(dcs):
        for c in range(C2):
            s = (c * fc if fc > 0 else c // -fc) + dc
            if 0 <= s < C1:
                S_c[j, c, s] = 1.0
    return S_r, S_c, drs, dcs


def _hi_dot(a, b):
    """f32 matmul at HIGHEST precision: selection sandwiches must be exact
    (default precision rounds inputs to bf16 — err ~2e-2, breaking the
    bit-exact-vs-XLA fused-kernel contract; probe commit 6ec4897)."""
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=None)
def _sel_cached(op):
    return _sel_matrices(op)


def _resample_tap(op, sel_r, sel_c, x, tap_index):
    """One tap's post-aligned plane: ``S_r(dr) @ x @ S_c(dc)^T``."""
    taps = op[7]
    dr, dc = taps[tap_index]
    _, _, drs, dcs = _sel_cached(op)
    y = _hi_dot(sel_r[drs.index(int(dr))], x)       # (R2, C1)
    return _hi_dot(y, sel_c[dcs.index(int(dc))].T)  # (R2, C2)


def _stdp_delta(lft_pre, lft_post, a_plus, a_minus, tau_plus, tau_minus, dt):
    """`stdp_delta_arrays` (core/reward.py) on int32 firing-time planes."""
    both = jnp.logical_and(lft_pre != NEVER, lft_post != NEVER)
    diff = jnp.abs((lft_pre - lft_post).astype(jnp.float32)) * dt
    plus = a_plus * jnp.exp(-diff / tau_plus)
    minus = -a_minus * jnp.exp(-diff / tau_minus)
    dw = jnp.where(lft_pre < lft_post, plus,
                   jnp.where(lft_pre > lft_post, minus, 0.0))
    return jnp.where(both, dw, 0.0)


def _rstdp_visit(w, c, dw, ct, delta, dop, exp_dc, tau_c):
    """One `RewardModulatedSTDP::update_weight` visit (core/reward.py)."""
    dw = dw + delta
    apply_trace = ct != 0
    c = jnp.where(apply_trace, c * exp_dc + tau_c * dw, c)
    dw = jnp.where(apply_trace, 0.0, dw)
    ct = jnp.where(apply_trace, 0, 1).astype(ct.dtype)
    w = w + c * dop
    return w, c, dw, ct


def _make_kernel(spec, n_steps, env=None):
    """Build the fused kernel.  Ref order must match `_flat_inputs` /
    `_out_shapes` exactly (inputs then outputs, cursor style).

    Mixed lattice shapes are static Python structure (each lattice/train
    keeps its own (R_k, C_k) refs); inter-shape connections are resample
    ops — two small HIGHEST-precision selection matmuls per tap
    (`_resample_tap`), MXU work instead of strided slices (which do not
    lower in Mosaic).

    With ``env`` (an :class:`EnvSpec`), the per-step reward is computed
    IN-KERNEL by the traced callbacks instead of read from the
    precomputed ``rewards`` SMEM vector, the env scalars ride the loop
    carry, and the per-step rewards are emitted as an output plane.  The
    env form requires a single lattice and no trains/conns
    (interactable.JitEnvironment's agent contract)."""
    if env is not None:
        assert len(spec.lattices) == 1 and not spec.trains \
            and not spec.conns
        # reward_fn present iff the loop is reward-modulated; the
        # unsupervised Environment::run form (interactable/mod.rs:48-59)
        # has no reward and emits no reward plane
        assert (env.reward_fn is not None) == spec.with_reward

    def kernel(*refs):
        cur = [0]

        def take():
            r = refs[cur[0]]
            cur[0] += 1
            return r

        clock_ref = take()                  # (1,)  i32 SMEM
        pp_ref = take()                     # (5,)  f32 SMEM
        rp_ref = take()                     # (7,)  f32 SMEM
        dop_ref = take()                    # (1,)  f32 SMEM
        if env is None:
            rew_ref = take()                # (n_steps,) f32 SMEM
        else:
            env_ref = take()                # (n_leaves,) f32 SMEM

        lats = []
        for ls in spec.lattices:
            d = dict(v=take()[:, :], w=take()[:, :], lft=take()[:, :],
                     wst=take()[:, :, :], in_deg=take()[:, :])
            if env is not None:
                d["spk0"] = take()[:, :]    # prev-step spike plane (f32)
            if ls.model in REFRACTORY_MODELS:
                d["refr"] = take()[:, :]
            if ls.kind in ("plastic", "mod"):
                d["mask"] = take()[:, :, :]
            for p in MODEL_PARAM_KEYS[ls.model]:
                d[p] = take()[:, :]
            if ls.kind == "mod":
                d["tc"] = take()[:, :, :]
                d["tdw"] = take()[:, :, :]
                d["tct"] = take()[:, :, :]
            lats.append(d)

        trains = []
        for ts in spec.trains:
            d = dict(lft=take()[:, :], v_th=take()[:, :],
                     v_resting=take()[:, :], refr_k=take()[:, :],
                     dt=take()[:, :])
            if ts.kind == "poisson":
                d["chance"] = take()[:, :]
                d["uniforms"] = take()      # (chunk * R, C) ref, sliced
            else:
                d["rate"] = take()[:, :]
                d["step"] = take()[:, :]
            trains.append(d)

        conns = []
        for cs in spec.conns:
            if cs.op[0] == "resample":
                d = dict(w=take()[:, :, :], mask=take()[:, :, :],
                         sel_r=take()[:, :, :], sel_c=take()[:, :, :])
            else:
                d = dict(w=take()[:, :], mask=take()[:, :])
            if cs.reward:
                d["tc"] = take()[:, :]
                d["tdw"] = take()[:, :]
                d["tct"] = take()[:, :]
            conns.append(d)

        # remaining refs are outputs, in carry order (see _out_shapes);
        # the trailing len(emits) refs receive per-step v_pre planes,
        # preceded (env form) by the per-step reward plane + env scalars
        out_refs = refs[cur[0]:]
        emit_lats = [i for i, ls in enumerate(spec.lattices) if ls.emit]
        emit_refs = out_refs[len(out_refs) - len(emit_lats):]
        if env is not None:
            n_tail = len(emit_lats)
            env_out_refs = out_refs[len(out_refs) - n_tail - env.n_leaves:
                                    len(out_refs) - n_tail]
            if spec.with_reward:
                rew_out_ref = out_refs[len(out_refs) - n_tail
                                       - env.n_leaves - 1]

        pp = {k: pp_ref[i] for i, k in enumerate(PP_KEYS)}
        rp = {k: rp_ref[i] for i, k in enumerate(RP_KEYS)}
        clock0 = clock_ref[0]
        exp_dc = jnp.exp(-rp["dt"] / rp["tau_c"])
        exp_dd = jnp.exp(-rp["dt"] / rp["tau_d"])

        # static per-run precomputation
        def zero_of(shape):
            return jnp.zeros(shape, jnp.float32)

        cnts = []
        dt_cm, dt_tau = [], []
        for i, ls in enumerate(spec.lattices):
            cnt = lats[i]["in_deg"]
            for ci, cs in enumerate(spec.conns):
                if cs.post == i:
                    m = conns[ci]["mask"]
                    cnt = cnt + (jnp.sum(m, axis=0)
                                 if cs.op[0] == "resample" else m)
            cnts.append(jnp.maximum(cnt, 1.0))
            dt_cm.append(lats[i]["dt"] / lats[i]["c_m"]
                         if "c_m" in MODEL_PARAM_KEYS[ls.model] else None)
            dt_tau.append(lats[i]["dt"] / lats[i]["tau_m"])

        # static resample helpers: per-tap post-aligned "ones" planes (the
        # XLA path's resampled sub_src — exactly 1 in-bounds, 0 in the zero
        # padding), so phase A can form w*(a - sub*v) with the XLA path's
        # exact rounding (w*a - w*v differs in the last ulp)
        resample_subs = {}
        for ci, cs in enumerate(spec.conns):
            if cs.op[0] == "resample" and not cs.pre_is_st:
                ones = jnp.ones(spec.lattices[cs.pre].shape, jnp.float32)
                resample_subs[ci] = [
                    _resample_tap(cs.op, conns[ci]["sel_r"],
                                  conns[ci]["sel_c"], ones, t)
                    for t in range(len(cs.op[7]))]

        lat0 = tuple(
            (lats[i]["v"], lats[i]["w"], lats[i]["lft"], lats[i]["wst"],
             (lats[i]["tc"], lats[i]["tdw"], lats[i]["tct"])
             if ls.kind == "mod" else (),
             lats[i]["spk0"] if env is not None else zero_of(ls.shape),
             lats[i]["refr"] if ls.model in REFRACTORY_MODELS
             else zero_of(ls.shape))
            for i, ls in enumerate(spec.lattices))
        tr0 = tuple(
            (trains[j]["lft"],
             trains[j]["step"] if ts.kind == "rate" else zero_of(ts.shape),
             zero_of(ts.shape))
            for j, ts in enumerate(spec.trains))
        cn0 = tuple(
            (conns[ci]["w"],
             (conns[ci]["tc"], conns[ci]["tdw"], conns[ci]["tct"])
             if cs.reward else ())
            for ci, cs in enumerate(spec.conns))
        dop0 = dop_ref[0]
        env0 = tuple(env_ref[i] for i in range(env.n_leaves)) \
            if env is not None else ()

        def sview_of(i, lat_entry):
            """Restricted state view handed to the traced env callbacks —
            same keys/semantics as the flat state dict the XLA path's
            callbacks see, shaped (R, C).  "w" is only exposed for model
            kinds that actually carry it (LIF has none — exposing the
            kernel's dummy zero plane would hand a w-reading callback
            zeros where every other tier raises KeyError)."""
            v, w, lft, _, _, spk, refr = lat_entry
            d = {"v": v, "last_firing_time": lft,
                 "is_spiking": spk > 0.0}
            if spec.lattices[i].model in W_MODELS:
                d["w"] = w
            if spec.lattices[i].model in REFRACTORY_MODELS:
                d["refractory_count"] = refr
            return d

        def body(k, carry):
            if env is not None:
                lat_c, tr_c, cn_c, dop, env_t = carry
                env_tree = jax.tree_util.tree_unflatten(env.treedef, env_t)
            else:
                lat_c, tr_c, cn_c, dop = carry
            lat_c = list(lat_c)
            tr_c = list(tr_c)
            cn_c = list(cn_c)
            step_clock = clock0 + k

            # ---- spike-train effects (previous-step firing times) ----
            effects = []
            for j, ts in enumerate(spec.trains):
                t = trains[j]
                lft_t = tr_c[j][0]
                amp = t["v_th"] - t["v_resting"]
                tdiff = (step_clock - lft_t).astype(jnp.float32)
                decay = -1.0 / (t["refr_k"] / t["dt"])
                if ts.refractoriness == "delta_dirac":
                    eff = amp * jnp.exp(decay * tdiff * tdiff) \
                        + t["v_resting"]
                else:
                    eff = amp * jnp.exp(decay * tdiff) + t["v_resting"]
                effects.append(jnp.where(lft_t == NEVER, t["v_resting"],
                                         eff))

            # ---- phase A: electrical inputs ----
            inputs = []
            for i, ls in enumerate(spec.lattices):
                v, w, lft, wst = lat_c[i][:4]
                acc = zero_of(ls.shape)
                wsum = zero_of(ls.shape)
                for o, (dr, dc) in enumerate(ls.offsets):
                    acc = acc + wst[o] * _shift(v, dr, dc)
                    wsum = wsum + wst[o]
                total = acc - v * wsum
                for ci, cs in enumerate(spec.conns):
                    if cs.post != i:
                        continue
                    cw = cn_c[ci][0]
                    cmask = conns[ci]["mask"]
                    a_src = effects[cs.pre] if cs.pre_is_st \
                        else lat_c[cs.pre][0]
                    if cs.op[0] == "resample":
                        # mirror `_conn_gather`'s resample branch bitwise:
                        # per-tap w*(a - sub*v) stacked then summed over the
                        # tap axis (sub is the resampled ones plane for
                        # lattice sources, zeros for spike trains — where
                        # the product collapses exactly)
                        contribs = []
                        for t in range(len(cs.op[7])):
                            a_t = _resample_tap(cs.op, conns[ci]["sel_r"],
                                                conns[ci]["sel_c"], a_src, t)
                            if cs.pre_is_st:
                                contribs.append(cw[t] * a_t)
                            else:
                                contribs.append(
                                    cw[t] * (a_t - resample_subs[ci][t] * v))
                        total = total + jnp.sum(jnp.stack(contribs), axis=0)
                    elif cs.pre_is_st:
                        total = total + cmask * cw * a_src
                    else:
                        total = total + cmask * cw * (a_src - v)
                inputs.append(lats[i]["gap_conductance"] * total / cnts[i])

            # ---- dopamine decays with the reward before the visits ----
            if spec.with_reward:
                if env is not None:
                    # reward from the traced callback on the PREVIOUS
                    # step's state (interactable.JitEnvironment step order:
                    # reward -> agent update -> env update -> encode); k is
                    # a Python int (the env form unrolls), so the reward
                    # store is a static row write
                    reward = jnp.asarray(
                        env.reward_fn(env_tree, sview_of(0, lat_c[0])),
                        jnp.float32)
                    rew_out_ref[k:k + 1, :] = jnp.full((1, 128), reward)
                else:
                    reward = rew_ref[k]
                dop = dop * exp_dd + rp["tau_d"] * reward

            # ---- phase B: neuron-model step, deferred firing times ----
            new_lat = []
            for i, ls in enumerate(spec.lattices):
                v, w, lft, wst, traces, _, refr = lat_c[i]
                p = lats[i]
                if ls.model == "izhikevich":
                    dv = (0.04 * v * v + 5.0 * v + 140.0 - w + inputs[i]) \
                        * dt_cm[i]
                    dw_ = (p["a"] * (p["b"] * v - w)) * dt_tau[i]
                    v_pre = v + dv
                    w_new = w + dw_
                    if ls.emit:
                        # static-index history store (k is a Python int on
                        # the unrolled emit path); only the PRE-RESET
                        # voltage — select-chain stores blow up XLA:CPU
                        # compile (ops/pallas_stencil._kernel_multi)
                        e = emit_lats.index(i)
                        Ri = ls.shape[0]
                        emit_refs[e][k * Ri:(k + 1) * Ri, :] = v_pre
                    spk = v_pre >= p["v_th"]
                    v_new = jnp.where(spk, p["c"], v_pre)
                    w_new = jnp.where(spk, w_new + p["d"], w_new)
                else:
                    # LIF-family deltas (integrate_and_fire/mod.rs:108-1051)
                    leak = p["leak_constant"] * (v - p["e_l"])
                    drive = p["integration_constant"] * (inputs[i] / p["g_l"])
                    if ls.model == "alif":
                        dv = (leak + drive - w / p["g_l"]) * dt_cm[i]
                        dw_ = (p["alpha"] * (v - p["e_l"]) - w) * dt_tau[i]
                    else:                       # lif
                        dv = (leak + drive) * dt_tau[i]
                        dw_ = 0.0
                    v_new = v + dv
                    w_new = w + dw_
                    # refractory handler (models/base._handle_refractory_
                    # reset / _handle_adaptive)
                    in_ref = refr > 0.0
                    crossed = v_new >= p["v_th"]
                    spk = jnp.logical_and(jnp.logical_not(in_ref), crossed)
                    v_new = jnp.where(jnp.logical_or(in_ref, spk),
                                      p["v_reset"], v_new)
                    if ls.model == "alif":
                        w_new = jnp.where(spk, w_new + p["beta"], w_new)
                    refr = jnp.where(
                        in_ref, refr - 1.0,
                        jnp.where(spk, p["tref"] / p["dt"], refr))
                lft = jnp.where(spk, step_clock, lft)
                new_lat.append([v_new, w_new, lft, wst, traces,
                                spk.astype(jnp.float32), refr])
            lat_c = new_lat

            def trig_of(idx, is_st):
                # spike trains are never plastic endpoints (plan flags,
                # core/reward_structured.py `flags`): the train branch is
                # unreachable (pre_plastic gates every call)
                return tr_c[idx][2] if is_st else lat_c[idx][5]

            def lft_of(idx, is_st):
                return tr_c[idx][0] if is_st else lat_c[idx][2]

            # ---- STDP: plastic intra graphs + plain connections ----
            for i, ls in enumerate(spec.lattices):
                if ls.kind != "plastic":
                    continue
                lft = lat_c[i][2]
                spk_f = lat_c[i][5]
                wst = lat_c[i][3]
                mask = lats[i]["mask"]
                new_w = []
                for o, (dr, dc) in enumerate(ls.offsets):
                    delta = _stdp_delta(_shift(lft, dr, dc), lft,
                                        pp["a_plus"], pp["a_minus"],
                                        pp["tau_plus"], pp["tau_minus"],
                                        pp["dt"])
                    count = _shift(spk_f, dr, dc) + spk_f
                    new_w.append(jnp.where(mask[o] > 0.0,
                                           wst[o] + delta * count, wst[o]))
                lat_c[i][3] = jnp.stack(new_w)
            for ci, cs in enumerate(spec.conns):
                if cs.reward or not cs.updates:
                    continue
                cw = cn_c[ci][0]
                cmask = conns[ci]["mask"]
                post_shape = spec.lattices[cs.post].shape
                lft_post = lat_c[cs.post][2]
                if cs.op[0] == "resample":
                    # mirror `_conn_edge_update` + `_edge_layout`'s
                    # resample branch: pre fields cast f32 then resampled
                    # per tap (exact selection copies; padding garbage is
                    # masked out, like the XLA path's zero pads)
                    lft_pre = lft_of(cs.pre,
                                     cs.pre_is_st).astype(jnp.float32)
                    new_w = []
                    for t in range(len(cs.op[7])):
                        lp = _resample_tap(cs.op, conns[ci]["sel_r"],
                                           conns[ci]["sel_c"], lft_pre, t)
                        delta = _stdp_delta(lp, lft_post,
                                            pp["a_plus"], pp["a_minus"],
                                            pp["tau_plus"], pp["tau_minus"],
                                            pp["dt"])
                        count = jnp.full(post_shape, float(cs.static),
                                         jnp.float32)
                        if cs.pre_plastic:
                            count = count + _resample_tap(
                                cs.op, conns[ci]["sel_r"],
                                conns[ci]["sel_c"],
                                trig_of(cs.pre, cs.pre_is_st), t)
                        if cs.post_plastic:
                            count = count + lat_c[cs.post][5]
                        new_w.append(jnp.where(cmask[t] > 0.0,
                                               cw[t] + delta * count,
                                               cw[t]))
                    cn_c[ci] = (jnp.stack(new_w), cn_c[ci][1])
                    continue
                delta = _stdp_delta(lft_of(cs.pre, cs.pre_is_st),
                                    lft_post,
                                    pp["a_plus"], pp["a_minus"],
                                    pp["tau_plus"], pp["tau_minus"],
                                    pp["dt"])
                count = jnp.full(post_shape, float(cs.static), jnp.float32)
                if cs.pre_plastic:
                    count = count + trig_of(cs.pre, cs.pre_is_st)
                if cs.post_plastic:
                    count = count + lat_c[cs.post][5]
                cn_c[ci] = (jnp.where(cmask > 0.0, cw + delta * count, cw),
                            cn_c[ci][1])

            # ---- R-STDP: modulated intra graphs (two visits/edge) ----
            for i, ls in enumerate(spec.lattices):
                if ls.kind != "mod":
                    continue
                lft = lat_c[i][2]
                wst = lat_c[i][3]
                tc, tdw, tct = lat_c[i][4]
                mask = lats[i]["mask"]
                nw, nc, nd, nt = [], [], [], []
                for o, (dr, dc) in enumerate(ls.offsets):
                    delta = _stdp_delta(_shift(lft, dr, dc), lft,
                                        rp["a_plus"], rp["a_minus"],
                                        rp["tau_plus"], rp["tau_minus"],
                                        rp["dt"])
                    w1, c1, d1, t1 = _rstdp_visit(
                        wst[o], tc[o], tdw[o], tct[o], delta, dop, exp_dc,
                        rp["tau_c"])
                    w2, c2, d2, t2 = _rstdp_visit(
                        w1, c1, d1, t1, delta, dop, exp_dc, rp["tau_c"])
                    m = mask[o] > 0.0
                    nw.append(jnp.where(m, w2, wst[o]))
                    nc.append(jnp.where(m, c2, tc[o]))
                    nd.append(jnp.where(m, d2, tdw[o]))
                    nt.append(jnp.where(m, t2, tct[o]))
                lat_c[i][3] = jnp.stack(nw)
                lat_c[i][4] = (jnp.stack(nc), jnp.stack(nd), jnp.stack(nt))

            # ---- reward connections: gated visits ----
            for ci, cs in enumerate(spec.conns):
                if not cs.reward:
                    continue
                cw = cn_c[ci][0]
                tc, tdw, tct = cn_c[ci][1]
                cmask = conns[ci]["mask"] > 0.0
                delta = _stdp_delta(lft_of(cs.pre, cs.pre_is_st),
                                    lat_c[cs.post][2],
                                    rp["a_plus"], rp["a_minus"],
                                    rp["tau_plus"], rp["tau_minus"],
                                    rp["dt"])
                visits = jnp.full(spec.lattices[cs.post].shape,
                                  float(cs.static), jnp.float32)
                if cs.pre_plastic:
                    visits = visits + trig_of(cs.pre, cs.pre_is_st)
                if cs.post_plastic:
                    visits = visits + lat_c[cs.post][5]
                w1, c1, d1, t1 = _rstdp_visit(cw, tc, tdw, tct, delta, dop,
                                              exp_dc, rp["tau_c"])
                m1 = jnp.logical_and(cmask, visits >= 1.0)
                cw = jnp.where(m1, w1, cw)
                tc = jnp.where(m1, c1, tc)
                tdw = jnp.where(m1, d1, tdw)
                tct = jnp.where(m1, t1, tct)
                w2, c2, d2, t2 = _rstdp_visit(cw, tc, tdw, tct, delta, dop,
                                              exp_dc, rp["tau_c"])
                m2 = jnp.logical_and(cmask, visits >= 2.0)
                cn_c[ci] = (jnp.where(m2, w2, cw),
                            (jnp.where(m2, c2, tc), jnp.where(m2, d2, tdw),
                             jnp.where(m2, t2, tct)))

            # ---- spike trains step last (pre-increment clock) ----
            new_tr = []
            for j, ts in enumerate(spec.trains):
                t = trains[j]
                lft_t, step_t, _ = tr_c[j]
                if ts.kind == "poisson":
                    Rt = ts.shape[0]
                    u = t["uniforms"][pl.ds(k * Rt, Rt), :]
                    spk_t = u <= t["chance"]
                else:
                    stepped = step_t + t["dt"]
                    spk_t = jnp.logical_and(t["rate"] != 0.0,
                                            stepped >= t["rate"])
                    step_t = jnp.where(spk_t, 0.0, stepped)
                lft_t = jnp.where(spk_t, step_clock, lft_t)
                new_tr.append((lft_t, step_t, spk_t.astype(jnp.float32)))

            if env is not None:
                # env state update + cue encoding on the POST-update state
                # (XLA fused_step order); the encoder may write v / w /
                # refractory_count — other keys are rejected by the
                # engagement check (interactable._grid_callbacks_ok)
                sview = sview_of(0, lat_c[0])
                env_tree = env.update_fn(env_tree, sview)
                enc = dict(env.encode_fn(env_tree, sview))
                lat_c[0] = list(lat_c[0])
                lat_c[0][0] = jnp.asarray(enc["v"], jnp.float32)
                if "w" in enc:
                    lat_c[0][1] = jnp.asarray(enc["w"], jnp.float32)
                if "refractory_count" in enc \
                        and spec.lattices[0].model in REFRACTORY_MODELS:
                    lat_c[0][6] = jnp.asarray(enc["refractory_count"],
                                              jnp.float32)
                env_t = tuple(jnp.asarray(x, jnp.float32) for x in
                              jax.tree_util.tree_leaves(env_tree))
                return (tuple(tuple(x) for x in lat_c), tuple(new_tr),
                        tuple(cn_c), dop, env_t)
            return (tuple(tuple(x) for x in lat_c), tuple(new_tr),
                    tuple(cn_c), dop)

        env_f = ()
        if env is not None:
            # per-step reward stores need STATIC slice indices: unroll
            carry = (lat0, tr0, cn0, dop0, env0)
            for k in range(n_steps):
                carry = body(k, carry)
            lat_f, tr_f, cn_f, dop_f, env_f = carry
        elif emit_lats:
            # history stores need STATIC slice indices: unroll the step
            # loop (k becomes a Python int), matching the emit form of
            # ops/pallas_stencil._kernel_multi
            carry = (lat0, tr0, cn0, dop0)
            for k in range(n_steps):
                carry = body(k, carry)
            lat_f, tr_f, cn_f, dop_f = carry
        else:
            lat_f, tr_f, cn_f, dop_f = jax.lax.fori_loop(
                0, n_steps, body, (lat0, tr0, cn0, dop0))

        # ---- write outputs (order mirrors _out_shapes) ----
        oc = [0]

        def put(val):
            out_refs[oc[0]][...] = val
            oc[0] += 1

        for i, ls in enumerate(spec.lattices):
            v, w, lft, wst, traces, spk, refr = lat_f[i]
            put(v)
            put(w)
            put(lft)
            put(spk)
            if ls.model in REFRACTORY_MODELS:
                put(refr)
            if ls.kind in ("plastic", "mod"):
                put(wst)
            if ls.kind == "mod":
                put(traces[0])
                put(traces[1])
                put(traces[2])
        for j, ts in enumerate(spec.trains):
            lft_t, step_t, spk_t = tr_f[j]
            put(lft_t)
            put(spk_t)
            if ts.kind == "rate":
                put(step_t)
        for ci, cs in enumerate(spec.conns):
            put(cn_f[ci][0])
            if cs.reward:
                put(cn_f[ci][1][0])
                put(cn_f[ci][1][1])
                put(cn_f[ci][1][2])
        put(jnp.full((8, 128), dop_f, jnp.float32))
        if env is not None:
            if spec.with_reward:
                oc[0] += 1                # rewards plane (stored per-step)
            for x in env_f:
                put(jnp.full((8, 128), x, jnp.float32))

    return kernel


def _out_shapes(spec, n_steps, env=None):
    out = []
    for ls in spec.lattices:
        R, C = ls.shape
        f = jax.ShapeDtypeStruct((R, C), jnp.float32)
        i = jax.ShapeDtypeStruct((R, C), jnp.int32)
        n_off = len(ls.offsets)
        p = jax.ShapeDtypeStruct((n_off, R, C), jnp.float32)
        pi = jax.ShapeDtypeStruct((n_off, R, C), jnp.int32)
        out += [f, f, i, f]              # v, w, lft, spk
        if ls.model in REFRACTORY_MODELS:
            out.append(f)                # refractory_count
        if ls.kind in ("plastic", "mod"):
            out.append(p)                # wst
        if ls.kind == "mod":
            out += [p, p, pi]            # tc, tdw, tct
    for ts in spec.trains:
        R, C = ts.shape
        out += [jax.ShapeDtypeStruct((R, C), jnp.int32),
                jax.ShapeDtypeStruct((R, C), jnp.float32)]     # lft, spk
        if ts.kind == "rate":
            out.append(jax.ShapeDtypeStruct((R, C), jnp.float32))  # step
    for cs in spec.conns:
        R2, C2 = spec.lattices[cs.post].shape
        if cs.op[0] == "resample":
            w = jax.ShapeDtypeStruct((len(cs.op[7]), R2, C2), jnp.float32)
        else:
            w = jax.ShapeDtypeStruct((R2, C2), jnp.float32)
        out.append(w)                    # w
        if cs.reward:
            out += [jax.ShapeDtypeStruct((R2, C2), jnp.float32),
                    jax.ShapeDtypeStruct((R2, C2), jnp.float32),
                    jax.ShapeDtypeStruct((R2, C2), jnp.int32)]  # traces
    out.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))   # dopamine
    if env is not None:
        if spec.with_reward:
            out.append(jax.ShapeDtypeStruct((n_steps, 128), jnp.float32))
        out += [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * env.n_leaves
    for ls in spec.lattices:
        if ls.emit:                      # per-step v_pre planes
            out.append(jax.ShapeDtypeStruct(
                (n_steps * ls.shape[0], ls.shape[1]), jnp.float32))
    return out


def _fused_chunk(spec, n_steps, flat_inputs, env=None):
    """One kernel launch advancing ``n_steps`` steps."""
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [smem] * 5 + [vmem] * (len(flat_inputs) - 5)
    out_shapes = _out_shapes(spec, n_steps, env)
    return pl.pallas_call(
        _make_kernel(spec, n_steps, env),
        grid_spec=pl.GridSpec(grid=(1,), in_specs=in_specs,
                              out_specs=[vmem] * len(out_shapes)),
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(*flat_inputs)


# ---------------------------------------------------------------------------
# Host-side data marshalling
# ---------------------------------------------------------------------------


class _LatData(NamedTuple):
    v: jnp.ndarray
    w: jnp.ndarray
    lft: jnp.ndarray
    wst: jnp.ndarray
    mask: jnp.ndarray          # () placeholder when unused
    params: tuple              # planes, MODEL_PARAM_KEYS[model] order
    traces: tuple              # (tc, tdw, tct) or ()
    refr: jnp.ndarray = ()     # refractory_count plane (alif/lif only)


class _TrainData(NamedTuple):
    lft: jnp.ndarray
    v_th: jnp.ndarray
    v_resting: jnp.ndarray
    refr_k: jnp.ndarray
    dt: jnp.ndarray
    chance: jnp.ndarray        # poisson only ((),) otherwise
    rate: jnp.ndarray
    step: jnp.ndarray


class _ConnData(NamedTuple):
    w: jnp.ndarray
    mask: jnp.ndarray
    traces: tuple              # (tc, tdw, tct) or ()
    sel_r: jnp.ndarray = ()    # resample selection matrices ((),) otherwise
    sel_c: jnp.ndarray = ()


def _flat_inputs(spec, n_steps, lat_data, tr_data, cn_data, dop, clock,
                 rewards, uniforms, pp_vec, rp_vec, env_vec=None, spk0=()):
    """Flatten in the exact cursor order `_make_kernel` reads.  With
    ``env_vec`` (the flattened f32 env scalars), it replaces the
    precomputed rewards SMEM slot and ``spk0`` carries the previous
    step's spike planes (one per lattice)."""
    flat = [jnp.asarray(clock, jnp.int32).reshape(1), pp_vec, rp_vec,
            jnp.asarray(dop, jnp.float32).reshape(1),
            env_vec if env_vec is not None
            else jnp.asarray(rewards, jnp.float32).reshape(n_steps)]
    for li, (ls, d) in enumerate(zip(spec.lattices, lat_data)):
        flat += [d.v, d.w, d.lft, d.wst]
        # in_deg derives from the (static) f32 mask planes, matching
        # StencilGraph's mask.sum(axis=0) construction
        flat.append(jnp.sum(d.mask, axis=0))
        if env_vec is not None:
            flat.append(spk0[li])
        if ls.model in REFRACTORY_MODELS:
            flat.append(d.refr)
        if ls.kind in ("plastic", "mod"):
            flat.append(d.mask)
        flat += list(d.params)
        if ls.kind == "mod":
            flat += list(d.traces)
    for ts, d, u in zip(spec.trains, tr_data, uniforms):
        flat += [d.lft, d.v_th, d.v_resting, d.refr_k, d.dt]
        if ts.kind == "poisson":
            flat += [d.chance, u]
        else:
            flat += [d.rate, d.step]
    for cs, d in zip(spec.conns, cn_data):
        flat += [d.w, d.mask]
        if cs.op[0] == "resample":
            flat += [d.sel_r, d.sel_c]
        if cs.reward:
            flat += list(d.traces)
    return flat


def _run_fused(spec, chunk, lat_data, tr_data, cn_data, dop, clock, rewards,
               keys, pp_vec, rp_vec, chunk_i0=0):
    """Scan ``n_steps // chunk`` kernel launches of ``chunk`` steps each.
    Traced — called inside the cached jitted runners.

    Poisson uniforms are drawn PER CHUNK inside the scan (``fold_in(key,
    chunk_i0 + i)``): pre-materializing the whole run's uniforms up front
    ((n_steps*R, C) per train) costs O(run length) HBM — ~4 GB for a 1e6-
    step 32x32 run — where the streamed draw is O(chunk*R*C).  ``chunk_i0``
    offsets the fold-in index so a remainder launch never reuses the main
    scan's stream."""
    n_steps = rewards.shape[0]
    q = n_steps // chunk
    assert q * chunk == n_steps

    rew_chunks = rewards.reshape(q, chunk)
    lat_spk0 = tuple(jnp.zeros(ls.shape, jnp.float32)
                     for ls in spec.lattices)
    tr_spk0 = tuple(jnp.zeros(ts.shape, jnp.float32) for ts in spec.trains)

    def draw(i):
        us = []
        for ts, k in zip(spec.trains, keys):
            if ts.kind == "poisson":
                R, C = ts.shape
                us.append(jax.random.uniform(
                    jax.random.fold_in(k, chunk_i0 + i), (chunk * R, C)))
            else:
                # unused placeholder, minimal footprint (kernel never
                # reads it)
                us.append(jnp.zeros((chunk * ts.shape[0], 1), jnp.float32))
        return tuple(us)

    def step(carry, xs):
        lat_data, tr_data, cn_data, dop, clock, _, _ = carry
        rew_k, i = xs
        outs = _fused_chunk(spec, chunk, _flat_inputs(
            spec, chunk, lat_data, tr_data, cn_data, dop, clock, rew_k,
            draw(i), pp_vec, rp_vec))
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits = \
            _unflatten(spec, outs, lat_data, tr_data, cn_data)
        return (lat_data, tr_data, cn_data, dop, clock + chunk,
                lat_spk, tr_spk), emits

    (lat_data, tr_data, cn_data, dop, clock, lat_spk, tr_spk), emits = \
        jax.lax.scan(step, (lat_data, tr_data, cn_data, dop, clock,
                            lat_spk0, tr_spk0),
                     (rew_chunks, jnp.arange(q, dtype=jnp.int32)))
    # stacked (q, chunk*R, C) -> per-step (n_steps, R, C) planes
    emit_shapes = [ls.shape for ls in spec.lattices if ls.emit]
    emits = tuple(e.reshape((n_steps,) + s)
                  for e, s in zip(emits, emit_shapes))
    return lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits


def _unflatten(spec, outs, lat_data, tr_data, cn_data, env=None):
    """Rebuild the data tuples from kernel outputs (mirrors _out_shapes)."""
    cur = [0]

    def take():
        v = outs[cur[0]]
        cur[0] += 1
        return v

    new_lat, lat_spk = [], []
    for ls, d in zip(spec.lattices, lat_data):
        v, w, lft, spk = take(), take(), take(), take()
        wst = d.wst
        traces = d.traces
        refr = d.refr
        if ls.model in REFRACTORY_MODELS:
            refr = take()
        if ls.kind in ("plastic", "mod"):
            wst = take()
        if ls.kind == "mod":
            traces = (take(), take(), take())
        new_lat.append(d._replace(v=v, w=w, lft=lft, wst=wst,
                                  traces=traces, refr=refr))
        lat_spk.append(spk)
    new_tr, tr_spk = [], []
    for ts, d in zip(spec.trains, tr_data):
        lft, spk = take(), take()
        step = d.step
        if ts.kind == "rate":
            step = take()
        new_tr.append(d._replace(lft=lft, step=step))
        tr_spk.append(spk)
    new_cn = []
    for cs, d in zip(spec.conns, cn_data):
        w = take()
        traces = d.traces
        if cs.reward:
            traces = (take(), take(), take())
        new_cn.append(d._replace(w=w, traces=traces))
    dop = take()[0, 0]
    if env is not None:
        rewards = take()[:, 0] if spec.with_reward else None
        env_vec = (jnp.stack([take()[0, 0] for _ in range(env.n_leaves)])
                   if env.n_leaves else jnp.zeros((0,), jnp.float32))
        emits = tuple(outs[cur[0]:])
        return (tuple(new_lat), tuple(new_tr), tuple(new_cn), dop,
                tuple(lat_spk), tuple(tr_spk), emits, rewards, env_vec)
    emits = tuple(outs[cur[0]:])   # per-step v_pre, emit-lattice order
    return (tuple(new_lat), tuple(new_tr), tuple(new_cn), dop,
            tuple(lat_spk), tuple(tr_spk), emits)


def _advance(spec, n_steps, lat_data, tr_data, cn_data, dop, clock, rewards,
             key, pp, rp, chunk=DEFAULT_CHUNK):
    """Advance ``n_steps`` fused steps (traced; one jit contains the chunked
    scan AND the remainder launch — a run is a single device program).

    Returns (lat_data, tr_data, cn_data, dopamine, lat_spk, tr_spk, key,
    emits) where ``emits`` holds one (n_steps, R, C) v_pre sequence per
    emitting lattice (LatSpec.emit), in lattice order.
    """
    pp_vec = jnp.stack([jnp.float32(pp[k]) for k in PP_KEYS])
    rp_vec = jnp.stack([jnp.float32(rp[k]) for k in RP_KEYS])

    # one subkey per train for the whole run; chunks stream their uniforms
    # inside the scan via fold_in (the XLA path splits per step)
    keys = []
    for _ in spec.trains:
        key, sub = jax.random.split(key)
        keys.append(sub)
    keys = tuple(keys)

    chunk = max(1, min(chunk, n_steps))
    done = (n_steps // chunk) * chunk
    clock = jnp.asarray(clock, jnp.int32)
    dop = jnp.asarray(dop, jnp.float32)
    lat_spk = tr_spk = None
    emits = emits_rem = None
    if done:
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits = \
            _run_fused(spec, chunk, lat_data, tr_data, cn_data, dop, clock,
                       rewards[:done], keys, pp_vec, rp_vec)
    rem = n_steps - done
    if rem:
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits_rem = \
            _run_fused(spec, rem, lat_data, tr_data, cn_data, dop,
                       clock + done, rewards[done:], keys, pp_vec, rp_vec,
                       chunk_i0=n_steps // chunk)
    if emits is None:
        emits = emits_rem
    elif emits_rem is not None:
        emits = tuple(jnp.concatenate([a, b])
                      for a, b in zip(emits, emits_rem))
    return lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, key, emits


def estimate_vmem(spec, chunk=DEFAULT_CHUNK):
    """Rough VMEM requirement: all input planes + the uniforms chunk + a
    small multiplier for loop-carried temporaries."""
    total = 0
    for ls in spec.lattices:
        n = ls.shape[0] * ls.shape[1]
        n_off = len(ls.offsets)
        planes = 5 + len(MODEL_PARAM_KEYS[ls.model]) + n_off * 2
        if ls.model in REFRACTORY_MODELS:
            planes += 2
        if ls.kind == "mod":
            planes += n_off * 3
        if ls.emit:
            planes += chunk          # the (chunk*R, C) v_pre output
        total += planes * n
    for ts in spec.trains:
        total += (6 + chunk) * ts.shape[0] * ts.shape[1]
    for cs in spec.conns:
        n_post = (spec.lattices[cs.post].shape[0]
                  * spec.lattices[cs.post].shape[1])
        if cs.op[0] == "resample":
            # per-tap weight + mask planes + the selection matrices
            _, R1, C1, R2, C2, _, _, taps = cs.op
            total += 2 * len(taps) * n_post
            total += len(taps) * (R2 * R1 + C2 * C1)
        else:
            total += (2 + (3 if cs.reward else 0)) * n_post
    return total * 4 * 3


def supports_shapes(spec, chunk=DEFAULT_CHUNK):
    cols = [ls.shape[1] for ls in spec.lattices] \
        + [ts.shape[1] for ts in spec.trains]
    return max(cols) <= 128 and estimate_vmem(spec, chunk) < VMEM_BUDGET


# ---------------------------------------------------------------------------
# Adapters: structured reward network / standalone reward lattice
# ---------------------------------------------------------------------------


def _lat_data(state, graph, kind, trace, model="izhikevich"):
    R, C = graph.shape

    def g(n):
        return state[n].reshape(R, C)

    traces = ()
    if kind == "mod":
        traces = (trace["c"], trace["dw"], trace["counter"])
    return _LatData(
        v=g("v"),
        w=g("w") if "w" in state else jnp.zeros((R, C), jnp.float32),
        lft=state["last_firing_time"].reshape(R, C),
        wst=graph.weights, mask=graph.mask.astype(jnp.float32),
        params=tuple(g(p) for p in MODEL_PARAM_KEYS[model]), traces=traces,
        refr=(g("refractory_count") if model in REFRACTORY_MODELS else ()))


def _train_data(state, R, C):
    def g(n):
        return state[n].reshape(R, C)

    zero = jnp.zeros((R, C), jnp.float32)
    return _TrainData(
        lft=state["last_firing_time"].reshape(R, C),
        v_th=g("v_th"), v_resting=g("v_resting"),
        refr_k=g("refractoriness$k"), dt=g("dt"),
        chance=g("chance_of_firing") if "chance_of_firing" in state else zero,
        rate=g("rate") if "rate" in state else zero,
        step=g("step") if "step" in state else zero)


def _conn_data(w, aux, R, C, trace0, op=("one2one",)):
    traces = ()
    if trace0 is not None:
        traces = (trace0["c"].reshape(R, C), trace0["dw"].reshape(R, C),
                  trace0["counter"].reshape(R, C))
    if op[0] == "resample":
        # weights/mask already live as (n_taps, R2, C2) planes
        # (core/structured.ResampleBlock); ship the selection matrices
        sel_r, sel_c, _, _ = _sel_cached(op)
        return _ConnData(w=w, mask=aux["mask"].astype(jnp.float32),
                         traces=traces, sel_r=jnp.asarray(sel_r),
                         sel_c=jnp.asarray(sel_c))
    return _ConnData(w=w.reshape(R, C),
                     mask=aux["mask"].astype(jnp.float32).reshape(R, C),
                     traces=traces)


def _stencil_ok(graph, shape):
    from .graph import StencilGraph
    return isinstance(graph, StencilGraph) and tuple(graph.shape) == shape


def supports_plain_lattice(lat):
    """Fused-path predicate for a standalone plain Lattice agent (the
    unsupervised JitEnvironment.run loop)."""
    from ..core.plasticity import STDP
    from ..core.lattice import _mask_any
    return (_model_kind(lat.model) is not None
            and lat.electrical_synapse and not lat.chemical_synapse
            and getattr(lat, "mesh", None) is None   # sharded: GSPMD/XLA
            and _stencil_ok(lat.graph, (lat.rows, lat.cols))
            and lat.cols <= 128
            and (not lat.do_plasticity or type(lat.plasticity) is STDP)
            and not bool(_mask_any(lat.state["nt$mask"])))


def supports_lattice(lat):
    """Fused-path predicate for a standalone RewardModulatedLattice."""
    from ..core.plasticity import RewardModulatedSTDP
    from ..core.lattice import _mask_any
    return (_model_kind(lat.model) is not None
            and lat.electrical_synapse and not lat.chemical_synapse
            and getattr(lat, "mesh", None) is None   # sharded: GSPMD/XLA
            and _stencil_ok(lat.graph, (lat.rows, lat.cols))
            and lat.cols <= 128
            and type(lat.reward_modulator) is RewardModulatedSTDP
            and not bool(_mask_any(lat.state["nt$mask"])))


@functools.lru_cache(maxsize=None)
def _build_fused_lattice_runner(spec):
    """Jitted standalone-lattice runner (everything — marshalling, uniform
    generation, the chunk scan, write-back reshapes — in ONE device
    program; eager per-call device ops each pay tunnel dispatch latency).
    jit re-traces per rewards length, like the XLA runners' static
    ``length``."""

    def impl(state, graph, trace, dopamine, key, clock, rewards, rp):
        ls = spec.lattices[0]
        lat_data = (_lat_data(state, graph, ls.kind, trace, ls.model),)
        lat_data, _, _, dop, lat_spk, _, key, _ = _advance(
            spec, rewards.shape[0], lat_data, (), (), dopamine, clock,
            rewards, key, rp, rp)
        d = lat_data[0]
        state = dict(state)
        state["v"] = d.v.reshape(-1)
        if "w" in state:
            state["w"] = d.w.reshape(-1)
        state["last_firing_time"] = d.lft.reshape(-1)
        state["is_spiking"] = lat_spk[0].reshape(-1) > 0.0
        if ls.model in REFRACTORY_MODELS:
            state["refractory_count"] = d.refr.reshape(-1)
        out_graph, out_trace = graph, trace
        if spec.lattices[0].kind == "mod":
            out_graph = graph.replace_weights(d.wst)
            out_trace = dict(c=d.traces[0], dw=d.traces[1],
                             counter=d.traces[2])
        return state, out_graph, out_trace, dop, key

    return jax.jit(impl)


def lattice_run(lat, rewards, with_reward):
    """Run a standalone reward lattice with the fused kernel.  The caller
    must have checked `supports_lattice` and that no histories are on.
    Returns False (untouched) when the shape budget rejects the config."""
    spec = NetSpec((LatSpec("mod" if lat.do_modulation else "plain",
                            lat.graph.offsets, _model_kind(lat.model),
                            (lat.rows, lat.cols)),),
                   (), (), bool(with_reward))
    if not supports_shapes(spec):
        return False
    n_steps = int(rewards.shape[0])
    runner = _build_fused_lattice_runner(spec)
    rp = {k: jnp.float32(v) for k, v in lat.reward_modulator.params.items()}
    lat.state, lat.graph, lat.trace, dop, lat.key = runner(
        lat.state, lat.graph, lat.trace, jnp.float32(lat.dopamine), lat.key,
        jnp.int32(lat.internal_clock), jnp.asarray(rewards, jnp.float32), rp)
    lat.state = dict(lat.state)
    lat.trace = dict(lat.trace) if lat.trace is not None else None
    lat.dopamine = float(dop)
    lat.internal_clock += n_steps
    return True


def _env_advance(spec, env, n_steps, lat_data, spk0, dop, clock, env_vec,
                 pp_vec, rp_vec, chunk=DEFAULT_CHUNK):
    """Advance ``n_steps`` closed-loop env steps (traced): a scan of
    K-step in-kernel-env launches plus one remainder launch, all inside
    the caller's jit.  The previous step's spike planes and the flattened
    env scalars ride the scan carry between launches.

    Returns (lat_data, spk, dopamine, env_vec, rewards(n_steps,))."""
    chunk = max(1, min(chunk, n_steps))
    q = n_steps // chunk

    def launch(n, lat_data, spk, dop, clock, env_vec):
        # SMEM refs must be non-empty: leafless env trees feed a dummy
        ev = env_vec if env.n_leaves else jnp.zeros((1,), jnp.float32)
        outs = _fused_chunk(spec, n, _flat_inputs(
            spec, n, lat_data, (), (), dop, clock, None, (),
            pp_vec, rp_vec, env_vec=ev, spk0=spk), env=env)
        lat_data, _, _, dop, lat_spk, _, _, rewards, env_vec = \
            _unflatten(spec, outs, lat_data, (), (), env=env)
        return lat_data, lat_spk, dop, env_vec, rewards

    clock = jnp.asarray(clock, jnp.int32)
    dop = jnp.asarray(dop, jnp.float32)
    rewards_all = []
    if q:
        def step(carry, _):
            lat_data, spk, dop, clock, env_vec = carry
            lat_data, spk, dop, env_vec, rewards = launch(
                chunk, lat_data, spk, dop, clock, env_vec)
            return ((lat_data, spk, dop, clock + chunk, env_vec),
                    () if rewards is None else rewards)

        (lat_data, spk0, dop, clock, env_vec), rews = jax.lax.scan(
            step, (lat_data, spk0, dop, clock, env_vec), None, length=q)
        if spec.with_reward:
            rewards_all.append(rews.reshape(q * chunk))
    rem = n_steps - q * chunk
    if rem:
        lat_data, spk0, dop, env_vec, rewards = launch(
            rem, lat_data, spk0, dop, clock, env_vec)
        if spec.with_reward:
            rewards_all.append(rewards)
    if not spec.with_reward:
        return lat_data, spk0, dop, env_vec, None
    rewards = rewards_all[0] if len(rewards_all) == 1 \
        else jnp.concatenate(rewards_all)
    return lat_data, spk0, dop, env_vec, rewards


def _model_kind(model):
    """MODEL_PARAM_KEYS key for a supported neuron model, else None."""
    from ..models.integrate_and_fire import (
        Izhikevich, AdaptiveLeakyIntegrateAndFire, LeakyIntegrateAndFire)
    return {Izhikevich: "izhikevich",
            AdaptiveLeakyIntegrateAndFire: "alif",
            LeakyIntegrateAndFire: "lif"}.get(type(model))


def _train_spec(s, st_model):
    """TrainSpec for a spike-train lattice, or None if unsupported."""
    from ..models.spike_train import PoissonSpikeTrain, RateSpikeTrain
    if s.model != st_model:
        return None
    if type(s.model) is PoissonSpikeTrain:
        kind = "poisson"
    elif type(s.model) is RateSpikeTrain:
        kind = "rate"
    else:
        return None
    return TrainSpec(kind, s.model.refractoriness, (s.rows, s.cols))


def network_runner(net, plan, lat_kind, skip_nt, with_reward):
    """Drop-in fused runner for `run_structured_reward` (same call and
    return signature as `_build_structured_reward_runner`'s runner), or
    None when the network configuration is unsupported."""
    from ..core.plasticity import STDP, RewardModulatedSTDP

    merged = net._neuron_lattices()
    lat_ids, st_ids = plan["lat_ids"], plan["st_ids"]
    lattices = [merged[i] for i in lat_ids]
    sts = [net.spike_train_lattices[i] for i in st_ids]
    if not (net.electrical_synapse and not net.chemical_synapse and skip_nt):
        return None
    if getattr(net, "mesh", None) is not None \
            or any(getattr(l, "mesh", None) is not None for l in lattices):
        return None                     # sharded nets stay on GSPMD/XLA
    if any(k == "reward" for k in lat_kind):
        return None                     # do_modulation=False: fall back
    shape = (lattices[0].rows, lattices[0].cols)
    if shape[1] > 128:
        return None
    lat_models = []
    for lat in lattices:
        mk = _model_kind(lat.model)
        if mk is None or (lat.rows, lat.cols) != shape \
                or not _stencil_ok(lat.graph, shape):
            return None
        lat_models.append(mk)
    st_model = sts[0].model if sts else None
    tr_specs = []
    for s in sts:
        # spike-train nt masks are covered by the caller's batched skip_nt
        ts = _train_spec(s, st_model)
        if ts is None or ts.shape != shape:
            return None
        tr_specs.append(ts)
    if type(net._plasticity()) is not STDP \
            or type(net.reward_modulator) is not RewardModulatedSTDP:
        return None
    lat_index = {i: k for k, i in enumerate(lat_ids)}
    st_index = {i: k for k, i in enumerate(st_ids)}
    conn_specs = []
    for entry in plan["conns"]:
        if entry["op"].kind != "one2one":
            return None
        pre_is_st = entry["pre_is_st"]
        conn_specs.append(ConnSpec(
            pre_is_st,
            st_index[entry["pre"]] if pre_is_st else lat_index[entry["pre"]],
            lat_index[entry["post"]], False, entry["static"],
            entry["pre_plastic"], entry["post_plastic"], entry["updates"]))
    for entry in plan["rconns"]:
        if entry["op"].kind != "one2one":
            return None
        pre_is_st = entry["pre_is_st"]
        conn_specs.append(ConnSpec(
            pre_is_st,
            st_index[entry["pre"]] if pre_is_st else lat_index[entry["pre"]],
            lat_index[entry["post"]], True, entry["static"],
            entry["pre_plastic"], entry["post_plastic"], True))
    spec = NetSpec(tuple(LatSpec(k, lat.graph.offsets, mk, shape)
                         for k, lat, mk in zip(lat_kind, lattices,
                                               lat_models)),
                   tuple(tr_specs), tuple(conn_specs), bool(with_reward))
    if not supports_shapes(spec):
        return None
    return _build_fused_network_runner(spec, len(plan["conns"]),
                                       len(plan["rconns"]))


@functools.lru_cache(maxsize=None)
def _build_fused_network_runner(spec, n_plain, n_reward):
    """Jitted network runner — one device program per run (marshalling,
    uniforms, chunk scan + remainder, write-back reshapes all inside)."""

    def impl(states, st_states, graphs, traces, conn_ws, conn_aux,
             rconn_ws, rconn_traces, rconn_aux, dopamine, key, clock,
             rewards, pparams, rparams):
        lat_data = tuple(
            _lat_data(states[k], graphs[k], spec.lattices[k].kind,
                      traces[k], spec.lattices[k].model)
            for k in range(len(spec.lattices)))
        tr_data = tuple(_train_data(st_states[k], *spec.trains[k].shape)
                        for k in range(len(spec.trains)))
        cn_data = tuple(
            _conn_data(conn_ws[ci], conn_aux[ci],
                       *spec.lattices[spec.conns[ci].post].shape, None,
                       spec.conns[ci].op)
            for ci in range(n_plain)) + tuple(
            _conn_data(rconn_ws[ci], rconn_aux[ci],
                       *spec.lattices[spec.conns[n_plain + ci].post].shape,
                       rconn_traces[ci], spec.conns[n_plain + ci].op)
            for ci in range(n_reward))
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, key, _ = _advance(
            spec, rewards.shape[0], lat_data, tr_data, cn_data, dopamine,
            clock, rewards, key, pparams, rparams)
        new_states = []
        new_graphs = list(graphs)
        new_traces = list(traces)
        for k, ls in enumerate(spec.lattices):
            d = lat_data[k]
            s = dict(states[k])
            s["v"] = d.v.reshape(-1)
            if "w" in s:
                s["w"] = d.w.reshape(-1)
            s["last_firing_time"] = d.lft.reshape(-1)
            s["is_spiking"] = lat_spk[k].reshape(-1) > 0.0
            if ls.model in REFRACTORY_MODELS:
                s["refractory_count"] = d.refr.reshape(-1)
            new_states.append(s)
            if ls.kind in ("plastic", "mod"):
                new_graphs[k] = graphs[k].replace_weights(d.wst)
            if ls.kind == "mod":
                new_traces[k] = dict(c=d.traces[0], dw=d.traces[1],
                                     counter=d.traces[2])
        new_st = []
        for k, ts in enumerate(spec.trains):
            d = tr_data[k]
            s = dict(st_states[k])
            spk = tr_spk[k].reshape(-1) > 0.0
            s["is_spiking"] = spk
            s["v"] = jnp.where(spk, s["v_th"], s["v_resting"])
            s["last_firing_time"] = d.lft.reshape(-1)
            if ts.kind == "rate":
                s["step"] = d.step.reshape(-1)
            new_st.append(s)
        new_conn_ws = tuple(cn_data[ci].w.reshape(-1)
                            for ci in range(n_plain))
        new_rconn_ws = tuple(cn_data[n_plain + ci].w.reshape(-1)
                             for ci in range(n_reward))
        new_rconn_tr = tuple(
            dict(c=cn_data[n_plain + ci].traces[0].reshape(-1),
                 dw=cn_data[n_plain + ci].traces[1].reshape(-1),
                 counter=cn_data[n_plain + ci].traces[2].reshape(-1))
            for ci in range(n_reward))
        return (tuple(new_states), tuple(new_st), tuple(new_graphs),
                tuple(new_traces), new_conn_ws, new_rconn_ws, new_rconn_tr,
                dop, key, {})

    return jax.jit(impl)


def plain_network_runner(net, plan, skip_nt, length, hist=()):
    """Fused runner for `core.structured.run_structured` (plain
    LatticeNetwork; same call and return signature as
    `_build_structured_runner`'s runner), or None when unsupported.

    Supported class mirrors `network_runner` minus the reward machinery:
    Izhikevich/ALIF/LIF lattices on StencilGraphs (MIXED grid shapes
    allowed), electrical synapses only, no neurotransmitters, Poisson/Rate
    trains, one-to-one and resample (pooling/upsampling, see
    `core/structured.ResampleBlock`) connections, STDP plasticity.

    ``hist`` carries `run_structured`'s lattice grid-history entries
    ``(lat_id, kind, sig, shape)``: grid/average/eeg/spikes readouts on
    Izhikevich lattices are reconstructed from per-step PRE-RESET voltage
    planes emitted by the kernel (LatSpec.emit); anything else falls back
    to the XLA runner.
    """
    from ..core.plasticity import STDP

    lat_ids, st_ids = plan["lat_ids"], plan["st_ids"]
    lattices = [net.lattices[i] for i in lat_ids]
    sts = [net.spike_train_lattices[i] for i in st_ids]
    if not lattices:
        return None
    if not (net.electrical_synapse and not net.chemical_synapse and skip_nt):
        return None
    if getattr(net, "mesh", None) is not None \
            or any(getattr(l, "mesh", None) is not None for l in lattices):
        return None                     # sharded nets stay on GSPMD/XLA
    lat_index = {i: k for k, i in enumerate(lat_ids)}
    st_index = {i: k for k, i in enumerate(st_ids)}
    emit_ks = set()
    hist_info = []
    for (i, kind, sig, _shape) in hist:
        if i not in lat_index or kind not in ("grid", "average", "eeg",
                                              "spikes"):
            return None
        emit_ks.add(lat_index[i])
        hist_info.append((lat_index[i], i, kind, sig))
    lat_models, lat_kind, shapes = [], [], []
    for k, lat in enumerate(lattices):
        mk = _model_kind(lat.model)
        shape_l = (lat.rows, lat.cols)
        if mk is None or not _stencil_ok(lat.graph, shape_l):
            return None
        if k in emit_ks and mk != "izhikevich":
            return None     # v_pre reconstruction is izhikevich-only
        lat_models.append(mk)
        lat_kind.append("plastic" if lat.do_plasticity else "plain")
        shapes.append(shape_l)
    if any(k == "plastic" for k in lat_kind) \
            and type(net._plasticity()) is not STDP:
        return None
    st_model = sts[0].model if sts else None
    tr_specs = []
    for s in sts:
        # spike-train nt masks are covered by the caller's batched check
        ts = _train_spec(s, st_model)
        if ts is None:
            return None
        tr_specs.append(ts)
    do_plast = [k == "plastic" for k in lat_kind]
    conn_specs = []
    for entry in plan["conns"]:
        pre_is_st = entry["pre_is_st"]
        pre_k = st_index[entry["pre"]] if pre_is_st \
            else lat_index[entry["pre"]]
        post_k = lat_index[entry["post"]]
        pre_shape = tr_specs[pre_k].shape if pre_is_st else shapes[pre_k]
        op_kind = entry["op"].kind
        if op_kind == "one2one":
            if pre_shape != shapes[post_k]:
                return None     # flat-index identity needs aligned planes
            op = ("one2one",)
        elif isinstance(op_kind, tuple) and op_kind[0] == "resample":
            # static = (R1, C1, R2, C2, fr, fc, taps); plane shapes are
            # guaranteed by ResampleBlock's construction
            op = op_kind
        else:
            return None
        # plain-network connection visits (structured runner gated_delta):
        # count = pre_spiking * pre_plastic + post_spiking * post_plastic
        pre_plastic = (not pre_is_st) and do_plast[pre_k]
        post_plastic = do_plast[post_k]
        conn_specs.append(ConnSpec(
            pre_is_st, pre_k, post_k, False, 0,
            pre_plastic, post_plastic, pre_plastic or post_plastic, op))
    spec = NetSpec(tuple(LatSpec(k, lat.graph.offsets, mk, sh,
                                 emit=ki in emit_ks)
                         for ki, (k, lat, mk, sh) in enumerate(
                             zip(lat_kind, lattices, lat_models, shapes))),
                   tuple(tr_specs), tuple(conn_specs), False)
    if not supports_shapes(spec):
        return None
    return _build_fused_plain_runner(spec, int(length), tuple(hist_info))


@functools.lru_cache(maxsize=None)
def _build_fused_plain_runner(spec, length, hist_info=()):
    """Jitted plain-network runner (signature of
    `core.structured._build_structured_runner`'s `run`).

    ``hist_info`` entries (lat_k, lat_id, kind, sig) turn the emitted
    per-step v_pre planes into the same ys dict the XLA runner returns:
    spikes/post-reset v are reconstructed with the identical ops the
    kernel used (spk = v_pre >= v_th; v = where(spk, c, v_pre)) — exact."""
    import math as _math

    n_conns = len(spec.conns)
    emit_order = [k for k, ls in enumerate(spec.lattices) if ls.emit]

    def impl(states, st_states, graphs, conn_ws, conn_aux, key, clock,
             pparams):
        lat_data = tuple(
            _lat_data(states[k], graphs[k], spec.lattices[k].kind, None,
                      spec.lattices[k].model)
            for k in range(len(spec.lattices)))
        tr_data = tuple(_train_data(st_states[k], *spec.trains[k].shape)
                        for k in range(len(spec.trains)))
        cn_data = tuple(
            _conn_data(conn_ws[ci], conn_aux[ci],
                       *spec.lattices[spec.conns[ci].post].shape, None,
                       spec.conns[ci].op)
            for ci in range(n_conns))
        # no reward machinery: dopamine stays 0, rp values are unused by
        # the kernel on a with_reward=False spec with no mod/reward parts
        rp = {k: jnp.float32(1.0) for k in RP_KEYS}
        lat_data, tr_data, cn_data, _, lat_spk, tr_spk, key, emits = \
            _advance(spec, length, lat_data, tr_data, cn_data,
                     jnp.float32(0.0), clock,
                     jnp.zeros((length,), jnp.float32), key, pparams, rp)
        new_states = []
        new_graphs = list(graphs)
        for k, ls in enumerate(spec.lattices):
            d = lat_data[k]
            s = dict(states[k])
            s["v"] = d.v.reshape(-1)
            if "w" in s:
                s["w"] = d.w.reshape(-1)
            s["last_firing_time"] = d.lft.reshape(-1)
            s["is_spiking"] = lat_spk[k].reshape(-1) > 0.0
            if ls.model in REFRACTORY_MODELS:
                s["refractory_count"] = d.refr.reshape(-1)
            new_states.append(s)
            if ls.kind == "plastic":
                new_graphs[k] = graphs[k].replace_weights(d.wst)
        new_st = []
        for k, ts in enumerate(spec.trains):
            d = tr_data[k]
            s = dict(st_states[k])
            spk = tr_spk[k].reshape(-1) > 0.0
            s["is_spiking"] = spk
            s["v"] = jnp.where(spk, s["v_th"], s["v_resting"])
            s["last_firing_time"] = d.lft.reshape(-1)
            if ts.kind == "rate":
                s["step"] = d.step.reshape(-1)
            new_st.append(s)
        # resample weights keep their (n_taps, R2, C2) plane layout
        # (ResampleBlock.w0); one2one weights go back to flat vectors
        new_conn_ws = tuple(
            cn_data[ci].w if spec.conns[ci].op[0] == "resample"
            else cn_data[ci].w.reshape(-1)
            for ci in range(n_conns))
        ys = {}
        for (lat_k, lat_id, kind, sig) in hist_info:
            v_pre = emits[emit_order.index(lat_k)]   # (length, R, C)
            R, C = spec.lattices[lat_k].shape
            spk = v_pre >= states[lat_k]["v_th"].reshape(R, C)[None]
            if kind == "spikes":
                ys[("lat", lat_id)] = spk
                continue
            v_post = jnp.where(spk, states[lat_k]["c"].reshape(R, C)[None],
                               v_pre)
            if kind == "grid":
                ys[("lat", lat_id)] = v_post
            elif kind == "average":
                ys[("lat", lat_id)] = jnp.mean(v_post.reshape(length, -1),
                                               axis=1)
            else:                                    # eeg (history.py:58)
                _, ref, dist, cond = sig
                total = jnp.sum(v_post.reshape(length, -1) - ref, axis=1)
                ys[("lat", lat_id)] = \
                    (1.0 / (4.0 * _math.pi * cond * dist)) * total
        return (tuple(new_states), tuple(new_st), tuple(new_graphs),
                new_conn_ws, key, ys)

    return jax.jit(impl)
