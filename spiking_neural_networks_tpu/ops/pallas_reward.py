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
    shape: tuple = ()          # (R, C) kernel plane layout; flat-layout
                               # lattices (dense/none intra) use (1, N)
    emit: bool = False         # emit per-step PRE-RESET voltage planes
                               # (histories; izhikevich only)
    graph: str = "stencil"     # 'stencil' | 'dense' | 'none'


class TrainSpec(NamedTuple):
    kind: str                  # 'poisson' | 'rate'
    refractoriness: str        # 'delta_dirac' | 'exponential_decay'
    shape: tuple = ()          # (R, C)
    nt: str = ""               # '' or the train's nt-kinetics kind (the
                               # train releases neurotransmitters)


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
    electrical: bool = True    # electrical_synapse (gap-junction phase A)
    chem: tuple = ()           # () or (family, rec_kind, nt_kind):
                               # chemical_synapse networks — per-type NT
                               # planes + receptor kinetics in-body
                               # (reference GPU chemical network runtime,
                               # gpu_lattices/mod.rs:2585+)


# chemical families: static (K=3)-type receptor systems (ops/receptors.py)
CHEM_FAMILIES = ("ionotropic", "dopaglugaba")
NT_KINDS = ("approximate", "bounded", "discrete", "exponential_decay",
            "destexhe")
REC_KINDS = ("approximate", "bounded", "destexhe", "exponential_decay")
# DopaGluGABA per-neuron (R, C) current/modulation parameter planes
# (ops/receptors.py DopaGluGABAReceptors.init_fields)
DOPA_PLANES = ("rec$g_ampa", "rec$g_nmda", "rec$e_ampa", "rec$e_nmda",
               "rec$mg", "rec$g_gaba", "rec$e_gaba", "rec$s_d1", "rec$s_d2")


def _nt_param_keys(nt_kind):
    """(N, K) neurotransmitter-kinetics parameter state keys, take order
    (ops/kinetics.NT_PARAM_DEFAULTS)."""
    return {"approximate": ("nt$t_max", "nt$clearance_constant"),
            "bounded": ("nt$t_max", "nt$clearance_constant"),
            "discrete": ("nt$t_max",),
            "exponential_decay": ("nt$t_max", "nt$decay_constant"),
            "destexhe": ("nt$t_max", "nt$v_p", "nt$k_p")}[nt_kind]


def _rec_kin_keys(rec_kind):
    """Receptor-kinetics parameter SHORT names (ops/kinetics
    .REC_PARAM_DEFAULTS keys minus the 'rec$' prefix); DopaGluGABA's
    secondary gating slot stores them under 'rec$r2$<name>'."""
    return {"approximate": (), "bounded": ("r_max",),
            "destexhe": ("alpha", "beta"),
            "exponential_decay": ("r_max", "decay_constant")}[rec_kind]


def _needs_mask(spec, ls):
    """Whether the kernel takes the lattice's intra edge-mask planes:
    plasticity gating, dense-graph masking, or the chemical per-type
    in-degree counts (StencilGraph.gather_chemical's `em`)."""
    return ls.kind in ("plastic", "mod") or ls.graph == "dense" \
        or (bool(spec.chem) and ls.graph == "stencil")


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
    # ONE exp of the selected argument instead of exp-per-branch: bitwise
    # identical per element (exp of the same input bits), ~1 VPU
    # transcendental saved per offset per step in the fused kernels
    pre_first = lft_pre < lft_post
    e = jnp.exp(jnp.where(pre_first, -diff / tau_plus, -diff / tau_minus))
    dw = jnp.where(pre_first, a_plus * e,
                   jnp.where(lft_pre > lft_post, -a_minus * e, 0.0))
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


def _shift3(x, dr, dc):
    """`_shift` on the last two axes of a (K, R, C) type-plane stack."""
    if dr:
        x = jnp.roll(x, -dr, axis=-2)
    if dc:
        x = jnp.roll(x, -dc, axis=-1)
    return x


def _rec_kinetics_update(rec_kind, r, t_in, kin, dt):
    """REC_KINETICS[rec_kind] on (K, R, C) planes (ops/kinetics.py:118-145,
    statement for statement; masks are 0/1 so op order is rounding-free)."""
    if rec_kind == "approximate":
        return t_in
    if rec_kind == "bounded":
        return jnp.clip(t_in, 0.0, kin["r_max"])
    if rec_kind == "destexhe":
        return r + (kin["alpha"] * t_in * (1.0 - r)
                    - kin["beta"] * r) * dt[None]
    # exponential_decay: r + exp_decay(r, decay, dt) + t, clipped
    new_r = r + (-r * jnp.exp(dt[None] / -kin["decay_constant"])) + t_in
    return jnp.clip(new_r, 0.0, kin["r_max"])


def _nt_release(nt_kind, ntt, v_new, spk_prev_f, p, dt):
    """NT_KINETICS[nt_kind] on (K, R, C) planes (ops/kinetics.py:36-87).
    ``spk_prev_f`` is the PREVIOUS step's spike flag as f32 (apply_t_changes
    runs before handle_spiking, models/base.py:199-203); ``v_new`` is the
    freshly updated pre-reset voltage (destexhe only)."""
    if nt_kind in ("approximate", "bounded"):
        new_t = ntt + dt[None] * -p["nt$clearance_constant"] * ntt \
            + spk_prev_f[None] * p["nt$t_max"]
        return jnp.clip(new_t, 0.0, p["nt$t_max"])
    if nt_kind == "discrete":
        return p["nt$t_max"] * spk_prev_f[None]
    if nt_kind == "exponential_decay":
        new_t = ntt + (-ntt * jnp.exp(dt[None] / -p["nt$decay_constant"])) \
            + spk_prev_f[None] * p["nt$t_max"]
        return jnp.clip(new_t, 0.0, p["nt$t_max"])
    # destexhe: t_max / (1 + exp(-(v - v_p) / k_p))
    return p["nt$t_max"] / (1.0 + jnp.exp(-(v_new[None] - p["nt$v_p"])
                                          / p["nt$k_p"]))


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
            d = dict(v=take()[:, :], w=take()[:, :], lft=take()[:, :])
            if ls.graph == "dense":
                d["wst"] = take()[:, :]     # (N, N) intra weight matrix
            elif ls.graph == "stencil":
                d["wst"] = take()[:, :, :]
            d["in_deg"] = take()[:, :]
            if env is not None or spec.chem:
                # prev-step spike plane (f32): env callbacks read it; NT
                # release uses the PREVIOUS spike flag across chunks
                d["spk0"] = take()[:, :]
            if ls.model in REFRACTORY_MODELS:
                d["refr"] = take()[:, :]
            if _needs_mask(spec, ls):
                d["mask"] = take()[:, :] if ls.graph == "dense" \
                    else take()[:, :, :]
            for p in MODEL_PARAM_KEYS[ls.model]:
                d[p] = take()[:, :]
            if ls.kind == "mod":
                d["tc"] = take()[:, :, :]
                d["tdw"] = take()[:, :, :]
                d["tct"] = take()[:, :, :]
            if spec.chem:
                fam, rec_kind, nt_kind = spec.chem
                c = dict(ntt=take()[:, :, :], ntm=take()[:, :, :])
                c["ntp"] = {k: take()[:, :, :]
                            for k in _nt_param_keys(nt_kind)}
                c["recr"] = take()[:, :, :]
                if fam == "dopaglugaba":
                    c["recr2"] = take()[:, :, :]
                c["recm"] = take()[:, :, :]
                c["kin"] = {k: take()[:, :, :]
                            for k in _rec_kin_keys(rec_kind)}
                if fam == "dopaglugaba":
                    c["kin2"] = {k: take()[:, :, :]
                                 for k in _rec_kin_keys(rec_kind)}
                    c["inh"] = take()[:, :]
                    c["nmda"] = take()[:, :]
                    for pk in DOPA_PLANES:
                        c[pk] = take()[:, :]
                else:
                    c["g"] = take()[:, :, :]
                    c["e"] = take()[:, :, :]
                    c["mg"] = take()[:, :, :]
                d["chem"] = c
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
            if ts.nt:
                d["ntt0"] = take()[:, :, :]
                d["ntm"] = take()[:, :, :]
                d["ntp"] = {k: take()[:, :, :]
                            for k in _nt_param_keys(ts.nt)}
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
                    if cs.op[0] == "resample":
                        cnt = cnt + jnp.sum(m, axis=0)
                    elif cs.op[0] == "dense":
                        # DenseBlock.aux["in_deg"]: mask column sums
                        cnt = cnt + jnp.sum(m, axis=0, keepdims=True)
                    else:
                        cnt = cnt + m
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

        def chem0_of(i):
            if not spec.chem:
                return ()
            c = lats[i]["chem"]
            zero3 = jnp.zeros_like(c["ntt"])   # rec$current rewritten /step
            if spec.chem[0] == "dopaglugaba":
                return (c["ntt"], c["recr"], c["recr2"], zero3,
                        c["inh"], c["nmda"])
            return (c["ntt"], c["recr"], zero3)

        lat0 = tuple(
            (lats[i]["v"], lats[i]["w"], lats[i]["lft"],
             lats[i].get("wst", ()),
             (lats[i]["tc"], lats[i]["tdw"], lats[i]["tct"])
             if ls.kind == "mod" else (),
             lats[i]["spk0"] if (env is not None or spec.chem)
             else zero_of(ls.shape),
             lats[i]["refr"] if ls.model in REFRACTORY_MODELS
             else zero_of(ls.shape),
             chem0_of(i))
            for i, ls in enumerate(spec.lattices))
        tr0 = tuple(
            (trains[j]["lft"],
             trains[j]["step"] if ts.kind == "rate" else zero_of(ts.shape),
             zero_of(ts.shape),
             trains[j]["ntt0"] if ts.nt else ())
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
            v, w, lft, _, _, spk, refr = lat_entry[:7]
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
                if not spec.electrical:
                    inputs.append(zero_of(ls.shape))
                    continue
                v, w, lft, wst = lat_c[i][:4]
                if ls.graph == "dense":
                    # DenseGraph.gather_electrical mirrored, including
                    # _phase_a's divide-then-remultiply re-expansion
                    # (core/structured.py:688-691)
                    Wm = jnp.where(lats[i]["mask"] > 0.0, wst, 0.0)
                    wa = _hi_dot(v, Wm)
                    wsub = _hi_dot(jnp.ones_like(v), Wm)
                    ind = jnp.maximum(lats[i]["in_deg"], 1.0)
                    total = (wa - v * wsub) / ind * ind
                else:
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
                    if cs.op[0] == "dense":
                        # _conn_gather dense: a@w - v*(sub@w); sub is ones
                        # for lattice sources, zeros for spike trains (w0
                        # zeroes off-edge entries by construction)
                        sub = jnp.zeros_like(a_src) if cs.pre_is_st \
                            else jnp.ones_like(a_src)
                        total = total + (_hi_dot(a_src, cw)
                                         - v * _hi_dot(sub, cw))
                    elif cs.op[0] == "resample":
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

            # ---- phase A: chemical neurotransmitter gather (mirrors
            # structured._phase_a chemical arm: per-type sums/counts from
            # the intra graph's gather_chemical, re-expanded, plus every
            # incoming connection's _conn_gather_chemical) ----
            t_ins, t_valids = [], []
            if spec.chem:
                for i, ls in enumerate(spec.lattices):
                    c = lats[i]["chem"]
                    ntt_i = lat_c[i][7][0]
                    csum = jnp.zeros_like(ntt_i)
                    ccnt = jnp.zeros_like(ntt_i)
                    if ls.graph == "stencil" and ls.offsets:
                        wst = lat_c[i][3]
                        em = lats[i]["mask"]
                        tm = ntt_i * c["ntm"]
                        sums = jnp.zeros_like(ntt_i)
                        gcnt = jnp.zeros_like(ntt_i)
                        for o, (dr, dc) in enumerate(ls.offsets):
                            sums = sums + wst[o][None] * _shift3(tm, dr, dc)
                            gcnt = gcnt + em[o][None] * _shift3(c["ntm"],
                                                                dr, dc)
                        t_in_g = sums / jnp.maximum(gcnt, 1.0)
                        csum = csum + t_in_g * jnp.maximum(gcnt, 1.0) \
                            * (gcnt > 0.0).astype(jnp.float32)
                        ccnt = ccnt + gcnt
                    elif ls.graph == "dense":
                        Wm = jnp.where(lats[i]["mask"] > 0.0,
                                       lat_c[i][3], 0.0)
                        mf = lats[i]["mask"]
                        tm = ntt_i * c["ntm"]
                        sums = jnp.stack([_hi_dot(tm[k], Wm)
                                          for k in range(3)])
                        gcnt = jnp.stack([_hi_dot(c["ntm"][k], mf)
                                          for k in range(3)])
                        t_in_g = sums / jnp.maximum(gcnt, 1.0)
                        csum = csum + t_in_g * jnp.maximum(gcnt, 1.0) \
                            * (gcnt > 0.0).astype(jnp.float32)
                        ccnt = ccnt + gcnt
                    for ci, cs in enumerate(spec.conns):
                        if cs.post != i:
                            continue
                        if cs.pre_is_st:
                            if not spec.trains[cs.pre].nt:
                                continue    # NT-less train: zero masks
                            t_src = tr_c[cs.pre][3]
                            m_src = trains[cs.pre]["ntm"]
                        else:
                            t_src = lat_c[cs.pre][7][0]
                            m_src = lats[cs.pre]["chem"]["ntm"]
                        cw = cn_c[ci][0]
                        cmask = conns[ci]["mask"]
                        if cs.op[0] == "dense":
                            tm = t_src * m_src
                            csum = csum + jnp.stack(
                                [_hi_dot(tm[k], cw) for k in range(3)])
                            ccnt = ccnt + jnp.stack(
                                [_hi_dot(m_src[k], cmask) for k in range(3)])
                        else:               # one2one
                            gate = cmask[None] > 0.0
                            csum = csum + jnp.where(
                                gate, cw[None] * t_src * m_src, 0.0)
                            ccnt = ccnt + jnp.where(gate, m_src, 0.0)
                    t_ins.append(csum / jnp.maximum(ccnt, 1.0))
                    t_valids.append(ccnt > 0.0)

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
                v, w, lft, wst, traces, spk_prev, refr, chem_c = lat_c[i]
                p = lats[i]
                chem_new = chem_c
                rec_dv = 0.0
                if spec.chem:
                    # receptor kinetics + currents at the PRE-update
                    # voltage, then receptor_dv (models/base.step:185-197)
                    fam, rec_kind, nt_kind = spec.chem
                    c = p["chem"]
                    upd = jnp.logical_and(t_valids[i], c["recm"] > 0.0)
                    recr = jnp.where(upd, _rec_kinetics_update(
                        rec_kind, chem_c[1], t_ins[i], c["kin"], p["dt"]),
                        chem_c[1])
                    if fam == "dopaglugaba":
                        recr2 = jnp.where(upd, _rec_kinetics_update(
                            rec_kind, chem_c[2], t_ins[i], c["kin2"],
                            p["dt"]), chem_c[2])
                        # DopaGluGABAReceptors.set_currents: currents use
                        # the PREVIOUS step's modifiers, then the dopamine
                        # group rewrites them (ops/receptors.py:213-243)
                        inh, nmda_m = chem_c[4], chem_c[5]
                        block = 1.0 / (1.0 + jnp.exp(-0.062 * v)
                                       * c["rec$mg"] / 3.57)
                        glu = inh * c["rec$g_ampa"] * recr[0] \
                            * (v - c["rec$e_ampa"]) \
                            + block * inh * c["rec$g_nmda"] \
                            * (recr2[0] ** nmda_m) * (v - c["rec$e_nmda"])
                        glu = jnp.where(c["recm"][0] > 0.0, glu, 0.0)
                        gaba = c["rec$g_gaba"] * recr[1] \
                            * (v - c["rec$e_gaba"])
                        gaba = jnp.where(c["recm"][1] > 0.0, gaba, 0.0)
                        dmask = c["recm"][2] > 0.0
                        inh = jnp.where(dmask,
                                        1.0 - recr2[2] * c["rec$s_d2"], inh)
                        nmda_m = jnp.where(dmask,
                                           1.0 - recr[2] * c["rec$s_d1"],
                                           nmda_m)
                        reccur = jnp.stack([glu, gaba, jnp.zeros_like(glu)])
                        rec_dv = (glu + gaba) * (p["dt"] / p["c_m"])
                    else:
                        # IonotropicReceptors.set_currents: NMDA Mg block
                        # at 3.75 (iterate_and_spike/mod.rs:1259-1284)
                        base = c["g"] * recr * (v[None] - c["e"])
                        block = 1.0 / (1.0 + jnp.exp(-0.062 * v)
                                       * c["mg"][1] / 3.75)
                        cur = jnp.stack([base[0], base[1] * block, base[2]])
                        reccur = jnp.where(c["recm"] > 0.0, cur, 0.0)
                        rec_dv = (reccur[0] + reccur[1] + reccur[2]) \
                            * (p["dt"] / p["c_m"])
                if ls.model == "izhikevich":
                    dv = (0.04 * v * v + 5.0 * v + 140.0 - w + inputs[i]) \
                        * dt_cm[i]
                    dw_ = (p["a"] * (p["b"] * v - w)) * dt_tau[i]
                    v_pre = v + dv - rec_dv
                    w_new = w + dw_
                    if ls.emit:
                        # per-step history store; only the PRE-RESET
                        # voltage — select-chain stores blow up XLA:CPU
                        # compile (ops/pallas_stencil._kernel_multi).  In
                        # the fori_loop form k is a tracer and the row
                        # slice is a pl.ds — safe because the engagement
                        # keeps emit lattices at <= 128 lanes (dynamic row
                        # slices of unblocked refs miscompile past 128;
                        # wider emit configs take the unrolled form below)
                        e = emit_lats.index(i)
                        Ri = ls.shape[0]
                        idx = (slice(k * Ri, (k + 1) * Ri)
                               if isinstance(k, int) else pl.ds(k * Ri, Ri))
                        emit_refs[e][idx, :] = v_pre
                    if spec.chem:
                        # NT release: fresh pre-reset voltage, PREVIOUS
                        # spike flag (apply_t_changes before handle_spiking)
                        c = p["chem"]
                        ntt_new = jnp.where(c["ntm"] > 0.0, _nt_release(
                            spec.chem[2], chem_c[0], v_pre, spk_prev,
                            c["ntp"], p["dt"]), 0.0)
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
                    v_new = v + dv - rec_dv
                    w_new = w + dw_
                    if spec.chem:
                        c = p["chem"]
                        ntt_new = jnp.where(c["ntm"] > 0.0, _nt_release(
                            spec.chem[2], chem_c[0], v_new, spk_prev,
                            c["ntp"], p["dt"]), 0.0)
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
                if spec.chem:
                    chem_new = (ntt_new, recr, recr2, reccur, inh, nmda_m) \
                        if spec.chem[0] == "dopaglugaba" \
                        else (ntt_new, recr, reccur)
                lft = jnp.where(spk, step_clock, lft)
                new_lat.append([v_new, w_new, lft, wst, traces,
                                spk.astype(jnp.float32), refr, chem_new])
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
                lft_t, step_t, _, ntt_t = tr_c[j]
                if ts.kind == "poisson":
                    # in the unrolled forms k is a Python int and the row
                    # slice is STATIC; the fori_loop form needs pl.ds —
                    # dynamic row slices of unblocked refs miscompile when
                    # the lane dim exceeds 128 (pallas_stencil gotcha), so
                    # flat-layout (1, N>128) poisson trains force the
                    # unrolled form (see the loop-mode selection below)
                    Rt = ts.shape[0]
                    idx = (slice(k * Rt, (k + 1) * Rt)
                           if isinstance(k, int) else pl.ds(k * Rt, Rt))
                    u = t["uniforms"][idx, :]
                    spk_t = u <= t["chance"]
                else:
                    stepped = step_t + t["dt"]
                    spk_t = jnp.logical_and(t["rate"] != 0.0,
                                            stepped >= t["rate"])
                    step_t = jnp.where(spk_t, 0.0, stepped)
                lft_t = jnp.where(spk_t, step_clock, lft_t)
                if ts.nt:
                    # SpikeTrainModel._finish: NT released AFTER the new
                    # spike flag is set, with the new voltage
                    # (spike_train/mod.rs:353-368)
                    v_t = jnp.where(spk_t, t["v_th"], t["v_resting"])
                    ntt_t = jnp.where(t["ntm"] > 0.0, _nt_release(
                        ts.nt, ntt_t, v_t, spk_t.astype(jnp.float32),
                        t["ntp"], t["dt"]), 0.0)
                new_tr.append((lft_t, step_t, spk_t.astype(jnp.float32),
                               ntt_t))

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
        elif any(ts.kind == "poisson" and ts.shape[1] > 128
                 for ts in spec.trains) \
                or any(spec.lattices[i].shape[1] > 128 for i in emit_lats):
            # wide (>128-lane) flat-train uniform reads and history
            # stores need STATIC slice indices: unroll the step loop
            # (k becomes a Python int), matching the emit form of
            # ops/pallas_stencil._kernel_multi.  <=128-lane emits ride
            # the fori_loop form with pl.ds stores (measured r05: the
            # unrolled 16-step emit body cost ~8 us/step on the 64x64
            # EEG+STDP network row)
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
            v, w, lft, wst, traces, spk, refr, chem_f = lat_f[i]
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
            if spec.chem:
                for x in chem_f:    # ntt, recr[, recr2], reccur[, inh, nmda]
                    put(x)
        for j, ts in enumerate(spec.trains):
            lft_t, step_t, spk_t, ntt_t = tr_f[j]
            put(lft_t)
            put(spk_t)
            if ts.kind == "rate":
                put(step_t)
            if ts.nt:
                put(ntt_t)
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
        f3 = jax.ShapeDtypeStruct((3, R, C), jnp.float32)
        out += [f, f, i, f]              # v, w, lft, spk
        if ls.model in REFRACTORY_MODELS:
            out.append(f)                # refractory_count
        if ls.kind in ("plastic", "mod"):
            out.append(p)                # wst
        if ls.kind == "mod":
            out += [p, p, pi]            # tc, tdw, tct
        if spec.chem:
            if spec.chem[0] == "dopaglugaba":
                out += [f3, f3, f3, f3, f, f]  # ntt, r, r2, cur, inh, nmda
            else:
                out += [f3, f3, f3]            # ntt, recr, reccur
    for ts in spec.trains:
        R, C = ts.shape
        out += [jax.ShapeDtypeStruct((R, C), jnp.int32),
                jax.ShapeDtypeStruct((R, C), jnp.float32)]     # lft, spk
        if ts.kind == "rate":
            out.append(jax.ShapeDtypeStruct((R, C), jnp.float32))  # step
        if ts.nt:
            out.append(jax.ShapeDtypeStruct((3, R, C), jnp.float32))  # ntt
    for cs in spec.conns:
        R2, C2 = spec.lattices[cs.post].shape
        if cs.op[0] == "resample":
            w = jax.ShapeDtypeStruct((len(cs.op[7]), R2, C2), jnp.float32)
        elif cs.op[0] == "dense":
            pre = spec.trains[cs.pre] if cs.pre_is_st \
                else spec.lattices[cs.pre]
            w = jax.ShapeDtypeStruct(
                (pre.shape[0] * pre.shape[1], R2 * C2), jnp.float32)
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
    wst: jnp.ndarray           # stencil planes / dense (N, N) / () for none
    mask: jnp.ndarray          # () placeholder when unused
    params: tuple              # planes, MODEL_PARAM_KEYS[model] order
    traces: tuple              # (tc, tdw, tct) or ()
    refr: jnp.ndarray = ()     # refractory_count plane (alif/lif only)
    spk: jnp.ndarray = ()      # prev-step spike plane f32 (chem only)
    # chemical carries (all (3, R, C) except the (R, C) modifiers)
    ntt: jnp.ndarray = ()
    recr: jnp.ndarray = ()
    recr2: jnp.ndarray = ()    # dopaglugaba only
    reccur: jnp.ndarray = ()
    inh: jnp.ndarray = ()      # dopaglugaba inh_modifier
    nmda: jnp.ndarray = ()     # dopaglugaba nmda_modifier
    chem_static: tuple = ()    # static chem refs: (ntm, *ntp, recm, *kin
                               # [, *kin2][, dopa planes | g, e, mg])


class _TrainData(NamedTuple):
    lft: jnp.ndarray
    v_th: jnp.ndarray
    v_resting: jnp.ndarray
    refr_k: jnp.ndarray
    dt: jnp.ndarray
    chance: jnp.ndarray        # poisson only ((),) otherwise
    rate: jnp.ndarray
    step: jnp.ndarray
    ntt: jnp.ndarray = ()      # NT carry (trains with ts.nt)
    chem_static: tuple = ()    # (ntm, *ntp)


class _ConnData(NamedTuple):
    w: jnp.ndarray
    mask: jnp.ndarray
    traces: tuple              # (tc, tdw, tct) or ()
    sel_r: jnp.ndarray = ()    # resample selection matrices ((),) otherwise
    sel_c: jnp.ndarray = ()


def _chem_flat(spec, d):
    """Per-lattice chemical refs in the exact kernel take order."""
    fam, rec_kind, nt_kind = spec.chem
    n_a = 1 + len(_nt_param_keys(nt_kind))       # ntm + nt params
    n_b = 1 + len(_rec_kin_keys(rec_kind))       # recm + kinetics params
    st = d.chem_static
    flat = [d.ntt] + list(st[:n_a]) + [d.recr]
    if fam == "dopaglugaba":
        n_c = len(_rec_kin_keys(rec_kind))       # kin2
        flat += [d.recr2] + list(st[n_a:n_a + n_b + n_c])
        flat += [d.inh, d.nmda] + list(st[n_a + n_b + n_c:])
    else:
        flat += list(st[n_a:])                   # recm, kin, g, e, mg
    return flat


def _flat_inputs(spec, n_steps, lat_data, tr_data, cn_data, dop, clock,
                 rewards, uniforms, pp_vec, rp_vec, env_vec=None, spk0=()):
    """Flatten in the exact cursor order `_make_kernel` reads.  With
    ``env_vec`` (the flattened f32 env scalars), it replaces the
    precomputed rewards SMEM slot.  ``spk0`` carries the previous step's
    spike planes (one per lattice) — consumed by the env form and by
    chemical specs (NT release reads the previous spike flag)."""
    flat = [jnp.asarray(clock, jnp.int32).reshape(1), pp_vec, rp_vec,
            jnp.asarray(dop, jnp.float32).reshape(1),
            env_vec if env_vec is not None
            else jnp.asarray(rewards, jnp.float32).reshape(n_steps)]
    for li, (ls, d) in enumerate(zip(spec.lattices, lat_data)):
        flat += [d.v, d.w, d.lft]
        if ls.graph != "none":
            flat.append(d.wst)
        # in_deg derives from the (static) f32 mask planes, matching
        # StencilGraph's mask.sum(axis=0) / DenseGraph's column sums
        if ls.graph == "stencil":
            flat.append(jnp.sum(d.mask, axis=0))
        elif ls.graph == "dense":
            flat.append(jnp.sum(d.mask, axis=0, keepdims=True))
        else:
            flat.append(jnp.zeros(ls.shape, jnp.float32))
        if env_vec is not None or spec.chem:
            flat.append(spk0[li])
        if ls.model in REFRACTORY_MODELS:
            flat.append(d.refr)
        if _needs_mask(spec, ls):
            flat.append(d.mask)
        flat += list(d.params)
        if ls.kind == "mod":
            flat += list(d.traces)
        if spec.chem:
            flat += _chem_flat(spec, d)
    for ts, d, u in zip(spec.trains, tr_data, uniforms):
        flat += [d.lft, d.v_th, d.v_resting, d.refr_k, d.dt]
        if ts.kind == "poisson":
            flat += [d.chance, u]
        else:
            flat += [d.rate, d.step]
        if ts.nt:
            flat += [d.ntt] + list(d.chem_static)
    for cs, d in zip(spec.conns, cn_data):
        flat += [d.w, d.mask]
        if cs.op[0] == "resample":
            flat += [d.sel_r, d.sel_c]
        if cs.reward:
            flat += list(d.traces)
    return flat


def _run_fused(spec, chunk, lat_data, tr_data, cn_data, dop, clock, rewards,
               keys, pp_vec, rp_vec, chunk_i0=0, spk0=None):
    """Scan ``n_steps // chunk`` kernel launches of ``chunk`` steps each.
    Traced — called inside the cached jitted runners.

    Poisson uniforms are drawn PER CHUNK inside the scan (``fold_in(key,
    chunk_i0 + i)``): pre-materializing the whole run's uniforms up front
    ((n_steps*R, C) per train) costs O(run length) HBM — ~4 GB for a 1e6-
    step 32x32 run — where the streamed draw is O(chunk*R*C).  ``chunk_i0``
    offsets the fold-in index so a remainder launch never reuses the main
    scan's stream.  ``spk0`` (chemical specs) seeds the previous-step spike
    planes the kernel's NT release reads; subsequent chunks use the scan
    carry's spike outputs."""
    n_steps = rewards.shape[0]
    q = n_steps // chunk
    assert q * chunk == n_steps

    rew_chunks = rewards.reshape(q, chunk)
    lat_spk0 = tuple(spk0) if spk0 is not None else tuple(
        jnp.zeros(ls.shape, jnp.float32) for ls in spec.lattices)
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
        lat_data, tr_data, cn_data, dop, clock, lat_spk, _ = carry
        rew_k, i = xs
        outs = _fused_chunk(spec, chunk, _flat_inputs(
            spec, chunk, lat_data, tr_data, cn_data, dop, clock, rew_k,
            draw(i), pp_vec, rp_vec,
            spk0=lat_spk if spec.chem else ()))
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
        repl = dict(v=v, w=w, lft=lft)
        if ls.model in REFRACTORY_MODELS:
            repl["refr"] = take()
        if ls.kind in ("plastic", "mod"):
            repl["wst"] = take()
        if ls.kind == "mod":
            repl["traces"] = (take(), take(), take())
        if spec.chem:
            repl["ntt"] = take()
            repl["recr"] = take()
            if spec.chem[0] == "dopaglugaba":
                repl["recr2"] = take()
                repl["reccur"] = take()
                repl["inh"] = take()
                repl["nmda"] = take()
            else:
                repl["reccur"] = take()
            repl["spk"] = spk
        new_lat.append(d._replace(**repl))
        lat_spk.append(spk)
    new_tr, tr_spk = [], []
    for ts, d in zip(spec.trains, tr_data):
        lft, spk = take(), take()
        repl = dict(lft=lft)
        if ts.kind == "rate":
            repl["step"] = take()
        if ts.nt:
            repl["ntt"] = take()
        new_tr.append(d._replace(**repl))
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
             key, pp, rp, chunk=None):
    """Advance ``n_steps`` fused steps (traced; one jit contains the chunked
    scan AND the remainder launch — a run is a single device program).

    Returns (lat_data, tr_data, cn_data, dopamine, lat_spk, tr_spk, key,
    emits) where ``emits`` holds one (n_steps, R, C) v_pre sequence per
    emitting lattice (LatSpec.emit), in lattice order.  ``chunk=None``
    resolves via `pick_chunk`.
    """
    if chunk is None:
        chunk = pick_chunk(spec)
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
    spk0 = tuple(d.spk for d in lat_data) if spec.chem else None
    if done:
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits = \
            _run_fused(spec, chunk, lat_data, tr_data, cn_data, dop, clock,
                       rewards[:done], keys, pp_vec, rp_vec, spk0=spk0)
        spk0 = lat_spk if spec.chem else None
    rem = n_steps - done
    if rem:
        lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, emits_rem = \
            _run_fused(spec, rem, lat_data, tr_data, cn_data, dop,
                       clock + done, rewards[done:], keys, pp_vec, rp_vec,
                       chunk_i0=n_steps // chunk, spk0=spk0)
    if emits is None:
        emits = emits_rem
    elif emits_rem is not None:
        emits = tuple(jnp.concatenate([a, b])
                      for a, b in zip(emits, emits_rem))
    return lat_data, tr_data, cn_data, dop, lat_spk, tr_spk, key, emits


def estimate_vmem(spec, chunk=DEFAULT_CHUNK):
    """Rough VMEM requirement: all input planes + the uniforms chunk + a
    small multiplier for loop-carried temporaries."""
    chem_planes = 0
    if spec.chem:
        fam, rec_kind, nt_kind = spec.chem
        a, b = len(_nt_param_keys(nt_kind)), len(_rec_kin_keys(rec_kind))
        # spk0 + (3,R,C) carries + (3,R,C) statics (+ dopa modifier planes)
        if fam == "dopaglugaba":
            chem_planes = 1 + 3 * 4 + 2 + 3 * 2 + 3 * a + 6 * b + 9
        else:
            chem_planes = 1 + 3 * 3 + 3 * 2 + 3 * a + 3 * b + 9
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
        planes += chem_planes
        total += planes * n
        if ls.graph == "dense":
            total += 2 * n * n       # (N, N) intra weights + mask
    for ts in spec.trains:
        nt = (3 * (2 + len(_nt_param_keys(ts.nt))) if ts.nt else 0)
        total += (6 + chunk + nt) * ts.shape[0] * ts.shape[1]
    for cs in spec.conns:
        n_post = (spec.lattices[cs.post].shape[0]
                  * spec.lattices[cs.post].shape[1])
        if cs.op[0] == "resample":
            # per-tap weight + mask planes + the selection matrices
            _, R1, C1, R2, C2, _, _, taps = cs.op
            total += 2 * len(taps) * n_post
            total += len(taps) * (R2 * R1 + C2 * C1)
        elif cs.op[0] == "dense":
            pre = spec.trains[cs.pre] if cs.pre_is_st \
                else spec.lattices[cs.pre]
            total += 2 * pre.shape[0] * pre.shape[1] * n_post
        else:
            total += (2 + (3 if cs.reward else 0)) * n_post
    return total * 4 * 3


def pick_chunk(spec):
    """Steps per kernel launch for `_advance`.

    32 when the config rides the fori_loop kernel body (trip count is
    free; the >128-lane emit/flat-train forms unroll the body, where a
    bigger chunk doubles Mosaic program size) and the VMEM estimate
    allows; else DEFAULT_CHUNK.  Launch + per-chunk glue cost ~12-14 us,
    so doubling the chunk shaves ~0.4-0.8 us/step at 64x64 sizes
    (measured r05, EEG+STDP network row)."""
    unrolled = any(ts.kind == "poisson" and ts.shape[1] > 128
                   for ts in spec.trains) \
        or any(ls.shape[1] > 128 for ls in spec.lattices if ls.emit)
    if not unrolled and estimate_vmem(spec, 32) < VMEM_BUDGET:
        return 32
    return DEFAULT_CHUNK


def supports_shapes(spec, chunk=DEFAULT_CHUNK):
    # grid-layout planes are bound by the proven 128-lane limit; FLAT
    # (1, N) layouts (dense/edgeless graphs, no stencil rolls) are pure
    # elementwise/MXU programs whose refs are indexed statically, safe up
    # to DENSE_N_MAX lanes (verified on hardware, tests/test_pallas_chem)
    for ls in spec.lattices:
        lim = DENSE_N_MAX if ls.shape[0] == 1 and ls.graph != "stencil" \
            else 128
        if ls.shape[1] > lim:
            return False
    for ts in spec.trains:
        if ts.shape[1] > (DENSE_N_MAX if ts.shape[0] == 1 else 128):
            return False
    return estimate_vmem(spec, chunk) < VMEM_BUDGET


# ---------------------------------------------------------------------------
# Adapters: structured reward network / standalone reward lattice
# ---------------------------------------------------------------------------


def _lat_data(spec, i, state, graph, trace):
    ls = spec.lattices[i]
    R, C = ls.shape
    kind, model = ls.kind, ls.model

    def g(n):
        return state[n].reshape(R, C)

    def g3(n, cast=False):
        x = state[n]
        if cast:
            x = x.astype(jnp.float32)
        return jnp.moveaxis(x.reshape(R, C, 3), -1, 0)

    traces = ()
    if kind == "mod":
        traces = (trace["c"], trace["dw"], trace["counter"])
    wst = mask = ()
    if ls.graph != "none":
        wst = graph.weights
        mask = graph.mask.astype(jnp.float32)
    chem = {}
    if spec.chem:
        fam, rec_kind, nt_kind = spec.chem
        ntp = tuple(g3(k) for k in _nt_param_keys(nt_kind))
        kin = tuple(g3("rec$" + k) for k in _rec_kin_keys(rec_kind))
        chem = dict(ntt=g3("nt$t"), recr=g3("rec$r"),
                    reccur=g3("rec$current"),
                    spk=g("is_spiking").astype(jnp.float32))
        if fam == "dopaglugaba":
            kin2 = tuple(g3("rec$r2$" + k) for k in _rec_kin_keys(rec_kind))
            chem.update(
                recr2=g3("rec$r2"), inh=g("rec$inh_modifier"),
                nmda=g("rec$nmda_modifier"),
                chem_static=(g3("nt$mask", cast=True),) + ntp
                + (g3("rec$mask", cast=True),) + kin + kin2
                + tuple(g(k) for k in DOPA_PLANES))
        else:
            chem["chem_static"] = (g3("nt$mask", cast=True),) + ntp \
                + (g3("rec$mask", cast=True),) + kin \
                + (g3("rec$g"), g3("rec$e"), g3("rec$mg"))
    return _LatData(
        v=g("v"),
        w=g("w") if "w" in state else jnp.zeros((R, C), jnp.float32),
        lft=state["last_firing_time"].reshape(R, C),
        wst=wst, mask=mask,
        params=tuple(g(p) for p in MODEL_PARAM_KEYS[model]), traces=traces,
        refr=(g("refractory_count") if model in REFRACTORY_MODELS else ()),
        **chem)


def _train_data(state, R, C, ts=None):
    def g(n):
        return state[n].reshape(R, C)

    zero = jnp.zeros((R, C), jnp.float32)
    chem = {}
    if ts is not None and ts.nt:
        ntm = jnp.moveaxis(
            state["nt$mask"].astype(jnp.float32).reshape(R, C, 3), -1, 0)
        ntp = tuple(jnp.moveaxis(state[k].reshape(R, C, 3), -1, 0)
                    for k in _nt_param_keys(ts.nt))
        chem = dict(ntt=jnp.moveaxis(state["nt$t"].reshape(R, C, 3), -1, 0),
                    chem_static=(ntm,) + ntp)
    return _TrainData(
        lft=state["last_firing_time"].reshape(R, C),
        v_th=g("v_th"), v_resting=g("v_resting"),
        refr_k=g("refractoriness$k"), dt=g("dt"),
        chance=g("chance_of_firing") if "chance_of_firing" in state else zero,
        rate=g("rate") if "rate" in state else zero,
        step=g("step") if "step" in state else zero, **chem)


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
    if op[0] == "dense":
        # DenseBlock: (n_pre, n_post) matrix layout kept as-is
        return _ConnData(w=w, mask=aux["mask"].astype(jnp.float32),
                         traces=traces)
    return _ConnData(w=w.reshape(R, C),
                     mask=aux["mask"].astype(jnp.float32).reshape(R, C),
                     traces=traces)


def _back3(x):
    """(3, R, C) kernel plane stack -> flat (N, 3) state layout."""
    return jnp.moveaxis(x, 0, -1).reshape(-1, 3)


def _chem_writeback(spec, s, d):
    """Install a lattice's chemical kernel outputs into its state dict."""
    s["nt$t"] = _back3(d.ntt)
    s["rec$r"] = _back3(d.recr)
    s["rec$current"] = _back3(d.reccur)
    if spec.chem[0] == "dopaglugaba":
        s["rec$r2"] = _back3(d.recr2)
        s["rec$inh_modifier"] = d.inh.reshape(-1)
        s["rec$nmda_modifier"] = d.nmda.reshape(-1)


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


def plain_stdp_lattice_spec(lat):
    """Single-lattice NetSpec for a PLAIN ``Lattice`` with STDP plasticity
    (BASELINE's "STDP exc/inh lattice" config; VERDICT r04 task 6), or
    None when outside the fused class.  The kernel's 'plastic' lattice
    kind already implements intra-stencil STDP for networks — this routes
    the standalone runtime through the same machinery.  Emission (grid
    histories) follows the plain-network rules: izhikevich only."""
    from ..core.plasticity import STDP
    mk = _model_kind(lat.model)
    if (mk is None or not lat.electrical_synapse or lat.chemical_synapse
            or getattr(lat, "mesh", None) is not None
            or not _stencil_ok(lat.graph, (lat.rows, lat.cols))
            or type(lat.plasticity) is not STDP):
        return None
    emit = bool(lat.update_grid_history)
    if emit and (mk != "izhikevich"
                 or lat.grid_history.kind not in ("grid", "average",
                                                  "eeg", "spikes")):
        return None
    spec = NetSpec((LatSpec("plastic", lat.graph.offsets, mk,
                            (lat.rows, lat.cols), emit=emit),),
                   (), (), False)
    return spec if supports_shapes(spec) else None


@functools.lru_cache(maxsize=None)
def _build_fused_lattice_runner(spec):
    """Jitted standalone-lattice runner (everything — marshalling, uniform
    generation, the chunk scan, write-back reshapes — in ONE device
    program; eager per-call device ops each pay tunnel dispatch latency).
    jit re-traces per rewards length, like the XLA runners' static
    ``length``."""

    def impl(state, graph, trace, dopamine, key, clock, rewards, rp):
        ls = spec.lattices[0]
        lat_data = (_lat_data(spec, 0, state, graph, trace),)
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
    """MODEL_PARAM_KEYS key for a supported neuron model, else None.

    `DopaIzhikevich` (the lixirnet flagship, models/dopa.py) has deltas and
    spike handling identical to `Izhikevich` — only its receptor system
    differs, which `_chem_spec` carries separately — so it shares the
    izhikevich kernel class."""
    from ..models.integrate_and_fire import (
        Izhikevich, AdaptiveLeakyIntegrateAndFire, LeakyIntegrateAndFire)
    from ..models.dopa import DopaIzhikevich
    return {Izhikevich: "izhikevich",
            DopaIzhikevich: "izhikevich",
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
            _lat_data(spec, k, states[k], graphs[k], traces[k])
            for k in range(len(spec.lattices)))
        tr_data = tuple(_train_data(st_states[k], *spec.trains[k].shape,
                                    ts=spec.trains[k])
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
            if spec.chem:
                _chem_writeback(spec, s, d)
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
            if ts.nt:
                s["nt$t"] = _back3(d.ntt)
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


DENSE_N_MAX = 512      # dense intra/conn matrices: N^2 VMEM entries


def _chem_spec(model):
    """(family, rec_kind, nt_kind) for a supported chemical model config,
    else None (unsupported receptor system / kinetics)."""
    from .receptors import IonotropicReceptors, DopaGluGABAReceptors
    fam = {IonotropicReceptors: "ionotropic",
           DopaGluGABAReceptors: "dopaglugaba"}.get(type(model.receptors))
    if fam is None:
        return None
    rec_kind = model.receptors.kinetics
    nt_kind = model.nt_kinetics
    if rec_kind not in REC_KINDS or nt_kind not in NT_KINDS:
        return None
    return (fam, rec_kind, nt_kind)


def _graph_kind(lat):
    """Kernel intra-graph class for a lattice, else None."""
    from .graph import StencilGraph, DenseGraph, SparseGraph
    g = lat.graph
    if isinstance(g, StencilGraph) and tuple(g.shape) == (lat.rows,
                                                          lat.cols):
        return "stencil"
    if isinstance(g, DenseGraph) and g.n_pre == g.n_post == lat.n \
            and lat.n <= DENSE_N_MAX:
        return "dense"
    if isinstance(g, SparseGraph) and int(g.src.shape[0]) == 0:
        return "none"
    return None


def plain_network_runner(net, plan, skip_nt, length, hist=(), st_nt=()):
    """Fused runner for `core.structured.run_structured` (plain
    LatticeNetwork; same call and return signature as
    `_build_structured_runner`'s runner), or None when unsupported.

    Supported class mirrors `network_runner` minus the reward machinery:
    Izhikevich/ALIF/LIF lattices, Poisson/Rate trains, STDP plasticity,
    with two graph layouts:

    * GRID mode — StencilGraph (or edgeless) intra graphs, MIXED grid
      shapes, one-to-one and resample connections;
    * FLAT mode — any lattice with a DENSE intra graph (Hopfield-style
      `connect`, N <= DENSE_N_MAX) switches the whole network to a (1, N)
      row layout where intra gathers and dense inter-lattice blocks are
      HIGHEST-precision MXU matmuls; one-to-one connections stay
      elementwise.  No plasticity (dense-edge STDP needs transposes that
      do not lower in Mosaic).

    CHEMICAL networks (``net.chemical_synapse``, the reference's flagship
    DopaGluGABA-Izhikevich Bayesian/dopamine pipelines — GPU runtime
    `gpu_lattices/mod.rs:2585+`) are fused too: per-type NT concentration
    planes, receptor kinetics + ligand currents + NT release in-body
    (Ionotropic and DopaGluGABA families, all four kinetics).  ``st_nt``
    carries the per-train NT-presence flags (st_ids order).

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
    chem = ()
    if net.chemical_synapse:
        model0 = lattices[0].model
        chem = _chem_spec(model0)
        if chem is None:
            return None
        # phase B steps every lattice with lattices[0].model (structured
        # runner semantics); chemical configs must share it exactly
        if any(lat.model != model0 for lat in lattices):
            return None
    elif not (net.electrical_synapse and skip_nt):
        return None
    if getattr(net, "mesh", None) is not None \
            or any(getattr(l, "mesh", None) is not None for l in lattices):
        return None                     # sharded nets stay on GSPMD/XLA
    lat_index = {i: k for k, i in enumerate(lat_ids)}
    st_index = {i: k for k, i in enumerate(st_ids)}

    graph_kinds = [_graph_kind(lat) for lat in lattices]
    if any(g is None for g in graph_kinds):
        return None
    conn_kinds = []
    for entry in plan["conns"]:
        ok = entry["op"].kind
        conn_kinds.append(ok[0] if isinstance(ok, tuple) else ok)
    flat = "dense" in graph_kinds or "dense" in conn_kinds
    if flat and ("stencil" in graph_kinds or "resample" in conn_kinds):
        return None                     # mixed layouts: XLA

    emit_ks = set()
    hist_info = []
    for (i, kind, sig, gshape) in hist:
        if i not in lat_index or kind not in ("grid", "average", "eeg",
                                              "spikes"):
            return None
        emit_ks.add(lat_index[i])
        hist_info.append((lat_index[i], i, kind, sig, gshape))
    lat_models, lat_kind, shapes = [], [], []
    for k, lat in enumerate(lattices):
        mk = _model_kind(lat.model)
        if mk is None:
            return None
        if chem and "c_m" not in MODEL_PARAM_KEYS[mk]:
            return None     # receptor_dv needs dt / c_m planes
        shape_l = (1, lat.n) if flat else (lat.rows, lat.cols)
        if k in emit_ks and mk != "izhikevich":
            return None     # v_pre reconstruction is izhikevich-only
        lat_models.append(mk)
        lat_kind.append("plastic" if lat.do_plasticity else "plain")
        shapes.append(shape_l)
    if any(k == "plastic" for k in lat_kind):
        if flat:
            return None     # dense-edge STDP: no Mosaic transpose
        if type(net._plasticity()) is not STDP:
            return None
    st_model = sts[0].model if sts else None
    tr_specs = []
    for j, s in enumerate(sts):
        ts = _train_spec(s, st_model)
        if ts is None:
            return None
        if flat:
            ts = ts._replace(shape=(1, s.n))
        if chem and j < len(st_nt) and st_nt[j]:
            ts = ts._replace(nt=st_model.nt_kinetics)
            if st_model.nt_kinetics not in NT_KINDS:
                return None
        tr_specs.append(ts)
    do_plast = [k == "plastic" for k in lat_kind]
    conn_specs, keep = [], []
    for ei, entry in enumerate(plan["conns"]):
        pre_is_st = entry["pre_is_st"]
        pre_k = st_index[entry["pre"]] if pre_is_st \
            else lat_index[entry["pre"]]
        post_k = lat_index[entry["post"]]
        pre_shape = tr_specs[pre_k].shape if pre_is_st else shapes[pre_k]
        op_kind = entry["op"].kind
        if op_kind == "empty":
            continue        # zero contribution: drop from the kernel spec
        if op_kind == "one2one":
            if pre_shape != shapes[post_k]:
                return None     # flat-index identity needs aligned planes
            op = ("one2one",)
        elif op_kind == "dense":
            n_pre = entry["op"].w0.shape[0]
            if n_pre > DENSE_N_MAX:
                return None
            op = ("dense",)
        elif isinstance(op_kind, tuple) and op_kind[0] == "resample":
            # static = (R1, C1, R2, C2, fr, fc, taps); plane shapes are
            # guaranteed by ResampleBlock's construction
            if chem:
                return None     # resampled chemical gather: not fused yet
            op = op_kind
        else:
            return None
        # plain-network connection visits (structured runner gated_delta):
        # count = pre_spiking * pre_plastic + post_spiking * post_plastic
        pre_plastic = (not pre_is_st) and do_plast[pre_k]
        post_plastic = do_plast[post_k]
        keep.append(ei)
        conn_specs.append(ConnSpec(
            pre_is_st, pre_k, post_k, False, 0,
            pre_plastic, post_plastic, pre_plastic or post_plastic, op))
    spec = NetSpec(tuple(LatSpec(k, lat.graph.offsets if g == "stencil"
                                 else (), mk, sh, emit=ki in emit_ks,
                                 graph=g)
                         for ki, (k, lat, mk, sh, g) in enumerate(
                             zip(lat_kind, lattices, lat_models, shapes,
                                 graph_kinds))),
                   tuple(tr_specs), tuple(conn_specs), False,
                   electrical=bool(net.electrical_synapse), chem=chem)
    if not supports_shapes(spec):
        return None
    return _build_fused_plain_runner(spec, int(length), tuple(hist_info),
                                     tuple(keep))


@functools.lru_cache(maxsize=None)
def _build_fused_plain_runner(spec, length, hist_info=(), keep=()):
    """Jitted plain-network runner (signature of
    `core.structured._build_structured_runner`'s `run`).

    ``hist_info`` entries (lat_k, lat_id, kind, sig, gshape) turn the
    emitted per-step v_pre planes into the same ys dict the XLA runner
    returns: spikes/post-reset v are reconstructed with the identical ops
    the kernel used (spk = v_pre >= v_th; v = where(spk, c, v_pre)) —
    exact.

    ``keep`` maps the spec's conn index -> the caller's plan-order conn
    index: empty-op connections are dropped from the kernel spec but their
    ``conn_ws`` slots must pass through the runner unchanged (they are
    donated jit inputs and the structured writeback re-adopts every slot).
    """
    import math as _math

    n_conns = len(spec.conns)
    keep = tuple(keep) if keep else tuple(range(n_conns))
    emit_order = [k for k, ls in enumerate(spec.lattices) if ls.emit]

    def impl(states, st_states, graphs, conn_ws, conn_aux, key, clock,
             pparams):
        lat_data = tuple(
            _lat_data(spec, k, states[k], graphs[k], None)
            for k in range(len(spec.lattices)))
        tr_data = tuple(_train_data(st_states[k], *spec.trains[k].shape,
                                    ts=spec.trains[k])
                        for k in range(len(spec.trains)))
        cn_data = tuple(
            _conn_data(conn_ws[keep[ci]], conn_aux[keep[ci]],
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
            if spec.chem:
                _chem_writeback(spec, s, d)
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
            if ts.nt:
                s["nt$t"] = _back3(d.ntt)
            new_st.append(s)
        # resample weights keep their (n_taps, R2, C2) plane layout
        # (ResampleBlock.w0), dense weights their (n_pre, n_post) matrix;
        # one2one weights go back to flat vectors.  Dropped (empty-op)
        # plan slots pass through unchanged.
        new_conn_ws = list(conn_ws)
        for ci in range(n_conns):
            w = cn_data[ci].w
            if spec.conns[ci].op[0] not in ("resample", "dense"):
                w = w.reshape(-1)
            new_conn_ws[keep[ci]] = w
        new_conn_ws = tuple(new_conn_ws)
        ys = {}
        for (lat_k, lat_id, kind, sig, gshape) in hist_info:
            v_pre = emits[emit_order.index(lat_k)]   # (length, R, C)
            R, C = spec.lattices[lat_k].shape
            spk = v_pre >= states[lat_k]["v_th"].reshape(R, C)[None]
            if kind == "spikes":
                # gshape is the lattice's USER-facing grid shape — flat
                # (1, N) kernel layouts reshape back to (rows, cols)
                ys[("lat", lat_id)] = spk.reshape((length,) + gshape)
                continue
            v_post = jnp.where(spk, states[lat_k]["c"].reshape(R, C)[None],
                               v_pre)
            if kind == "grid":
                ys[("lat", lat_id)] = v_post.reshape((length,) + gshape)
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
