"""Single-lattice simulation runtime.

TPU-native rebuild of the reference's `Lattice` CPU runtime
(`/root/reference/backend/src/neuron/mod.rs:556-1219`) and its OpenCL mirror
(`gpu_lattices/mod.rs:327-1064`), redesigned for XLA:

* the cell grid is one struct-of-arrays state pytree resident in HBM;
* the reference's two-phase step — Phase A gathers all synaptic inputs from
  the *previous* state (neuron/mod.rs:1035-1050), Phase B updates all
  neurons — becomes gather ops + a fused vectorized model step;
* `run_lattice(iterations)` is a `lax.scan` jitted once per (model config,
  graph type, flags); state is donated so iteration is fully in-place on
  device, eliminating the reference GPU path's per-run host round trip
  (gpu_lattices/mod.rs:792/887);
* histories are scan outputs, pulled to host in chunks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.graph import (SparseGraph, StencilGraph, connect_dense,
                         dense_to_stencil, radius_offsets)
from ..models.base import NEVER, get_neurotransmitter_concentrations
from .history import GridVoltageHistory
from .plasticity import STDP
from ..errors import GraphError


def _mask_any(mask):
    """Host bool of mask.any(). Computed as an f32 sum: boolean cross-element
    reductions at >=512x512 sizes fail with ResourceExhausted on the tunneled
    TPU backend."""
    return jnp.sum(mask.astype(jnp.float32)) > 0.0


AUTO_UNROLL_MAX_N = 1 << 20


def resolve_pallas(setting):
    """Resolve a `use_pallas` setting.

    None = auto (the default): the fused Mosaic kernels engage on TPU
    wherever a `supports()` gate passes — they ARE the product fast path,
    mirroring the reference's contract that the GPU classes are the fast
    path (interface_gpu/lixirnet/src/lattices/mod.rs:314) — and stay off
    on CPU, where they would run in slow interpret mode while the XLA
    path is both faster and the golden reference.  Explicit True/False
    overrides (tests set True to exercise the kernels in interpret mode,
    bench.py sets False for its XLA comparison rows)."""
    if setting is None:
        return jax.default_backend() == "tpu"
    return bool(setting)


def resolve_unroll(setting, n):
    """Resolve a `scan_unroll` setting for an n-neuron step loop.

    None = auto: 4-way unroll up to ~1M neurons (amortizes the per-step
    multi-kernel loop overhead floor; measured wins at 64^2..512^2 on v5e),
    rolled above (4.2M-neuron grids regress ~2x when unrolled).  Unrolled
    loops are bit-exact vs rolled (pure scheduling), so the
    ``SNN_TPU_SCAN_UNROLL`` env var may force a global value — the test
    suite sets 1 to shrink XLA:CPU compile times (the dominant test cost
    on a single-core CI host)."""
    if setting is None:
        import os
        env = os.environ.get("SNN_TPU_SCAN_UNROLL")
        if env:
            return max(1, int(env))
        return 4 if n <= AUTO_UNROLL_MAX_N else 1
    return max(1, int(setting))


class Lattice:
    """A 2-D grid of one neuron model plus a weighted synapse graph.

    API mirrors the reference `Lattice` (populate / connect / apply /
    run_lattice / histories, neuron/mod.rs:556-1219).
    """

    def __init__(self, model, id=0):
        self.model = model
        self.id = id
        self.state = None
        self.graph = None
        self.rows = self.cols = 0
        self.electrical_synapse = True
        self.chemical_synapse = False
        self.do_plasticity = False
        self.plasticity = STDP()
        self.update_grid_history = False
        self.grid_history = GridVoltageHistory()
        self.update_graph_history = False
        self.graph_history = []
        self.internal_clock = 0
        self.key = jax.random.PRNGKey(0)
        # None = auto (core/history.resolve_history_chunk): one chunk
        # whenever the history ys buffer fits ~64 MB on device
        self.history_chunk = None
        self.in_network = False
        self.mesh = None  # set by shard(); informational
        # lax.scan unroll factor for the step loop: >1 replicates the step
        # body to amortize the per-iteration loop overhead (~15-25us
        # multi-kernel floor per step on v5e).  None = auto: 4 up to ~1M
        # neurons (53.7->48us/step at 512x512, +15-42%% on chemical/R-STDP
        # rows), 1 above (4.2M-neuron grids regress ~2x when unrolled)
        self.scan_unroll = None
        # fused Pallas kernels for the electrical Izhikevich+stencil /
        # HH-chemical hot paths (ops/pallas_stencil.py, ops/pallas_hh.py).
        # None = auto: on by default on TPU, off on CPU (resolve_pallas)
        self.use_pallas = None
        # which backend the last _run_chunk used (observability):
        # False | True | "hh" | ("multi", emit) | ("tiled", ...) | ("model",)
        self._last_run_fused = False

    # -- construction ---------------------------------------------------------
    @property
    def n(self):
        return self.rows * self.cols

    def populate(self, rows, cols, **overrides):
        """`Lattice::populate` (neuron/mod.rs:1105-1126): (re)build the cell
        grid from the base model; state fields can be overridden per neuron.

        The fresh state stays as HOST NumPy arrays until the first run entry
        point ships it in one batched transfer (utils/transfer
        .ensure_device_state) — eager per-lattice shipping paid ~55 ms of
        relay round trips per lattice over the TPU tunnel.  All host-visible
        mutators (apply / set_dt / reset_timing / insert) are residency-
        agnostic, so the deferral is invisible to callers."""
        if self.in_network and (rows, cols) != (self.rows, self.cols):
            raise GraphError(
                "dimensions must match when lattice is in a network")
        self.rows, self.cols = rows, cols
        from ..utils.transfer import host_state_view
        self.state = host_state_view(
            self.model.init_state_host(rows * cols, **overrides))
        # zero-edge default graph; `connect` replaces it (a dense default
        # would allocate (N, N) -- 274 GB at 512x512)
        self.graph = SparseGraph.empty(self.n)

    # retained name from when host-side init was opt-in (lixirnet callers)
    populate_host = populate

    def connect(self, connecting_conditional, weight_logic=None):
        """`Lattice::connect` (neuron/mod.rs:1134-1157). O(N^2) host-side;
        for big lattices prefer `connect_stencil` / `set_graph`.

        Radius-style predicates (small offset support) are decomposed into
        a StencilGraph automatically — shifted adds instead of an (N, N)
        matvec.  Evaluation AND decomposition run host-side; only the
        final representation ships (one packed transfer)."""
        from ..ops.graph import connect_auto
        self.graph = connect_auto(self.rows, self.cols,
                                  connecting_conditional, weight_logic)

    def falliable_connect(self, connecting_conditional, weight_logic=None):
        """`falliable_connect` (neuron/mod.rs:1165-1196): same as `connect`;
        Python callables signal failure by raising, which propagates."""
        self.connect(connecting_conditional, weight_logic)

    def connect_stencil(self, radius=None, offsets=None, weight_fn=None,
                        keep_prob=1.0, seed=0):
        """Translation-local connectivity as a `StencilGraph` — the fast path
        for the reference's radius-style `connection_conditional`
        (backend/examples/lattice/main.rs:18-23)."""
        if offsets is None:
            offsets = radius_offsets(radius)
        self.graph = StencilGraph.build(self.rows, self.cols, offsets,
                                        weight_fn=weight_fn,
                                        keep_prob=keep_prob, seed=seed)

    def set_graph(self, graph):
        if graph.n_post != self.n:
            raise GraphError("graph does not match lattice dimensions")
        self.graph = graph

    def shard(self, mesh, axis="tp"):
        """Shard this lattice's state + adjacency across a device mesh
        (row-block model parallelism; parallel/lattice_sharding.py).  Call
        after `populate`/`connect`; subsequent `run_lattice` calls compile
        to SPMD programs whose halo exchanges ride ICI."""
        from ..parallel.lattice_sharding import shard_lattice
        return shard_lattice(self, mesh, axis)

    # -- per-edge graph access (Graph trait, graph/mod.rs:42-72) -------------
    def _flat(self, pos):
        r, c = pos
        if not (0 <= r < self.rows and 0 <= c < self.cols):
            raise GraphError(f"position {pos} not in lattice")
        return r * self.cols + c

    def lookup_weight(self, presynaptic, postsynaptic):
        """Weight of the synapse pre -> post, or None if unconnected
        (`Graph::lookup_weight`); positions are (row, col) tuples."""
        return self.graph.lookup_weight(self._flat(presynaptic),
                                        self._flat(postsynaptic))

    def edit_weight(self, presynaptic, postsynaptic, weight):
        """Set (or with None: remove) one synapse (`Graph::edit_weight`)."""
        self.graph = self.graph.edit_weight(self._flat(presynaptic),
                                            self._flat(postsynaptic), weight)

    def get_incoming_connections(self, pos):
        """Presynaptic (row, col) positions of `pos`
        (`Graph::get_incoming_connections`)."""
        flat = self.graph.get_incoming_connections(self._flat(pos))
        return {(i // self.cols, i % self.cols) for i in flat}

    def get_outgoing_connections(self, pos):
        flat = self.graph.get_outgoing_connections(self._flat(pos))
        return {(i // self.cols, i % self.cols) for i in flat}

    # -- per-neuron mutation (`apply` / `apply_given_position`,
    #    neuron/mod.rs:424-452) ------------------------------------------------
    def apply(self, fn):
        """fn(state dict) -> state dict, operating on whole (N,) arrays."""
        self.state = dict(fn(dict(self.state)))

    def apply_given_position(self, fn):
        """fn(rr, cc, state) -> state; rr/cc are (N,) position index arrays."""
        rr, cc = np.meshgrid(np.arange(self.rows), np.arange(self.cols),
                             indexing="ij")
        self.state = dict(fn(jnp.asarray(rr.reshape(-1)),
                             jnp.asarray(cc.reshape(-1)), dict(self.state)))

    def set_dt(self, dt):
        """`Lattice::set_dt` (neuron/mod.rs:649-652)."""
        from ..utils.transfer import full_like
        self.state["dt"] = full_like(self.state["dt"], dt)
        self.plasticity.set_dt(dt)

    def reset_timing(self):
        """`impl_reset_timing!` (neuron/mod.rs:405-420)."""
        self.internal_clock = 0
        from ..utils.transfer import full_like
        self.state["last_firing_time"] = full_like(
            self.state["last_firing_time"], NEVER)

    def reset_history(self):
        self.grid_history.reset()
        self.graph_history.clear()

    # -- simulation -------------------------------------------------------------
    def _history_items(self):
        if not self.update_grid_history:
            return ()
        return (("grid", self.grid_history),)

    def run_lattice(self, iterations):
        """`RunLattice::run_lattice` (neuron/mod.rs:1209-1219)."""
        if iterations == 0 or (not self.electrical_synapse
                               and not self.chemical_synapse):
            return
        from ..utils.transfer import ensure_device_state
        self.state = ensure_device_state(self.state)  # lazy-populate ship
        from .history import history_step_bytes, resolve_history_chunk
        bps = 0
        if self.update_grid_history:
            bps += history_step_bytes(self.grid_history.kind, self.n)
        if self.update_graph_history:
            bps += 4 * int(self.graph.weights.size)
        hchunk = resolve_history_chunk(self.history_chunk, bps)
        remaining = iterations
        while remaining > 0:
            chunk = min(remaining, hchunk) \
                if (self.update_grid_history or self.update_graph_history) \
                else remaining
            self._run_chunk(chunk)
            remaining -= chunk

    def _run_chunk(self, length):
        # Static fast path: no neurotransmitters inserted -> skip the masked
        # no-op (N, K) concentration update inside the scan entirely.
        skip_nt = not bool(_mask_any(self.state["nt$mask"]))
        from ..ops import pallas_stencil
        # the fused kernels are single-device programs: a sharded lattice
        # (shard()) must stay on the GSPMD-partitioned XLA path
        use_pallas = (resolve_pallas(self.use_pallas)
                      and self.mesh is None and skip_nt
                      and pallas_stencil.supports(
                          self.model, self.graph, self.electrical_synapse,
                          self.chemical_synapse, self.do_plasticity))
        if use_pallas and not self.update_graph_history:
            # every history kind reads only v / is_spiking, so the multi-
            # step kernel can EMIT per-step planes and keep histories on
            hist_kinds = tuple(h.kind for _, h in self._history_items())
            emit = ()
            if any(k in ("grid", "average", "eeg") for k in hist_kinds):
                emit += ("v",)
            if "spikes" in hist_kinds:
                emit += ("spike",)
            if pallas_stencil.multistep_vmem_ok(self.graph,
                                                emit=1 if emit else 0):
                # whole-lattice-in-VMEM multi-step kernel: HBM traffic is
                # paid once per K steps (512x512: 21 us/step vs 45-52 XLA)
                use_pallas = ("multi", emit)
            elif not hist_kinds:
                # VMEM overflow (e.g. 2048x2048 radius-2 = ~200 MB of
                # weight planes): temporal-blocked row tiles amortize the
                # weight traffic K-fold; needs spatially uniform params
                cfg = pallas_stencil.multistep_tiled_config(self.graph)
                if cfg is not None \
                        and pallas_stencil.uniform_lattice_params(self.state):
                    use_pallas = ("tiled",) + cfg
        if use_pallas is True and not pallas_stencil.step_kernel_ok(self.graph):
            # per-step kernel can't lay these cols out as (rows, L, 128):
            # fall back to the XLA stencil path rather than miscompile
            use_pallas = False
        if not use_pallas and resolve_pallas(self.use_pallas) \
                and self.mesh is None \
                and not self._history_items() \
                and not self.update_graph_history:
            # fused multi-step HH chemical kernel (ops/pallas_hh.py)
            from ..ops import pallas_hh
            if pallas_hh.supports(self.model, self.graph,
                                  self.chemical_synapse, self.do_plasticity,
                                  self.plasticity):
                use_pallas = "hh"
            elif skip_nt and pallas_stencil.supports_model(
                    self.model, self.graph, self.electrical_synapse,
                    self.chemical_synapse, self.do_plasticity) \
                    and pallas_stencil.model_multistep_vmem_ok(
                        self.graph, self.model):
                # generic traced-step multi-step kernel: the model's own
                # step() (incl. DSL-built models) IS the kernel body
                use_pallas = ("model",)
        if not use_pallas and resolve_pallas(self.use_pallas) \
                and self.mesh is None and skip_nt and self.do_plasticity \
                and not self.update_graph_history:
            # plain Lattice + STDP: the reward kernel family's 'plastic'
            # lattice class fuses intra-stencil STDP (VERDICT r04 task 6);
            # grid histories ride along as emitted v_pre planes
            from ..ops import pallas_reward
            pspec = pallas_reward.plain_stdp_lattice_spec(self)
            if pspec is not None:
                use_pallas = ("stdp", pspec)
        if not use_pallas and resolve_pallas(self.use_pallas) \
                and self.mesh is not None and skip_nt \
                and not self._history_items() \
                and not self.update_graph_history \
                and pallas_stencil.supports(
                    self.model, self.graph, self.electrical_synapse,
                    self.chemical_synapse, self.do_plasticity):
            # SHARDED fused path: the multi-step kernel per row-block
            # shard inside shard_map, ghost rows via ppermute (relaxes
            # the historical mesh-is-None gate for this class)
            cfg = pallas_stencil.sharded_multistep_config(self.graph,
                                                          self.mesh)
            if cfg is not None:
                use_pallas = (("sharded", self.mesh,
                               self.mesh.axis_names[0]) + cfg)
        # observability (mirrors the structured/reward runners): which
        # backend this chunk ran on — False/True/"hh"/("multi", ...)/
        # ("tiled", ...)/("model",)/("stdp", spec)/("sharded", ...)
        self._last_run_fused = bool(use_pallas) and use_pallas
        runner = _build_lattice_runner(
            self.model, type(self.graph), self.electrical_synapse,
            self.chemical_synapse, self.do_plasticity, type(self.plasticity),
            tuple((name, h.kind, _freeze(h)) for name, h in self._history_items()),
            self.update_graph_history, (self.rows, self.cols), length, skip_nt,
            use_pallas, resolve_unroll(self.scan_unroll, self.n))
        pparams = {k: jnp.float32(v) for k, v in self.plasticity.params.items()}
        try:
            state, graph, key, clock, ys = runner(
                self.state, self.graph, self.key,
                jnp.int32(self.internal_clock), pparams)
        except Exception:
            if not (isinstance(use_pallas, tuple)
                    and use_pallas[0] == "model"):
                raise
            if self.model.config_key() in pallas_stencil._MODEL_KERNEL_RAN:
                # this model's kernel has EXECUTED before, so the failure
                # is a runtime error (e.g. a transient relay hiccup), not
                # a Mosaic lowering failure: donated buffers may already
                # be invalidated, so retrying with self.state is unsafe,
                # and blocklisting would permanently punish a transient.
                raise
            # Mosaic couldn't lower this model's traced step (an op outside
            # the proven-lowerable surface): route this model config to the
            # XLA path permanently and retry.  Compile failures raise before
            # any buffer is executed/donated, so self.state is still valid.
            pallas_stencil.block_model_kernel(self.model)
            self._last_run_fused = False
            runner = _build_lattice_runner(
                self.model, type(self.graph), self.electrical_synapse,
                self.chemical_synapse, self.do_plasticity,
                type(self.plasticity),
                tuple((name, h.kind, _freeze(h))
                      for name, h in self._history_items()),
                self.update_graph_history, (self.rows, self.cols), length,
                skip_nt, False, resolve_unroll(self.scan_unroll, self.n))
            state, graph, key, clock, ys = runner(
                self.state, self.graph, self.key,
                jnp.int32(self.internal_clock), pparams)
        else:
            if isinstance(use_pallas, tuple) and use_pallas[0] == "model":
                pallas_stencil._MODEL_KERNEL_RAN.add(
                    self.model.config_key())
        self.state, self.graph, self.key = state, graph, key
        self.internal_clock += length
        for name, hist in self._history_items():
            hist.extend(ys[name])
        if self.update_graph_history:
            self.graph_history.extend(np.asarray(ys["__weights__"]))

    def update(self):
        """UnsupervisedAgent impl (neuron/mod.rs:1256-1262): one step."""
        self.run_lattice(1)

    # -- views ---------------------------------------------------------------
    def voltages(self):
        return np.asarray(self.state["v"]).reshape(self.rows, self.cols)

    def field(self, name):
        arr = np.asarray(self.state[name])
        if arr.ndim == 1 and arr.shape[0] == self.n:
            return arr.reshape(self.rows, self.cols)
        return arr


def lattice_step(model, electrical, chemical, do_plasticity, skip_nt,
                 plasticity, pparams, state, graph, clock):
    """One single-lattice step (Phase A gather + model update + deferred
    plasticity; neuron/mod.rs:884-982).  Pure; shared by the lattice runner
    and the fused environment loop (interactable.JitEnvironment.run)."""
    if electrical:
        sub_v = jnp.ones_like(state["v"])
        elec = graph.gather_electrical(
            state["v"], sub_v, state["v"], state["gap_conductance"])
    else:
        elec = jnp.zeros_like(state["v"])

    if chemical:
        t, mask = get_neurotransmitter_concentrations(state)
        t_in, t_valid = graph.gather_chemical(t, mask.astype(jnp.float32))
        state, spikes = model.step(state, elec, t_in, t_valid,
                                   skip_nt=skip_nt)
    else:
        state, spikes = model.step(state, elec, skip_nt=skip_nt)

    state["last_firing_time"] = jnp.where(
        spikes, clock, state["last_firing_time"])

    if do_plasticity:
        graph = plasticity.apply(graph, state, pparams)

    return state, graph, clock + 1


def _freeze(hist):
    """Hashable signature of a history readout (for the jit cache)."""
    if hasattr(hist, "reference_voltage"):
        return (hist.kind, hist.reference_voltage, hist.distance,
                hist.conductivity)
    return (hist.kind,)


@functools.lru_cache(maxsize=None)
def _build_lattice_runner(model, graph_cls, electrical, chemical,
                          do_plasticity, plasticity_cls, history_sig,
                          graph_history, shape, length, skip_nt=False,
                          use_pallas=False, unroll=1):
    from .history import HISTORY_KINDS

    # Rebuild readout objects from their frozen signatures.
    readouts = []
    for name, kind, sig in history_sig:
        cls = HISTORY_KINDS[kind]
        h = cls(*sig[1:]) if len(sig) > 1 else cls()
        readouts.append((name, h))

    plasticity = plasticity_cls()

    if isinstance(use_pallas, tuple) and use_pallas[0] == "multi":
        # whole-lattice-in-VMEM multi-step kernel: the scan advances K
        # steps per kernel launch; per-step v/spike planes are EMITTED
        # from the kernel for history readouts when requested
        from ..ops import pallas_stencil
        _, emit = use_pallas
        K = 16

        def run_multi(state, graph, key, clock, pparams):
            n_outer, rem = divmod(length, K)

            def step(carry, _):
                st, ck = carry
                if emit:
                    st, hists = pallas_stencil.lattice_multistep(
                        model, st, graph, ck, K, emit)
                    return (st, ck + K), hists
                st = pallas_stencil.lattice_multistep(model, st, graph,
                                                      ck, K)
                return (st, ck + K), ()

            carry = (state, clock)
            parts = None
            if n_outer:
                carry, launch_ys = jax.lax.scan(step, carry, None,
                                                length=n_outer)
                if emit:
                    parts = {k: v.reshape((n_outer * K,) + v.shape[2:])
                             for k, v in launch_ys.items()}
            st, ck = carry
            if rem:
                if emit:
                    st, rem_hists = pallas_stencil.lattice_multistep(
                        model, st, graph, ck, rem, emit)
                    parts = rem_hists if parts is None else {
                        k: jnp.concatenate([parts[k], rem_hists[k]])
                        for k in parts}
                else:
                    st = pallas_stencil.lattice_multistep(model, st, graph,
                                                          ck, rem)
                ck = ck + rem
            ys = {}
            if emit:
                fields = {}
                if "v" in parts:
                    fields["v"] = parts["v"].reshape(length, -1)
                if "spike" in parts:
                    fields["is_spiking"] = \
                        parts["spike"].reshape(length, -1) > 0.0
                for name, h in readouts:
                    ys[name] = jax.vmap(
                        lambda f: h.readout(f, shape))(fields)
            return st, graph, key, ck, ys

        return jax.jit(run_multi, donate_argnums=(0,))

    if isinstance(use_pallas, tuple) and use_pallas[0] == "sharded":
        # multi-chip fused path (VERDICT r04 task 3): shard_map over the
        # 1-D row-block mesh; per launch each device ppermutes g ghost
        # rows from its neighbors and runs the unchanged VMEM-resident
        # multi-step kernel on its extended block, discarding the ghosts
        # (overlap-and-discard — bit-exact vs the single-device kernel,
        # see ops/pallas_stencil.sharded_multistep_config)
        from ..ops import pallas_stencil
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        _, mesh, ax, K, g = use_pallas
        n_dev = mesh.shape[ax]
        rows, cols = shape
        perm_dn = tuple((i, i + 1) for i in range(n_dev - 1))
        perm_up = tuple((i + 1, i) for i in range(n_dev - 1))
        PARAM_KEYS = ("a", "b", "c", "d", "v_th", "gap_conductance",
                      "tau_m", "c_m", "dt")

        def shard_fn(v, w, lft, spk, wst, ind, params, clock):
            idx = jax.lax.axis_index(ax)

            def ghost(x):
                # row-axis ghost exchange from the mesh neighbors.  At the
                # mesh EDGES the missing slab is filled with the block's
                # own boundary row: ppermute zero-fill would put zeros in
                # ghost in_deg / c_m / dt and the ghost-row updates would
                # produce NaN/inf, which 0-weight reads do NOT nullify
                # (0 * nan = nan).  Any FINITE fill is correct — boundary
                # destinations carry zero weights from StencilGraph.build,
                # so edge-ghost values never influence owned rows.
                top = jax.lax.ppermute(x[..., -g:, :], ax, perm_dn)
                bot = jax.lax.ppermute(x[..., :g, :], ax, perm_up)
                top = jnp.where(idx == 0,
                                jnp.broadcast_to(x[..., :1, :], top.shape),
                                top)
                bot = jnp.where(idx == n_dev - 1,
                                jnp.broadcast_to(x[..., -1:, :], bot.shape),
                                bot)
                return jnp.concatenate([top, x, bot], axis=-2)

            wste, inde = ghost(wst), ghost(ind)
            pe = tuple(ghost(p) for p in params)
            sl = slice(g, -g)

            def launch(carry, n_steps):
                v, w, lft, spk, ck = carry
                out = pallas_stencil.fused_izhikevich_multistep(
                    ghost(v), ghost(w), ghost(lft), wste, inde, *pe,
                    clock=ck, offsets=offsets, n_steps=n_steps)
                v2, w2, lft2, spk2 = out[:4]
                return (v2[sl], w2[sl], lft2[sl], spk2[sl],
                        ck + n_steps), ()

            n_outer, rem = divmod(length, K)
            carry = (v, w, lft, spk, clock)
            if n_outer:
                carry, _ = jax.lax.scan(
                    lambda c, _: launch(c, K), carry, None, length=n_outer)
            if rem:  # g >= halo * rem holds since rem < K
                carry, _ = launch(carry, rem)
            return carry[:4]

        pspec = P(ax, None)
        wspec = P(None, ax, None)

        def run_sharded(state, graph, key, clock, pparams):
            nonlocal offsets
            offsets = graph.offsets
            params = tuple(state[k].reshape(rows, cols) for k in PARAM_KEYS)
            fn = shard_map(
                shard_fn, mesh=mesh,
                in_specs=(pspec, pspec, pspec, pspec, wspec, pspec,
                          (pspec,) * len(PARAM_KEYS), P()),
                out_specs=(pspec, pspec, pspec, pspec), check_rep=False)
            v, w, lft, spk = fn(
                state["v"].reshape(rows, cols),
                state["w"].reshape(rows, cols),
                state["last_firing_time"].reshape(rows, cols),
                state["is_spiking"].reshape(rows, cols).astype(jnp.float32),
                graph.weights, graph.in_deg, params, clock)
            st = dict(state)
            st["v"] = v.reshape(-1)
            st["w"] = w.reshape(-1)
            st["last_firing_time"] = lft.reshape(-1)
            st["is_spiking"] = spk.reshape(-1) > 0.0
            return st, graph, key, clock + length, {}

        offsets = None
        return jax.jit(run_sharded, donate_argnums=(0,))

    if isinstance(use_pallas, tuple) and use_pallas[0] == "stdp":
        # plain STDP lattice through the reward kernel family's 'plastic'
        # class (ops/pallas_reward.py): the whole chunk — stencil gather,
        # model step, STDP visits, optional history emission — is one
        # fused multi-step kernel per 16 steps
        from ..ops import pallas_reward as _pr
        spec = use_pallas[1]
        ls0 = spec.lattices[0]

        def run_stdp(state, graph, key, clock, pparams):
            lat_data = (_pr._lat_data(spec, 0, state, graph, None),)
            rp = {k: jnp.float32(1.0) for k in _pr.RP_KEYS}
            lat_data, _, _, _, lat_spk, _, key, emits = _pr._advance(
                spec, length, lat_data, (), (), jnp.float32(0.0), clock,
                jnp.zeros((length,), jnp.float32), key, pparams, rp)
            d = lat_data[0]
            s = dict(state)
            s["v"] = d.v.reshape(-1)
            if "w" in s:
                s["w"] = d.w.reshape(-1)
            s["last_firing_time"] = d.lft.reshape(-1)
            s["is_spiking"] = lat_spk[0].reshape(-1) > 0.0
            if ls0.model in _pr.REFRACTORY_MODELS:
                s["refractory_count"] = d.refr.reshape(-1)
            out_graph = graph.replace_weights(d.wst)
            ys = {}
            if ls0.emit:
                # reconstruct post-reset v / spikes from the emitted
                # PRE-RESET planes with the kernel's own ops — exact
                # (see _build_fused_plain_runner)
                R, C = shape
                v_pre = emits[0]                       # (length, R, C)
                spk = v_pre >= state["v_th"].reshape(R, C)[None]
                v_post = jnp.where(spk,
                                   state["c"].reshape(R, C)[None], v_pre)
                fields = {"v": v_post.reshape(length, -1),
                          "is_spiking": spk.reshape(length, -1)}
                for name, h in readouts:
                    ys[name] = jax.vmap(
                        lambda f: h.readout(f, shape))(fields)
            return s, out_graph, key, clock + length, ys

        return jax.jit(run_stdp, donate_argnums=(0,))

    if isinstance(use_pallas, tuple) and use_pallas[0] == "model":
        # generic traced-step multi-step kernel (any elementwise model)
        from ..ops import pallas_stencil
        K = 16

        def run_model(state, graph, key, clock, pparams):
            n_outer, rem = divmod(length, K)

            def step(carry, _):
                st, ck = carry
                st = pallas_stencil.lattice_multistep_model(
                    model, st, graph, ck, K)
                return (st, ck + K), ()

            carry = (state, clock)
            if n_outer:
                carry, _ = jax.lax.scan(step, carry, None, length=n_outer)
            st, ck = carry
            if rem:
                st = pallas_stencil.lattice_multistep_model(
                    model, st, graph, ck, rem)
                ck = ck + rem
            return st, graph, key, ck, {}

        return jax.jit(run_model, donate_argnums=(0,))

    if use_pallas == "hh":
        # fused multi-step HH chemical kernel: whole lattice (state +
        # receptor/NT planes + weights) VMEM-resident for K steps
        from ..ops import pallas_hh
        K = 16

        def run_hh(state, graph, key, clock, pparams):
            n_outer, rem = divmod(length, K)

            def step(carry, _):
                st, gr, ck = carry
                st, gr = pallas_hh.lattice_multistep(
                    model, st, gr, ck, K, electrical, do_plasticity,
                    pparams)
                return (st, gr, ck + K), ()

            carry = (state, graph, clock)
            if n_outer:
                carry, _ = jax.lax.scan(step, carry, None, length=n_outer)
            st, gr, ck = carry
            if rem:
                st, gr = pallas_hh.lattice_multistep(
                    model, st, gr, ck, rem, electrical, do_plasticity,
                    pparams)
                ck = ck + rem
            return st, gr, key, ck, {}

        return jax.jit(run_hh, donate_argnums=(0,))

    if isinstance(use_pallas, tuple) and use_pallas[0] == "tiled":
        from ..ops import pallas_stencil
        _, tile_r, halo, K = use_pallas

        def run_tiled(state, graph, key, clock, pparams):
            wst_ov, ind_ov = pallas_stencil.tiled_overlap_weights(
                graph.weights, graph.in_deg, tile_r, halo)
            n_outer, rem = divmod(length, K)

            def step(carry, _):
                st, ck = carry
                st = pallas_stencil.lattice_multistep_tiled(
                    model, st, graph, wst_ov, ind_ov, ck, K, tile_r, halo)
                return (st, ck + K), ()

            carry = (state, clock)
            if n_outer:
                carry, _ = jax.lax.scan(step, carry, None, length=n_outer)
            st, ck = carry
            if rem:
                st = pallas_stencil.lattice_multistep_tiled(
                    model, st, graph, wst_ov, ind_ov, ck, rem, tile_r, halo)
                ck = ck + rem
            return st, graph, key, ck, {}

        return jax.jit(run_tiled, donate_argnums=(0,))

    def one_step(pparams, carry, _):
        state, graph, key, clock = carry

        if use_pallas:
            from ..ops import pallas_stencil
            state, spikes = pallas_stencil.lattice_step(
                model, state, graph, clock)
            clock = clock + 1
            ys = {name: h.readout(state, shape) for name, h in readouts}
            if graph_history:
                ys["__weights__"] = graph.weights
            return (state, graph, key, clock), ys

        state, graph, clock = lattice_step(
            model, electrical, chemical, do_plasticity, skip_nt, plasticity,
            pparams, state, graph, clock)

        ys = {name: h.readout(state, shape) for name, h in readouts}
        if graph_history:
            ys["__weights__"] = graph.weights
        return (state, graph, key, clock), ys

    def run(state, graph, key, clock, pparams):
        step = functools.partial(one_step, pparams)
        (state, graph, key, clock), ys = jax.lax.scan(
            step, (state, graph, key, clock), None, length=length,
            unroll=unroll)
        return state, graph, key, clock, ys

    return jax.jit(run, donate_argnums=(0, 1))
