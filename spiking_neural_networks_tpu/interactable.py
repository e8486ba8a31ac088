"""Agent / State / Environment wrappers for reward-driven simulation.

TPU-native rebuild of `/root/reference/backend/src/interactable/mod.rs`.
`RewardModulatedLattice` implements the Agent protocol
(`update_and_apply_reward` / `update`); `Lattice` / `LatticeNetwork`
implement the unsupervised protocol (`update == run 1 step`).
"""

from __future__ import annotations


def _agent_history_chunk(agent):
    """Resolved history chunk for a JitEnvironment agent
    (core/history.resolve_history_chunk; None = auto)."""
    from .core.history import history_step_bytes, resolve_history_chunk
    bps = 0
    if agent.update_grid_history:
        bps += history_step_bytes(agent.grid_history.kind, agent.n)
    if getattr(agent, "update_graph_history", False):
        bps += 4 * int(agent.graph.weights.size)
    return resolve_history_chunk(agent.history_chunk, bps)


class Environment:
    """`Environment` (interactable/mod.rs:21-60): agent + state + encoders.

    - ``state_encoder(state, agent)``: writes the environment state into the
      agent (e.g. sets spike-train rates / input currents).
    - ``reward_function(state, agent) -> float``: computes the reward.
    """

    def __init__(self, agent, state, state_encoder, reward_function=None):
        self.agent = agent
        self.state = state
        self.state_encoder = state_encoder
        self.reward_function = reward_function

    def run_with_reward(self, iterations):
        """`Environment::run_with_reward` (interactable/mod.rs:33-46)."""
        if self.reward_function is None:
            raise ValueError("run_with_reward requires a reward_function")
        for _ in range(iterations):
            reward = self.reward_function(self.state, self.agent)
            self.agent.update_and_apply_reward(reward)
            self.state.update_state(self.agent)
            self.state_encoder(self.state, self.agent)

    def run(self, iterations):
        """`Environment::run` (interactable/mod.rs:48-59)."""
        for _ in range(iterations):
            self.agent.update()
            self.state.update_state(self.agent)
            self.state_encoder(self.state, self.agent)


# Unsupervised variant (interactable/mod.rs:63-97): same loop without reward.
class UnsupervisedEnvironment(Environment):
    def __init__(self, agent, state, state_encoder):
        super().__init__(agent, state, state_encoder, reward_function=None)


class JitEnvironment:
    """Fully on-device closed loop: the reference's `run_with_reward`
    iteration (interactable/mod.rs:33-46) fused into ONE `lax.scan`.

    The host :class:`Environment` dispatches a device program per step —
    ~90 ms/step over a remote TPU link, milliseconds locally.  Here the
    environment state is a pytree of arrays and the three callbacks are
    PURE jax functions, so a whole episode compiles into a single device
    program (same design as the lattice runners):

    - ``reward_function(env_state, agent_state) -> f32 scalar``
    - ``update_state(env_state, agent_state) -> env_state``
    - ``state_encoder(env_state, agent_state) -> agent_state`` (write
      cues/drive into agent fields, e.g. ``state["v"]`` overrides)

    Per-step order matches the reference exactly: reward -> agent update
    (R-STDP double visit) -> state update -> encoder.  The agent must be a
    :class:`~.core.reward.RewardModulatedLattice`."""

    def __init__(self, agent, state, state_encoder, reward_function,
                 update_state):
        self.agent = agent
        self.state = state
        self.state_encoder = state_encoder
        self.reward_function = reward_function
        self.update_state = update_state
        # (iterations, flags, callbacks) -> jitted scan.  A small bounded
        # cache, not a single slot: history chunking builds TWO runners
        # per call (the chunk-length one and the tail-length one), and a
        # single slot would evict and rebuild both on every call; the
        # bound keeps variable-length episode sweeps from accumulating
        # compiled whole-episode executables without limit.
        self._runners = {}
        self._runners_max = 8
        # whether the most recent _build produced the fused Pallas agent
        # step (observability for tests/users)
        self.last_build_fused = False
        # whether the most recent _build fused the ENTIRE closed loop —
        # env callbacks included — into K-step kernel launches
        self.last_build_env_fused = False
        # callback flat/(R, C) equivalence verdicts, keyed by callbacks
        self._grid_ok_cache = {}

    def _build(self, iterations, skip_nt, hist_sig):
        import functools
        import jax
        import jax.numpy as jnp
        from .core.reward import reward_lattice_step
        from .core.lattice import resolve_unroll

        agent = self.agent
        model = agent.model
        electrical = agent.electrical_synapse
        chemical = agent.chemical_synapse
        do_modulation = agent.do_modulation
        unroll = resolve_unroll(agent.scan_unroll, agent.n)
        readout, shape = self._readout(hist_sig)

        # fused agent step: the R-STDP lattice update is kernel-COUNT
        # bound at closed-loop sizes (~45 serialized fusions per step,
        # see ops/pallas_reward.py); when the agent is in the fused class
        # the whole update runs as ONE chunk=1 Pallas launch per step,
        # with the env callbacks fused around it by XLA
        fused_spec = None
        env_fused = False
        from .core.lattice import resolve_pallas
        if resolve_pallas(getattr(agent, "use_pallas", None)) and skip_nt:
            from .ops import pallas_reward as _pr
            if _pr.supports_lattice(agent):
                cand = _pr.NetSpec(
                    (_pr.LatSpec("mod" if do_modulation else "plain",
                                 agent.graph.offsets,
                                 _pr._model_kind(model),
                                 (agent.rows, agent.cols)),),
                    (), (), True)
                # whole-loop fusion: env callbacks traced INTO K=16-step
                # kernel launches (the chunk=1 launch-per-step form pays
                # ~14 us/step of launch+carry cost; measured r4) — only
                # when the callbacks prove shape-polymorphic and
                # view-restricted (_grid_callbacks_ok)
                if (hist_sig is None and _pr.supports_shapes(cand)
                        and self._grid_callbacks_ok()):
                    fused_spec = cand
                    env_fused = True
                elif _pr.supports_shapes(cand, chunk=1):
                    fused_spec = cand
        self.last_build_fused = fused_spec is not None
        self.last_build_env_fused = env_fused

        if env_fused:
            core = self._env_fused_core(
                iterations, "mod" if do_modulation else "plain", agent,
                with_reward=True)

            def run_env(state, graph, trace, dopamine, clock, env, pparams):
                s, g, tr, dop, ck, env_out, rewards = core(
                    state, graph, trace, dopamine, clock, env, pparams)
                return (s, g, tr, dop, ck, env_out), {"reward": rewards}

            return jax.jit(run_env, donate_argnums=(0, 1, 2, 5))

        def fused_step(rparams, carry, _):
            from .ops import pallas_reward as _pr
            s, graph, trace, dopamine, clock, env = carry
            reward = self.reward_function(env, s)
            ls = fused_spec.lattices[0]
            pp_vec = jnp.stack([jnp.float32(rparams.get(k, 0.0))
                                for k in _pr.PP_KEYS])
            rp_vec = jnp.stack([jnp.float32(rparams[k])
                                for k in _pr.RP_KEYS])
            lat_data = (_pr._lat_data(fused_spec, 0, s, graph, trace),)
            outs = _pr._fused_chunk(
                fused_spec, 1, _pr._flat_inputs(
                    fused_spec, 1, lat_data, (), (), dopamine, clock,
                    jnp.reshape(reward, (1,)), (), pp_vec, rp_vec))
            lat_new, _, _, dopamine, lat_spk, _, _ = _pr._unflatten(
                fused_spec, outs, lat_data, (), ())
            d = lat_new[0]
            s = dict(s)
            s["v"] = d.v.reshape(-1)
            if "w" in s:
                s["w"] = d.w.reshape(-1)
            s["last_firing_time"] = d.lft.reshape(-1)
            s["is_spiking"] = lat_spk[0].reshape(-1) > 0.0
            if ls.model in _pr.REFRACTORY_MODELS:
                s["refractory_count"] = d.refr.reshape(-1)
            if ls.kind == "mod":
                graph = graph.replace_weights(d.wst)
                trace = dict(c=d.traces[0], dw=d.traces[1],
                             counter=d.traces[2])
            clock = clock + 1
            env = self.update_state(env, s)
            s = dict(self.state_encoder(env, s))
            ys = {"reward": reward}
            if readout is not None:
                ys["grid"] = readout.readout(s, shape)
            return (s, graph, trace, dopamine, clock, env), ys

        def one_step(pparams, carry, _):
            s, graph, trace, dopamine, clock, env = carry
            reward = self.reward_function(env, s)
            s, graph, trace, dopamine, clock = reward_lattice_step(
                model, electrical, chemical, do_modulation, True, skip_nt,
                pparams, s, graph, trace, dopamine, clock, reward)
            env = self.update_state(env, s)
            s = dict(self.state_encoder(env, s))
            ys = {"reward": reward}
            if readout is not None:
                ys["grid"] = readout.readout(s, shape)
            return (s, graph, trace, dopamine, clock, env), ys

        def run(state, graph, trace, dopamine, clock, env, pparams):
            step = functools.partial(
                fused_step if fused_spec is not None else one_step, pparams)
            carry, ys = jax.lax.scan(
                step, (state, graph, trace, dopamine, clock, env), None,
                length=iterations, unroll=unroll)
            return carry, ys

        return jax.jit(run, donate_argnums=(0, 1, 2, 5))

    def _env_fused_core(self, iterations, kind, agent, with_reward):
        """Shared whole-loop env-fusion body for the supervised (_build)
        and unsupervised (_build_unsupervised) runners: builds the
        NetSpec/EnvSpec, ships the lattice planes into
        pallas_reward._env_advance (env callbacks traced into K-step
        kernel launches), and writes the final planes back into the flat
        state dict.  The two callers differ only in reward/trace/dopamine
        handling, which is selected by ``kind`` / ``with_reward`` here so
        a write-back fix cannot silently apply to one loop form only."""
        import jax
        import jax.numpy as jnp
        from .ops import pallas_reward as _pr

        reward_fn = self.reward_function if with_reward else None
        mk = _pr._model_kind(agent.model)
        offsets = agent.graph.offsets
        R, C = agent.rows, agent.cols

        def core(state, graph, trace, dopamine, clock, env, pparams):
            leaves, treedef = jax.tree_util.tree_flatten(env)
            es = _pr.EnvSpec(reward_fn, self.update_state,
                             self.state_encoder, treedef, len(leaves))
            spec = _pr.NetSpec(
                (_pr.LatSpec(kind, offsets, mk, (R, C)),), (), (),
                with_reward)
            pp_vec = jnp.stack([jnp.float32(pparams.get(k, 0.0))
                                for k in _pr.PP_KEYS])
            if with_reward:
                rp_vec = jnp.stack([jnp.float32(pparams[k])
                                    for k in _pr.RP_KEYS])
            else:
                # rp is unused without reward/modulation; ones keep the
                # (dead) exp(-dt/tau) constants finite
                rp_vec = jnp.ones((len(_pr.RP_KEYS),), jnp.float32)
            lat_data = (_pr._lat_data(spec, 0, state, graph, trace),)
            spk0 = (state["is_spiking"].astype(jnp.float32)
                    .reshape(R, C),)
            env_vec = (jnp.stack([jnp.float32(x) for x in leaves])
                       if leaves else jnp.zeros((0,), jnp.float32))
            # launch size: semantically transparent (launch boundaries
            # don't change the math); small on CPU, where the unrolled
            # interpret-mode body compiles superlinearly in K
            lat_data, spk, dop, env_vec, rewards = _pr._env_advance(
                spec, es, iterations, lat_data, spk0, dopamine, clock,
                env_vec, pp_vec, rp_vec,
                chunk=(4 if jax.default_backend() == "cpu"
                       else _pr.DEFAULT_CHUNK))
            d = lat_data[0]
            s = dict(state)
            s["v"] = d.v.reshape(-1)
            if "w" in s:
                s["w"] = d.w.reshape(-1)
            s["last_firing_time"] = d.lft.reshape(-1)
            s["is_spiking"] = spk[0].reshape(-1) > 0.0
            if mk in _pr.REFRACTORY_MODELS:
                s["refractory_count"] = d.refr.reshape(-1)
            out_graph, out_trace = graph, trace
            if kind == "mod":
                out_graph = graph.replace_weights(d.wst)
                out_trace = dict(c=d.traces[0], dw=d.traces[1],
                                 counter=d.traces[2])
            elif kind == "plastic":
                out_graph = graph.replace_weights(d.wst)
            env_out = jax.tree_util.tree_unflatten(
                treedef, [env_vec[i] for i in range(len(leaves))])
            return (s, out_graph, out_trace, dop, clock + iterations,
                    env_out, rewards)

        return core

    def _grid_callbacks_ok(self):
        """Gate for the whole-loop in-kernel env fusion: verify the three
        callbacks are shape-polymorphic — calling them on flat (N,) state
        fields and on (R, C) planes of the SAME data gives the same
        numbers — read only the in-kernel view keys (v / w /
        last_firing_time / is_spiking / refractory_count), write only
        v / w / refractory_count, and that the env tree is f32 scalars.
        One jitted numeric probe per (callbacks, shape, env-structure)
        key; any mismatch or exception (KeyError on a non-view key,
        structure change, ...) routes the loop to the per-step paths."""
        import jax

        agent = self.agent
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        key = (self.reward_function, self.update_state, self.state_encoder,
               (agent.rows, agent.cols), treedef,
               tuple(jax.numpy.shape(x) for x in leaves))
        hit = self._grid_ok_cache.get(key)
        if hit is None:
            try:
                hit = self._probe_grid_callbacks(leaves, treedef)
            except Exception:
                hit = False
            self._grid_ok_cache[key] = hit
        return hit

    def _probe_grid_callbacks(self, env_leaves, treedef):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from .models.base import NEVER
        from .ops.pallas_reward import (REFRACTORY_MODELS, W_MODELS,
                                        _model_kind)

        for x in env_leaves:
            if jnp.shape(x) != () or not jnp.issubdtype(
                    jnp.result_type(x), jnp.floating):
                return False
        agent = self.agent
        R, C = agent.rows, agent.cols
        N = R * C
        kind = _model_kind(agent.model)
        # the probe view must mirror the kernel's sview_of EXACTLY: a
        # field the model doesn't carry (LIF has no "w") must be absent,
        # so a callback reading it fails the probe and the loop falls
        # back to the per-step tiers (where it raises the same KeyError)
        # instead of silently reading the kernel's dummy zero plane
        view_keys = ["v", "last_firing_time", "is_spiking"]
        if kind in W_MODELS:
            view_keys.append("w")
        if kind in REFRACTORY_MODELS:
            view_keys.append("refractory_count")
        writable = tuple(k for k in ("v", "w", "refractory_count")
                         if k in view_keys)

        def draw(seed):
            rng = np.random.default_rng(seed)
            flat = {
                "v": rng.uniform(-70, 30, N).astype(np.float32),
                "last_firing_time": np.where(
                    rng.random(N) < 0.3, NEVER,
                    rng.integers(0, 50, N)).astype(np.int32),
                "is_spiking": rng.random(N) < 0.2,
            }
            if "w" in view_keys:
                flat["w"] = rng.uniform(-10, 10, N).astype(np.float32)
            if "refractory_count" in view_keys:
                flat["refractory_count"] = rng.integers(
                    0, 5, N).astype(np.float32)
            env = jax.tree_util.tree_unflatten(
                treedef, [np.float32(rng.uniform(-1, 1))
                          for _ in env_leaves])
            return env, flat

        def probe(env, flat):
            s2d = {k: v.reshape(R, C) for k, v in flat.items()}
            if self.reward_function is None:       # unsupervised loop
                r1 = r2 = jnp.float32(0.0)
            else:
                r1 = self.reward_function(env, flat)
                r2 = self.reward_function(env, s2d)
            e1 = self.update_state(env, flat)
            e2 = self.update_state(env, s2d)
            n1 = dict(self.state_encoder(e1, flat))
            n2 = dict(self.state_encoder(e2, s2d))
            return r1, r2, e1, e2, n1, n2

        jp = jax.jit(probe)
        for seed in (11, 23):
            env, flat = draw(seed)
            r1, r2, e1, e2, n1, n2 = jp(env, flat)
            if jnp.shape(r1) != () or jnp.shape(r2) != ():
                return False
            if not np.allclose(r1, r2, rtol=1e-5, atol=1e-6):
                return False
            if (jax.tree_util.tree_structure(e1) != treedef
                    or jax.tree_util.tree_structure(e2) != treedef):
                return False
            for a, b in zip(jax.tree_util.tree_leaves(e1),
                            jax.tree_util.tree_leaves(e2)):
                if jnp.shape(a) != () or jnp.shape(b) != ():
                    return False
                if not np.allclose(a, b, rtol=1e-5, atol=1e-6):
                    return False
            if set(n1) != set(flat) or set(n2) != set(flat):
                return False
            for k in flat:
                a, b = np.asarray(n1[k]), np.asarray(n2[k])
                if a.shape != (N,) or b.shape != (R, C):
                    return False
                if k in writable:
                    if not np.allclose(a, b.reshape(-1),
                                       rtol=1e-5, atol=1e-6):
                        return False
                elif not (np.array_equal(a, flat[k])
                          and np.array_equal(b.reshape(-1), flat[k])):
                    # lft / is_spiking must pass through unmodified (the
                    # kernel derives them from the step, not the encoder)
                    return False
        return True

    def _cache(self, key, runner):
        """Insert into the bounded runner cache (FIFO eviction)."""
        if len(self._runners) >= self._runners_max:
            self._runners.pop(next(iter(self._runners)))
        self._runners[key] = runner
        return runner

    def _readout(self, hist_sig):
        """Rebuild the history readout object from its frozen signature
        (episodes stay ONE device program; the per-step readouts ride the
        scan ys and are drained to the host history after the run)."""
        if hist_sig is None:
            return None, None
        from .core.history import HISTORY_KINDS
        cls = HISTORY_KINDS[hist_sig[0]]
        h = cls(*hist_sig[1:]) if len(hist_sig) > 1 else cls()
        return h, (self.agent.rows, self.agent.cols)

    def _hist_sig(self):
        agent = self.agent
        if getattr(agent, "update_graph_history", False):
            raise ValueError(
                "JitEnvironment does not record graph (weight) histories; "
                "use the host-loop Environment for those")
        if getattr(agent, "update_grid_history", False):
            from .core.lattice import _freeze
            return _freeze(agent.grid_history)
        return None

    def run_with_reward(self, iterations):
        """Run `iterations` fused closed-loop steps; returns the per-step
        reward trace (host array).  Grid/EEG histories are recorded when
        ``agent.update_grid_history`` is set (chunked like the lattice
        runners)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from .core.lattice import _mask_any, resolve_pallas

        agent = self.agent
        from .utils.transfer import ensure_device_state
        agent.state = ensure_device_state(agent.state)  # lazy-populate ship
        hist_sig = self._hist_sig()
        skip_nt = not bool(_mask_any(agent.state["nt$mask"]))
        chunk = _agent_history_chunk(agent) if hist_sig is not None \
            else int(iterations)
        rewards_all = []
        remaining = int(iterations)
        while remaining > 0:
            length = min(remaining, chunk)
            # the callback OBJECTS are part of the cache key (not their
            # id()s, which CPython can reuse after GC): a swapped reward/
            # encoder function must retrace, not reuse stale traced code.
            # use_pallas + the graph's offsets select the fused step, so
            # they key the cache too (edit_weight can change the offsets)
            key = (length, skip_nt, agent.electrical_synapse,
                   agent.chemical_synapse, agent.do_modulation, hist_sig,
                   resolve_pallas(getattr(agent, "use_pallas", None)),
                   (agent.rows, agent.cols),
                   getattr(agent.graph, "offsets", None),
                   self.reward_function, self.update_state,
                   self.state_encoder,
                   # env structure selects / shapes the in-kernel env path
                   jax.tree_util.tree_structure(self.state))
            runner = self._runners.get(key)
            if runner is None:
                runner = self._cache(key, self._build(
                    length, skip_nt, hist_sig))
            pparams = {k: jnp.float32(v)
                       for k, v in agent.reward_modulator.params.items()}
            carry, ys = runner(
                agent.state, agent.graph, agent.trace,
                jnp.float32(agent.dopamine), jnp.int32(agent.internal_clock),
                self.state, pparams)
            s, graph, trace, dopamine, clock, env = carry
            agent.state, agent.graph, agent.trace = s, graph, trace
            self.state = env
            # ONE batched host pull: each separate float()/int()/asarray
            # pays a full relay round trip (~40-90 ms over the tunnel),
            # which dominates wall time for short episodes
            pulls = [dopamine, clock, ys["reward"]]
            if hist_sig is not None:
                pulls.append(ys["grid"])
            got = jax.device_get(pulls)
            agent.dopamine = float(got[0])
            agent.internal_clock = int(got[1])
            rewards_all.append(np.asarray(got[2]))
            if hist_sig is not None:
                agent.grid_history.extend(got[3])
            remaining -= length
        if not rewards_all:
            return np.zeros((0,), np.float32)
        return np.concatenate(rewards_all)

    # -- unsupervised fused loop (Environment::run, interactable/
    #    mod.rs:48-59): agent is a plain Lattice, no reward ----------------
    def _build_unsupervised(self, iterations, skip_nt, hist_sig):
        import functools
        import jax
        import jax.numpy as jnp
        from .core.lattice import lattice_step, resolve_unroll

        agent = self.agent
        model = agent.model
        electrical = agent.electrical_synapse
        chemical = agent.chemical_synapse
        do_plasticity = bool(agent.do_plasticity)
        plasticity = agent.plasticity
        unroll = resolve_unroll(agent.scan_unroll, agent.n)
        readout, shape = self._readout(hist_sig)

        # whole-loop fusion, unsupervised form: no reward/dopamine, the
        # encoder/update callbacks traced into K-step kernel launches
        env_fused = False
        from .core.lattice import resolve_pallas
        if (resolve_pallas(getattr(agent, "use_pallas", None)) and skip_nt
                and hist_sig is None):
            from .ops import pallas_reward as _pr
            if _pr.supports_plain_lattice(agent):
                kind = "plastic" if do_plasticity else "plain"
                cand = _pr.NetSpec(
                    (_pr.LatSpec(kind, agent.graph.offsets,
                                 _pr._model_kind(model),
                                 (agent.rows, agent.cols)),), (), (), False)
                if _pr.supports_shapes(cand) and self._grid_callbacks_ok():
                    env_fused = True
        self.last_build_fused = env_fused
        self.last_build_env_fused = env_fused

        if env_fused:
            core = self._env_fused_core(iterations, kind, agent,
                                        with_reward=False)

            def run_env(state, graph, clock, env, pparams):
                s, g, _, _, ck, env_out, _ = core(
                    state, graph, None, jnp.float32(0.0), clock, env,
                    pparams)
                return (s, g, ck, env_out), {}

            return jax.jit(run_env, donate_argnums=(0, 1, 3))

        def one_step(pparams, carry, _):
            s, graph, clock, env = carry
            s, graph, clock = lattice_step(
                model, electrical, chemical, do_plasticity, skip_nt,
                plasticity, pparams, s, graph, clock)
            env = self.update_state(env, s)
            s = dict(self.state_encoder(env, s))
            ys = {} if readout is None else {"grid": readout.readout(s,
                                                                     shape)}
            return (s, graph, clock, env), ys

        def run(state, graph, clock, env, pparams):
            step = functools.partial(one_step, pparams)
            carry, ys = jax.lax.scan(
                step, (state, graph, clock, env), None, length=iterations,
                unroll=unroll)
            return carry, ys

        return jax.jit(run, donate_argnums=(0, 1, 3))

    def run(self, iterations):
        """Unsupervised fused loop: agent step -> state update -> encoder
        per step, one device program; agent is a plain :class:`Lattice`.
        Grid/EEG histories are recorded when set (chunked)."""
        import jax
        import jax.numpy as jnp
        from .core.lattice import _mask_any, resolve_pallas

        agent = self.agent
        from .utils.transfer import ensure_device_state
        agent.state = ensure_device_state(agent.state)  # lazy-populate ship
        hist_sig = self._hist_sig()
        skip_nt = not bool(_mask_any(agent.state["nt$mask"]))
        chunk = _agent_history_chunk(agent) if hist_sig is not None \
            else int(iterations)
        remaining = int(iterations)
        while remaining > 0:
            length = min(remaining, chunk)
            key = ("unsup", length, skip_nt, agent.electrical_synapse,
                   agent.chemical_synapse, bool(agent.do_plasticity),
                   hist_sig, (agent.rows, agent.cols),
                   resolve_pallas(getattr(agent, "use_pallas", None)),
                   getattr(agent.graph, "offsets", None),
                   self.update_state, self.state_encoder,
                   jax.tree_util.tree_structure(self.state))
            runner = self._runners.get(key)
            if runner is None:
                runner = self._cache(key, self._build_unsupervised(
                    length, skip_nt, hist_sig))
            pparams = {k: jnp.float32(v)
                       for k, v in agent.plasticity.params.items()}
            (s, graph, clock, env), ys = runner(
                agent.state, agent.graph, jnp.int32(agent.internal_clock),
                self.state, pparams)
            agent.state, agent.graph = s, graph
            self.state = env
            pulls = [clock] + ([ys["grid"]] if hist_sig is not None else [])
            got = jax.device_get(pulls)
            agent.internal_clock = int(got[0])
            if hist_sig is not None:
                agent.grid_history.extend(got[1])
            remaining -= length
