"""Agent/Environment protocol: host loop (reference semantics) and the
fused on-device JitEnvironment must produce the same trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.interactable import (Environment,
                                                      JitEnvironment)

TARGET = 0.10


def _agent():
    lat = snn.RewardModulatedLattice(snn.Izhikevich())
    lat.populate(8, 8, gap_conductance=10.0)
    lat.connect_stencil(radius=1.5, keep_prob=0.9, seed=2)
    v0 = np.random.default_rng(0).uniform(-65.0, 30.0, 64).astype(np.float32)
    v0[:6] = 40.0
    # staggered spike history so R-STDP time diffs are nonzero immediately
    lft = np.full(64, -1, np.int32)
    lft[::2] = 3
    lat.apply(lambda s: {**s, "v": jnp.asarray(v0),
                         "last_firing_time": jnp.asarray(lft)})
    return lat


class _HostState:
    def __init__(self):
        self.rate = np.float32(0.0)

    def update_state(self, agent):
        spiking = np.float32(np.asarray(
            agent.state["is_spiking"], np.float32).mean())
        self.rate = np.float32(0.9) * self.rate + np.float32(0.1) * spiking


def _host_encoder(state, agent):
    # constant cue: clamp the first 6 neurons high every step
    v = np.asarray(agent.state["v"]).copy()
    v[:6] = 40.0
    agent.state = {**agent.state, "v": jnp.asarray(v, jnp.float32)}


def _host_reward(state, agent):
    return float(np.float32(TARGET) - state.rate)


def test_jit_environment_matches_host_loop():
    steps = 40

    host_agent = _agent()
    host_env = Environment(host_agent, _HostState(), _host_encoder,
                           _host_reward)
    host_env.run_with_reward(steps)

    jit_agent = _agent()

    def reward_fn(env, s):
        return jnp.float32(TARGET) - env["rate"]

    def update_fn(env, s):
        spiking = s["is_spiking"].astype(jnp.float32).mean()
        return {"rate": jnp.float32(0.9) * env["rate"]
                + jnp.float32(0.1) * spiking}

    def encoder_fn(env, s):
        v = s["v"].at[:6].set(40.0)
        return {**s, "v": v}

    jit_env = JitEnvironment(jit_agent, {"rate": jnp.float32(0.0)},
                             encoder_fn, reward_fn, update_fn)
    rewards = jit_env.run_with_reward(steps)

    assert rewards.shape == (steps,)
    np.testing.assert_allclose(np.asarray(host_agent.state["v"]),
                               np.asarray(jit_agent.state["v"]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(host_agent.graph.weights),
                               np.asarray(jit_agent.graph.weights),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(host_agent.dopamine, jit_agent.dopamine,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(host_env.state.rate,
                               float(jit_env.state["rate"]), rtol=1e-4,
                               atol=1e-6)
    # non-vacuous: the loop spiked and modulated weights
    assert (np.asarray(jit_agent.state["last_firing_time"]) >= 0).any()
    w0 = np.asarray(_agent().graph.weights)
    assert not np.array_equal(np.asarray(jit_agent.graph.weights), w0)


def test_jit_environment_repeat_and_clock():
    agent = _agent()
    env = JitEnvironment(agent, {"rate": jnp.float32(0.0)},
                         lambda e, s: s,
                         lambda e, s: jnp.float32(0.5),
                         lambda e, s: e)
    env.run_with_reward(30)
    env.run_with_reward(30)
    assert agent.internal_clock == 60


def test_jit_environment_unsupervised_matches_host():
    """`JitEnvironment.run` (unsupervised, plain-Lattice agent) vs the
    host-loop `UnsupervisedEnvironment` (interactable/mod.rs:48-59)."""
    from spiking_neural_networks_tpu.interactable import (
        UnsupervisedEnvironment)

    def plain_agent():
        lat = snn.Lattice(snn.Izhikevich())
        lat.populate(8, 8, gap_conductance=10.0)
        lat.connect_stencil(radius=1.5, keep_prob=0.9, seed=4)
        lat.do_plasticity = True
        v0 = np.random.default_rng(1).uniform(-65.0, 30.0, 64) \
            .astype(np.float32)
        v0[:5] = 40.0
        lft = np.full(64, -1, np.int32)
        lft[::2] = 3
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0),
                             "last_firing_time": jnp.asarray(lft)})
        return lat

    class HState:
        def update_state(self, agent):
            pass

    def host_encoder(state, agent):
        agent.apply(lambda s: {**s, "v": s["v"].at[:5].set(40.0)})

    host = plain_agent()
    henv = UnsupervisedEnvironment(host, HState(), host_encoder)
    henv.run(50)

    fused = plain_agent()
    jenv = JitEnvironment(fused, {}, lambda e, s: {**s,
                                                   "v": s["v"].at[:5]
                                                   .set(40.0)},
                          None, lambda e, s: e)
    jenv.run(50)

    np.testing.assert_allclose(np.asarray(host.state["v"]),
                               np.asarray(fused.state["v"]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(host.graph.weights),
                               np.asarray(fused.graph.weights),
                               rtol=2e-4, atol=2e-4)
    assert fused.internal_clock == 50


def test_jit_environment_grid_history():
    """JitEnvironment records grid histories inside the fused episode
    (was rejected in round 2): seamless across history chunks and equal to
    the host-loop trajectory."""
    import numpy as np
    import jax.numpy as jnp
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.interactable import JitEnvironment

    def build():
        lat = snn.RewardModulatedLattice(snn.Izhikevich())
        lat.populate(4, 4, gap_conductance=10.0)
        lat.connect_stencil(radius=1.5, keep_prob=1.0, seed=2)
        v0 = np.random.default_rng(3).uniform(-65, 30, 16).astype(np.float32)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0)})
        lat.update_grid_history = True
        env = JitEnvironment(
            lat, {"rate": jnp.float32(0.0)},
            lambda e, s: {**s, "v": s["v"].at[:2].set(31.0)},
            lambda e, s: jnp.clip(0.05 - e["rate"], -0.05, 0.05),
            lambda e, s: {"rate": 0.9 * e["rate"]
                          + 0.1 * s["is_spiking"].astype(jnp.float32).mean()})
        return lat, env

    lat_a, env_a = build()
    env_a.run_with_reward(50)
    assert len(lat_a.grid_history.history) == 50
    ha = np.stack(lat_a.grid_history.history)
    assert ha.shape == (50, 4, 4)

    # chunked run produces the identical trajectory
    lat_b, env_b = build()
    lat_b.history_chunk = 7
    env_b.run_with_reward(50)
    hb = np.stack(lat_b.grid_history.history)
    np.testing.assert_array_equal(ha, hb)
    np.testing.assert_array_equal(np.asarray(lat_a.state["v"]),
                                  np.asarray(lat_b.state["v"]))

    # EEG history kind works through the same path
    from spiking_neural_networks_tpu.core.history import EEGHistory
    lat_c, env_c = build()
    lat_c.grid_history = EEGHistory()
    env_c.run_with_reward(30)
    assert len(lat_c.grid_history.history) == 30


def test_jit_environment_unsupervised_grid_history():
    import numpy as np
    import jax.numpy as jnp
    import spiking_neural_networks_tpu as snn
    from spiking_neural_networks_tpu.interactable import JitEnvironment

    lat = snn.Lattice(snn.Izhikevich())
    lat.populate(4, 4, gap_conductance=10.0)
    lat.connect_stencil(radius=1.5, keep_prob=1.0, seed=4)
    lat.update_grid_history = True
    env = JitEnvironment(
        lat, {"t": jnp.float32(0.0)},
        lambda e, s: {**s, "v": s["v"].at[:3].set(31.0)},
        None, lambda e, s: {"t": e["t"] + 1.0})
    env.run(40)
    assert len(lat.grid_history.history) == 40


def test_jit_environment_fused_agent_step():
    """use_pallas=True routes the agent update through the chunk=1 fused
    kernel; the whole closed-loop trajectory (rewards, weights, traces,
    env state) must match the XLA step."""
    def run(use_pallas):
        agent = _agent()
        agent.use_pallas = use_pallas

        def reward_fn(env, s):
            return jnp.float32(TARGET) - env["rate"]

        def update_fn(env, s):
            spiking = s["is_spiking"].astype(jnp.float32).mean()
            return {"rate": jnp.float32(0.9) * env["rate"]
                    + jnp.float32(0.1) * spiking}

        def encoder_fn(env, s):
            return {**s, "v": s["v"].at[:6].set(40.0)}

        env = JitEnvironment(agent, {"rate": jnp.float32(0.0)},
                             encoder_fn, reward_fn, update_fn)
        rewards = env.run_with_reward(75)
        return agent, env, rewards

    a, env_a, rew_a = run(False)
    b, env_b, rew_b = run(True)
    assert env_b.last_build_fused and not env_a.last_build_fused
    np.testing.assert_allclose(rew_b, rew_a, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state["v"]),
                               np.asarray(a.state["v"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(b.state["last_firing_time"]),
        np.asarray(a.state["last_firing_time"]))
    np.testing.assert_allclose(np.asarray(b.graph.weights),
                               np.asarray(a.graph.weights),
                               rtol=1e-5, atol=1e-5)
    for k in ("c", "dw"):
        np.testing.assert_allclose(np.asarray(b.trace[k]),
                                   np.asarray(a.trace[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(float(env_b.state["rate"]),
                               float(env_a.state["rate"]),
                               rtol=1e-5, atol=1e-6)
    assert abs(a.dopamine - b.dopamine) <= 1e-4 * max(1.0, abs(a.dopamine))


def _poly_callbacks(cue=6, target=TARGET):
    """Shape-polymorphic callbacks: trace identically on flat (N,) state
    fields (XLA scan) and (R, C) planes (in-kernel env fusion)."""
    def reward_fn(env, s):
        return jnp.float32(target) - env["rate"]

    def update_fn(env, s):
        spiking = s["is_spiking"].astype(jnp.float32).mean()
        return {"rate": jnp.float32(0.9) * env["rate"]
                + jnp.float32(0.1) * spiking}

    def encoder_fn(env, s):
        v = s["v"]
        if v.ndim == 1:
            fi = jax.lax.iota(jnp.int32, v.shape[0])
        else:
            r = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            c = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            fi = r * v.shape[1] + c
        return {**s, "v": jnp.where(fi < cue, jnp.float32(40.0), v)}

    return encoder_fn, reward_fn, update_fn


def test_jit_environment_env_fused_whole_loop():
    """Shape-polymorphic callbacks engage the whole-loop in-kernel env
    fusion (env scalars + callbacks inside K-step kernel launches); the
    trajectory must match the XLA per-step scan, including across launch
    boundaries (11 steps = 2 full CPU launches + remainder)."""
    steps = 11

    def run(use_pallas):
        agent = _agent()
        agent.use_pallas = use_pallas
        enc, rew, upd = _poly_callbacks()
        env = JitEnvironment(agent, {"rate": jnp.float32(0.0)},
                             enc, rew, upd)
        rewards = env.run_with_reward(steps)
        return agent, env, rewards

    a, env_a, rew_a = run(False)
    assert not env_a.last_build_env_fused
    b, env_b, rew_b = run(True)
    assert env_b.last_build_env_fused and env_b.last_build_fused
    np.testing.assert_allclose(rew_b, rew_a, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state["v"]),
                               np.asarray(a.state["v"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(b.state["last_firing_time"]),
        np.asarray(a.state["last_firing_time"]))
    np.testing.assert_array_equal(np.asarray(b.state["is_spiking"]),
                                  np.asarray(a.state["is_spiking"]))
    np.testing.assert_allclose(np.asarray(b.graph.weights),
                               np.asarray(a.graph.weights),
                               rtol=1e-5, atol=1e-5)
    for k in ("c", "dw", "counter"):
        np.testing.assert_allclose(np.asarray(b.trace[k]),
                                   np.asarray(a.trace[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(float(env_b.state["rate"]),
                               float(env_a.state["rate"]),
                               rtol=1e-5, atol=1e-6)
    assert abs(a.dopamine - b.dopamine) <= 1e-4 * max(1.0, abs(a.dopamine))
    assert b.internal_clock == steps
    # non-vacuous: the cue made the lattice spike
    assert (np.asarray(b.state["last_firing_time"]) >= 0).any()


def test_jit_environment_env_fused_gate_rejects():
    """The flat/(R, C) equivalence gate must reject callbacks whose flat
    indexing changes meaning on planes (``.at[:6]`` sets 6 rows on an
    (8, 8) grid) and callbacks reading keys outside the in-kernel view —
    both fall back to the per-step fused path, not silently diverge."""
    def run(encoder, reward=None):
        agent = _agent()
        agent.use_pallas = True
        _, rew, upd = _poly_callbacks()
        env = JitEnvironment(agent, {"rate": jnp.float32(0.0)},
                             encoder, reward or rew, upd)
        env.run_with_reward(3)
        return env

    enc_flat = lambda e, s: {**s, "v": s["v"].at[:6].set(40.0)}
    env = run(enc_flat)
    assert env.last_build_fused and not env.last_build_env_fused

    enc_poly, _, _ = _poly_callbacks()
    env = run(enc_poly, reward=lambda e, s: s["nt$t"].sum() * 0.0 + 0.1)
    assert not env.last_build_env_fused


def test_jit_environment_unsupervised_env_fused():
    """Whole-loop fusion of the unsupervised run() (plain STDP lattice,
    no reward/dopamine): shape-polymorphic callbacks engage the in-kernel
    env form; trajectory matches the XLA per-step scan."""
    def run(use_pallas):
        lat = snn.Lattice(snn.Izhikevich())
        lat.populate(8, 8, gap_conductance=10.0)
        lat.connect_stencil(radius=1.5, keep_prob=0.9, seed=4)
        lat.do_plasticity = True
        v0 = np.random.default_rng(1).uniform(-65.0, 30.0, 64) \
            .astype(np.float32)
        v0[:5] = 40.0
        lft = np.full(64, -1, np.int32)
        lft[::2] = 3
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0),
                             "last_firing_time": jnp.asarray(lft)})
        lat.use_pallas = use_pallas
        enc, _, upd = _poly_callbacks(cue=5)
        env = JitEnvironment(lat, {"rate": jnp.float32(0.0)},
                             enc, None, upd)
        env.run(11)
        return lat, env

    a, env_a = run(False)
    assert not env_a.last_build_env_fused
    b, env_b = run(True)
    assert env_b.last_build_env_fused
    np.testing.assert_allclose(np.asarray(b.state["v"]),
                               np.asarray(a.state["v"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(b.state["last_firing_time"]),
        np.asarray(a.state["last_firing_time"]))
    np.testing.assert_allclose(np.asarray(b.graph.weights),
                               np.asarray(a.graph.weights),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(env_b.state["rate"]),
                               float(env_a.state["rate"]),
                               rtol=1e-5, atol=1e-6)
    assert b.internal_clock == 11
    # non-vacuous: the cue made the lattice spike
    assert (np.asarray(b.state["last_firing_time"]) >= 0).any()


def test_jit_environment_lif_w_callback_not_env_fused():
    """A LIF agent has no "w" state: the in-kernel view must not expose
    the kernel's dummy zero w-plane, so a w-reading callback fails the
    engagement probe and the loop stays on the per-step tiers (where the
    read raises the same KeyError it would anywhere else)."""
    def make(reward_fn):
        lat = snn.RewardModulatedLattice(snn.LeakyIntegrateAndFire())
        lat.populate(8, 8, gap_conductance=10.0)
        lat.connect_stencil(radius=1.5, keep_prob=0.9, seed=2)
        v0 = np.random.default_rng(0).uniform(-60.0, -20.0, 64)
        lat.apply(lambda s: {**s, "v": jnp.asarray(v0, jnp.float32)})
        lat.use_pallas = True
        enc, rew, upd = _poly_callbacks()
        return JitEnvironment(lat, {"rate": jnp.float32(0.0)},
                              enc, reward_fn or rew, upd)

    # sane callbacks: LIF engages the whole-loop fusion
    env = make(None)
    env.run_with_reward(3)
    assert env.last_build_env_fused

    # w-reading reward: the probe rejects env fusion, and the per-step
    # tier then raises the SAME KeyError the XLA path would — instead of
    # the kernel silently feeding the callback a dummy zero w-plane
    import pytest
    env = make(lambda e, s: s["w"].mean())
    with pytest.raises(KeyError):
        env.run_with_reward(3)
    assert not env.last_build_env_fused
