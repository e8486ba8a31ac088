"""Reward-driven agent in a closed-loop environment.

Demonstrates the `Environment`/`Agent` protocol
(`/root/reference/backend/src/interactable/mod.rs:21-60`): a reward-modulated
Izhikevich lattice is the agent; the environment's scalar state tracks the
lattice's firing rate; the reward pushes the firing rate toward a target by
dopamine-modulating the recurrent weights (R-STDP).

Run: python examples/agent_environment.py
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import spiking_neural_networks_tpu as snn
from spiking_neural_networks_tpu.interactable import Environment

TARGET_RATE = 0.08      # fraction of neurons spiking per step


class RateState:
    """Environment state: smoothed population firing rate."""

    def __init__(self):
        self.rate = 0.0

    def update_state(self, agent):
        spiking = float(np.asarray(agent.state["is_spiking"]).mean())
        self.rate = 0.9 * self.rate + 0.1 * spiking


_enc_rng = np.random.default_rng(7)


def state_encoder(state, agent):
    # constant cue: a random subset fires every step; the recurrent weights
    # (shaped by R-STDP) determine how far the activity spreads beyond it
    idx = _enc_rng.choice(100, size=6, replace=False)
    agent.apply(lambda s: {**s, "v": s["v"].at[idx].set(31.0)})


def reward_function(state, agent):
    # proportional control toward the target rate; the sign of the reward
    # (via dopamine) gates whether the eligibility traces strengthen or
    # weaken the recurrent weights
    return float(np.clip(TARGET_RATE - state.rate, -0.05, 0.05))


def main(iterations=1500):
    agent = snn.RewardModulatedLattice(snn.Izhikevich())
    agent.populate(10, 10, gap_conductance=10.0)
    agent.connect(lambda x, y: np.hypot(x[0] - y[0], x[1] - y[1]) <= 2
                  and x != y,
                  lambda x, y: 2.0)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    agent.apply(lambda s: {**s, "v": jnp.asarray(
        rng.uniform(-65, 30, 100), jnp.float32)})

    env = Environment(agent, RateState(), state_encoder, reward_function)

    def weight_drift():
        """Max deviation of any recurrent weight from its initial 2.0."""
        import jax.numpy as jnp
        g = agent.graph
        return float(jnp.abs(jnp.where(g.mask, g.weights - 2.0, 0.0)).max())

    w_start = weight_drift()
    rates = []
    for chunk in range(10):
        env.run_with_reward(iterations // 10)
        rates.append(env.state.rate)
    w_mid = weight_drift()

    # flip the objective: an over-target setpoint makes the reward negative,
    # reversing the dopamine-gated drift
    global TARGET_RATE
    TARGET_RATE = -1.0
    for chunk in range(10):
        env.run_with_reward(iterations // 10)
        rates.append(env.state.rate)
    w_end = weight_drift()

    print("firing-rate trajectory:", " ".join(f"{r:.3f}" for r in rates))
    print(f"max |recurrent weight drift|: start {w_start:.3f} -> after "
          f"+reward {w_mid:.3f} -> after -reward {w_end:.3f}")
    print("reward-gated plasticity moved weights:", w_mid > w_start)
    return rates


if __name__ == "__main__":
    main()
