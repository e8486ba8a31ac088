"""Agent / State / Environment wrappers for reward-driven simulation.

TPU-native rebuild of `/root/reference/backend/src/interactable/mod.rs`.
`RewardModulatedLattice` implements the Agent protocol
(`update_and_apply_reward` / `update`); `Lattice` / `LatticeNetwork`
implement the unsupervised protocol (`update == run 1 step`).
"""

from __future__ import annotations


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
