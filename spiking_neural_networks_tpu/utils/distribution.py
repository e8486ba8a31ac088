"""Clamped-normal sampling (`limited_distr`) and Gaussian input noise.

TPU-native equivalent of `/root/reference/backend/src/distribution/mod.rs:9-18`
and `GaussianParameters` (iterate_and_spike/mod.rs:2893-2928), using JAX
threaded PRNG keys instead of a global thread RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def limited_distr(key, mean, std, minimum, maximum, shape=()):
    """Normal(mean, std) clamped to [minimum, maximum]; returns mean if std==0."""
    sample = mean + std * jax.random.normal(key, shape)
    return jnp.clip(sample, minimum, maximum)


class GaussianParameters:
    """Mirror of the reference's noise parameter set (defaults:
    iterate_and_spike/mod.rs:2906-2915)."""

    def __init__(self, mean=1.0, std=0.0, maximum=2.0, minimum=0.0):
        self.mean = mean
        self.std = std
        self.max = maximum
        self.min = minimum

    def sample(self, key, shape=()):
        return limited_distr(key, self.mean, self.std, self.min, self.max, shape)
