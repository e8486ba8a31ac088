"""Ionotropic receptor (ligand-gated channel) currents, vectorized over (N, K).

TPU-native equivalent of `Ionotropic` / AMPA / NMDA / GABA receptors
(`/root/reference/backend/src/neuron/iterate_and_spike/mod.rs:1068-1313`).
The reference keeps a HashMap of receptor structs per neuron; here the
static type axis K indexes [AMPA, NMDA, GABA] and every receptor parameter
is an (N, K) array with a boolean mask for inserted receptors.

Receptor current formulas (iterate_and_spike/mod.rs:1101-1166):
  AMPA / GABA : I = g * r * (v - e)
  NMDA        : I = B(v) * g * r * (v - e),  B(v) = 1 / (1 + exp(-0.062 v) * mg / 3.75)
"""

from __future__ import annotations

import jax.numpy as jnp

# Static neurotransmitter-type axis for the Ionotropic receptor set
# (IonotropicNeurotransmitterType, iterate_and_spike/mod.rs:1068-1073 and the
# GPU numbering at :1322-1329).
AMPA, NMDA, GABA = 0, 1, 2
IONOTROPIC_TYPES = ("AMPA", "NMDA", "GABA")
N_IONOTROPIC = 3

# Reference `Default` impls (iterate_and_spike/mod.rs:1085-1094, 1115-1125, 1148-1157)
DEFAULT_G = (1.0, 0.6, 1.2)
DEFAULT_E = (0.0, 0.0, -80.0)
DEFAULT_MG = 0.3


def set_receptor_currents(state, v):
    """Compute per-(neuron, type) receptor currents from the CURRENT voltage.

    Mirrors `Ionotropic::set_receptor_currents`
    (iterate_and_spike/mod.rs:1259-1284); runs before the voltage update so
    currents use the pre-update membrane potential.
    Returns the (N, K) current array (stored in state as ``rec$current``).
    """
    r = state["rec$r"]
    g = state["rec$g"]
    e = state["rec$e"]
    mg = state["rec$mg"]
    vk = v[:, None]

    base = g * r * (vk - e)
    nmda_block = 1.0 / (1.0 + jnp.exp(-0.062 * v) * mg[:, NMDA] / 3.75)
    # Apply the Mg-block factor only on the NMDA slot.
    block = jnp.ones_like(base).at[:, NMDA].set(nmda_block)
    currents = base * block
    return jnp.where(state["rec$mask"], currents, 0.0)


def get_receptor_currents(state, currents):
    """Sum receptor currents scaled by dt / c_m.

    Mirrors `Ionotropic::get_receptor_currents`
    (iterate_and_spike/mod.rs:1286-1304): ``total * (dt / c_m)``.
    The caller applies it as ``v += dv - get_receptor_currents(...)``.
    """
    total = jnp.sum(currents, axis=-1)
    return total * (state["dt"] / state["c_m"])
