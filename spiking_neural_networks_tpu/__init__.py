"""spiking_neural_networks_tpu — a TPU-native spiking neural network framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference Rust
crate `spiking_neural_networks` (NikhilMukraj/spiking-neural-networks):
biological neuron models (integrate-and-fire family, Izhikevich,
Hodgkin-Huxley, Morris-Lecar) with neurotransmitter and receptor kinetics,
2-D lattices with electrical (gap junction) and chemical synapses,
multi-lattice networks fed by spike-train generators, plasticity (STDP, BCM,
reward-modulated STDP), Hopfield attractors, EEG/PSD analysis, genetic
algorithm fitting, and an RL environment wrapper — all as struct-of-arrays
state pytrees advanced by fused, jit-compiled step functions under
`lax.scan`, sharded across chips with `jax.sharding` / `shard_map`.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SNN_TPU_FORCE_CPU"):
    # Escape hatch for CPU smoke runs of experiments/examples: the container
    # sitecustomize force-registers the TPU plugin and overrides
    # JAX_PLATFORMS, so the env var alone cannot force CPU — the jax config
    # must be set after import (same trick as tests/conftest.py).
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from .models.integrate_and_fire import (
    LeakyIntegrateAndFire,
    QuadraticIntegrateAndFire,
    AdaptiveLeakyIntegrateAndFire,
    AdaptiveExpLeakyIntegrateAndFire,
    Izhikevich,
    LeakyIzhikevich,
    BCMIzhikevich,
    SimpleLeakyIntegrateAndFire,
)
from .models.hodgkin_huxley import HodgkinHuxley
from .models.morris_lecar import MorrisLecar
from .models.dopa import DopaIzhikevich
from .models.spike_train import (
    PoissonSpikeTrain,
    RateSpikeTrain,
    PresetSpikeTrain,
    BCMPoissonSpikeTrain,
)
from .core.lattice import Lattice
from .core.network import SpikeTrainLattice, LatticeNetwork
from .core.reward import RewardModulatedLattice
from .core.reward_network import RewardModulatedLatticeNetwork
from .interactable import Environment, UnsupervisedEnvironment
from . import coupling
from . import errors
from .core.plasticity import STDP, BCM, RewardModulatedSTDP
from .core import history
from .ops.graph import DenseGraph, SparseGraph, StencilGraph, radius_offsets
from .ops.receptors import IonotropicReceptors, DopaGluGABAReceptors
from . import attractors, analysis, fitting
from .diagnostics import why_not_fused
