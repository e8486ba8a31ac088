from . import history, plasticity, lattice
