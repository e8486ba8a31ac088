from . import history, plasticity, lattice, network
