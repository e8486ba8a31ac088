from . import history, plasticity, lattice, network, reward, reward_network
