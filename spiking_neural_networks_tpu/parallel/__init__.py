from . import sharding
from .lattice_sharding import (make_lattice_mesh, shard_lattice,
                               shard_network, shard_state, shard_graph)
from .multihost import initialize as initialize_multihost, make_hybrid_mesh
from .pipeline import (make_pipeline_mesh, run_pipelined,
                       run_pipelined_with_reward)
