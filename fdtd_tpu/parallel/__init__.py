from .topology import make_mesh, choose_mesh_shape
from .sharded import make_sharded_step, shard_state, state_sharding

__all__ = [
    "make_mesh",
    "choose_mesh_shape",
    "make_sharded_step",
    "shard_state",
    "state_sharding",
]
