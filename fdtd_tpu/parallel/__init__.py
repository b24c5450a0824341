from .topology import (make_mesh, choose_mesh_shape, init_distributed, make_multihost_mesh)
from .pallas_sharded import make_pallas_sharded_step
from .pallas_sharded_k import (
    collapse_state,
    extend_state,
    extract_slice,
    make_pallas_sharded_stepk,
)
from .best import best_sharded_absorbing_step, kernel_lateral_axis
from .simulation import ShardedSimulation
from .pallas_sharded_cpml import (
    collapse_pml_state,
    extend_pml_state,
    init_sharded_pml_state,
    make_pallas_sharded_cpml_stepk,
    supports_sharded_cpml,
)
from .sharded import make_sharded_step, shard_state, state_sharding
from .sharded_engine import (
    ShardedEngineState,
    init_sharded_engine_state,
    make_sharded_engine_step,
    sharded_engine_state_sharding,
)

__all__ = [
    "best_sharded_absorbing_step",
    "kernel_lateral_axis",
    "ShardedSimulation",
    "ShardedEngineState",
    "init_sharded_engine_state",
    "make_sharded_engine_step",
    "sharded_engine_state_sharding",
    "make_mesh",
    "init_distributed",
    "make_multihost_mesh",
    "choose_mesh_shape",
    "make_pallas_sharded_step",
    "make_pallas_sharded_stepk",
    "make_pallas_sharded_cpml_stepk",
    "supports_sharded_cpml",
    "init_sharded_pml_state",
    "extend_pml_state",
    "collapse_pml_state",
    "extend_state",
    "extract_slice",
    "collapse_state",
    "make_sharded_step",
    "shard_state",
    "state_sharding",
]
