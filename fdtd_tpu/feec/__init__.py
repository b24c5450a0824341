from .mesh import TriMesh
from .solver import FeecSimulation, FeecState
from .tetmesh import TetMesh

__all__ = ["TriMesh", "TetMesh", "FeecSimulation", "FeecState"]
