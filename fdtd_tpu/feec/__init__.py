from .mesh import TriMesh
from .solver import FeecSimulation, FeecState

__all__ = ["TriMesh", "FeecSimulation", "FeecState"]
