"""fdtd-tpu: a TPU-native computational-electromagnetics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
``jgraef/fdtd`` ("cem") simulator: Yee-lattice FDTD with lossy materials,
CPML absorbing boundaries, point/plane-wave sources, scene voxelization into
compressed material-index buffers, field/DFT probes, slice projection
rendering, NEC antenna import, and GSPMD domain decomposition across a TPU
slice. See SURVEY.md for the reference analysis this build follows.
"""

from .constants import REDUCED, SI, PhysicalConstants
from .coefficients import coefficient_table, update_coefficients
from .grid import Grid, Resolution, Strider, courant_number
from .material import PEC, VACUUM, Material, MaterialTable
from .solver import (
    BoundaryConditions,
    CellCoefficients,
    ContinuousWave,
    Dirichlet,
    GaussianDerivative,
    GaussianPulse,
    Neumann,
    PointSource,
    Ricker,
    SimState,
    Simulation,
    SourceSet,
    state_from_stacked,
    step,
    step_fn,
    zero_state,
)

__version__ = "0.1.0"
