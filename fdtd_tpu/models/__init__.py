from .antenna import AntennaResult, simulate_antenna
from .example import example_scene
from .scattering import ScatteringResult, scattering_cross_section

__all__ = [
    "AntennaResult",
    "simulate_antenna",
    "example_scene",
    "ScatteringResult",
    "scattering_cross_section",
]
