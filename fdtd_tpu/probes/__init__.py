from .farfield import BoxDft, radiation_pattern
from .probes import (
    DftProbe,
    EnergyProbe,
    FieldComponent,
    PointProbe,
    PoyntingFluxProbe,
    SliceProbe,
)

__all__ = [
    "BoxDft",
    "radiation_pattern",
    "DftProbe",
    "EnergyProbe",
    "FieldComponent",
    "PointProbe",
    "PoyntingFluxProbe",
    "SliceProbe",
]
