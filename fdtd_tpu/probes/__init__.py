from .probes import (
    DftProbe,
    EnergyProbe,
    FieldComponent,
    PointProbe,
    PoyntingFluxProbe,
    SliceProbe,
)

__all__ = [
    "DftProbe",
    "EnergyProbe",
    "FieldComponent",
    "PointProbe",
    "PoyntingFluxProbe",
    "SliceProbe",
]
