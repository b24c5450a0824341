"""Antenna workflow: NEC deck -> voxelized PEC wires -> radiation pattern.

BASELINE config 4 end-to-end: parse a NEC2 deck, voxelize the wires as
perfect conductors, drive the feed with a CW source, accumulate a BoxDft on
a virtual surface, and return the far-field radiation pattern via the
near-to-far-field transform. The reference can only parse NEC decks and
display wire geometry (cem-app/src/composer/file_formats/nec.rs); it has no
excitation, no run wiring, and no far field.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import REDUCED, PhysicalConstants
from ..grid import Grid, Resolution
from ..io.nec import NecFile
from ..io.nec_scene import populate_scene_with_nec
from ..probes import BoxDft, radiation_pattern
from ..scene import Scene, SourceSpec, Volume, compile_scene
from ..scene.scene import Entity
from ..scene.transform import Isometry
from ..solver.cpml import Cpml
from ..solver.sources import ContinuousWave

__all__ = ["AntennaResult", "simulate_antenna"]


@dataclasses.dataclass
class AntennaResult:
    pattern: np.ndarray  # (n_theta, n_phi) radiation intensity
    theta: np.ndarray
    phi: np.ndarray
    grid: Grid
    frequency: float


def simulate_antenna(
    nec: NecFile,
    frequency: float,
    *,
    feed_position: Tuple[float, float, float],
    feed_polarization: Tuple[float, float, float] = (0.0, 0.0, 1.0),
    dx: Optional[float] = None,
    margin_wavelengths: float = 0.75,
    cpml_cells: int = 10,
    cells_per_wavelength: int = 15,
    n_theta: int = 19,
    n_phi: int = 18,
    ramp_periods: int = 6,
    dft_periods: int = 4,
    constants: PhysicalConstants = REDUCED,
    min_wire_radius_cells: float = 0.6,
) -> AntennaResult:
    """Run the antenna pipeline and return its far-field pattern.

    The feed is a CW J source at ``feed_position`` (place it in a wire gap);
    frequencies are snapped to an integer number of timesteps per period so
    the DFT integrates whole periods.
    """
    wavelength = constants.speed_of_light / frequency
    if dx is None:
        dx = wavelength / cells_per_wavelength
    res = Resolution.courant(dx, constants, safety=0.95)

    # snap the frequency to whole timesteps per period
    steps_per_period = max(8, int(round(1.0 / (frequency * res.temporal))))
    frequency = 1.0 / (steps_per_period * res.temporal)

    scene = Scene()
    n_wires = populate_scene_with_nec(
        scene, nec, min_radius=min_wire_radius_cells * dx
    )
    if n_wires == 0:
        raise ValueError("NEC deck produced no wire geometry")
    scene.add(
        Entity(
            name="feed",
            pose=Isometry.from_translation(feed_position),
            source=SourceSpec(
                ContinuousWave(frequency=frequency), j=feed_polarization
            ),
        )
    )

    margin = margin_wavelengths * wavelength + cpml_cells * dx
    compiled = compile_scene(
        scene,
        res,
        constants=constants,
        volume=Volume.scene_aabb(margin=margin),
        cpml=Cpml.uniform(cpml_cells),
    )
    sim = compiled.simulation
    shape = compiled.grid.shape

    # DFT box: between the antenna and the CPML
    pad = cpml_cells + 2
    box = tuple((pad, s - 1 - pad) for s in shape)
    state = sim.init()
    state, _, _ = sim.run(state, ramp_periods * steps_per_period)
    dft = BoxDft(frequencies=(frequency,), box=box)
    state, _, (acc,) = sim.run(
        state, dft_periods * steps_per_period, accumulators=(dft,)
    )

    theta = np.linspace(np.pi / (n_theta + 1), np.pi * n_theta / (n_theta + 1), n_theta)
    phi = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    u = radiation_pattern(
        dft, acc,
        dt=compiled.grid.dt, dx=compiled.grid.dx,
        theta=theta, phi=phi,
        eta=constants.vacuum_impedance, c0=constants.speed_of_light,
    )
    return AntennaResult(
        pattern=u, theta=theta, phi=phi, grid=compiled.grid, frequency=frequency
    )
