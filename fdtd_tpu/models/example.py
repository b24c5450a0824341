"""The built-in example scene.

Mirrors ExampleScene::populate_scene (cem-app/src/composer/presets.rs:64-191):
a dielectric cube and ball (eps_r = 3.9), a ground plane, a 5 Hz
continuous-wave point source with J = 50 z-hat in reduced units, and an
observer quad through the source plane. The reference's GradedPml slab
entity becomes proper boundary CPML (the reference never applied its psi
anyway, SURVEY.md §2.1).
"""

from __future__ import annotations

from ..constants import REDUCED
from ..material import Material
from ..scene import (
    Ball,
    Cuboid,
    HalfSpace,
    Isometry,
    Observer,
    Quad,
    Scene,
    SourceSpec,
)
from ..solver.sources import ContinuousWave

__all__ = ["example_scene"]


def example_scene() -> Scene:
    scene = Scene()
    dielectric = Material(relative_permittivity=3.9)

    scene.spawn(
        name="cube",
        shape=Cuboid((0.5, 0.5, 0.5)),
        pose=Isometry.from_translation((1.5, 0.5, 0.0)),
        material=dielectric,
    )
    scene.spawn(
        name="ball",
        shape=Ball(0.6),
        pose=Isometry.from_translation((-1.5, 0.6, 0.5)),
        material=dielectric,
    )
    scene.spawn(
        name="ground",
        shape=HalfSpace(normal=(0.0, 1.0, 0.0)),
        pose=Isometry.from_translation((0.0, -1.0, 0.0)),
        material=Material(relative_permittivity=2.0, electrical_conductivity=0.01),
    )
    scene.spawn(
        name="source",
        pose=Isometry.from_translation((0.0, 1.0, 0.0)),
        # presets.rs:151-170: CW 5 Hz, J = 50 z-hat, reduced units
        source=SourceSpec(ContinuousWave(frequency=5.0), j=(0.0, 0.0, 50.0)),
    )
    scene.spawn(
        name="observer",
        shape=Quad((3.0, 3.0), half_thickness=0.1),
        pose=Isometry.from_translation((0.0, 1.0, 0.0)),
        observer=Observer(field="e"),
    )
    return scene


#: Unit system the example is authored in (presets.rs uses REDUCED).
EXAMPLE_CONSTANTS = REDUCED
