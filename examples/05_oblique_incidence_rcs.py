"""Scattering cross-section vs incidence angle (oblique TF/SF).

The aux-grid TF/SF box handles +x incidence dispersion-exactly; the
analytic oblique path (solver/tfsf_oblique.py) opens up ANY direction.
A sphere's sigma is rotation-invariant, so sweeping the angle doubles as
a physics self-check: the spread across angles measures the oblique
path's leakage + staircasing floor (~1% at this resolution).

Run:  python examples/05_oblique_incidence_rcs.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math

import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.models import scattering_cross_section
from fdtd_tpu.scene import Ball, Isometry, Scene

kwargs = dict(
    domain_half_extents=(18.0, 18.0, 16.0),
    dx=1.0,
    pulse_duration_steps=12,
    n_steps=400,
    cpml_cells=8,
)


def sphere_scene():
    scene = Scene()
    scene.spawn(shape=Ball(3.0), pose=Isometry.from_translation((0, 0, 0)),
                material=ft.PEC)
    return scene


sigmas = []
for deg in (0, 20, 45):
    th = math.radians(deg)
    res = scattering_cross_section(
        sphere_scene(),
        direction=(math.cos(th), math.sin(th), 0.0),
        polarization=(0.0, 0.0, 1.0),
        **kwargs,
    )
    sigmas.append(res.sigma_scat)
    print(f"incidence {deg:2d} deg: sigma_scat = {res.sigma_scat:8.2f} "
          f"(cells^2)")

spread = (max(sigmas) - min(sigmas)) / np.mean(sigmas)
print(f"rotation-invariance spread: {100 * spread:.1f}% "
      f"(sphere: should be ~0)")
