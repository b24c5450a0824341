"""TF/SF plane wave on a PEC sphere -> scattering cross-section
(BASELINE config 3).

Run:  python examples/02_scattering_cross_section.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import fdtd_tpu as ft
from fdtd_tpu.models import scattering_cross_section
from fdtd_tpu.scene import Ball, Isometry, Scene

radius = 4.0
scene = Scene()
scene.spawn(shape=Ball(radius), pose=Isometry.from_translation((0, 0, 0)),
            material=ft.PEC)

result = scattering_cross_section(
    scene,
    domain_half_extents=(26.0, 16.0, 16.0),
    dx=1.0,
    pulse_duration_steps=8,
    n_steps=500,
    cpml_cells=8,
)
geo = np.pi * radius**2
print(f"sigma_scat = {result.sigma_scat:.1f}  (geometric pi r^2 = {geo:.1f}, "
      f"ratio {result.sigma_scat / geo:.2f})")
print(f"throughput: {result.gcell_per_s:.2f} Gcell/s incl. compile "
      f"(on TPU the box-flux accumulator rides the K-step CPML kernel)")
