"""NEC dipole antenna -> far-field radiation pattern (BASELINE config 4).

Run:  python examples/03_antenna_pattern.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from fdtd_tpu.io import parse_nec
from fdtd_tpu.models import simulate_antenna

DECK = """\
CM half-wave dipole along z with a center feed gap (total length ~0.5 lambda)
CE
GW 1 3 0 0 0.04 0 0 0.25 0.01
GW 2 3 0 0 -0.25 0 0 -0.04 0.01
GE
"""

result = simulate_antenna(
    parse_nec(DECK),
    frequency=1.0,
    feed_position=(0.0, 0.0, 0.0),
    cells_per_wavelength=14,
    n_theta=17,
    n_phi=12,
)
u = result.pattern.mean(axis=1)
u = u / u.max()
print(f"grid {result.grid.shape}, frequency {result.frequency:.4f}")
print("theta(deg)  U/Umax")
for t, v in zip(np.degrees(result.theta), u):
    print(f"  {t:6.1f}   {v:.3f}  {'#' * int(40 * v)}")
