"""End-to-end model workflows: antenna radiation + scattering cross-section."""

import numpy as np
import pytest

import fdtd_tpu as ft
from fdtd_tpu.io import parse_nec
from fdtd_tpu.models import scattering_cross_section, simulate_antenna
from fdtd_tpu.scene import Ball, Isometry, Scene


def test_antenna_dipole_pattern():
    """A short z-oriented NEC dipole radiates a broadside (sin^2-ish)
    pattern: peak near theta=90, nulls toward the z poles."""
    # half-wave-ish dipole along z with a feed gap at the center
    deck = (
        "CM short dipole\nCE\n"
        "GW 1 4 0 0 0.04 0 0 0.4 0.02\n"
        "GW 2 4 0 0 -0.4 0 0 -0.04 0.02\n"
        "GE\n"
    )
    nec = parse_nec(deck)
    result = simulate_antenna(
        nec,
        frequency=1.0,  # lambda = 1 in reduced units ~ dipole is 0.8 lambda
        feed_position=(0.0, 0.0, 0.0),
        cells_per_wavelength=12,
        n_theta=9,
        n_phi=8,
        ramp_periods=4,
        dft_periods=3,
    )
    u = result.pattern
    assert np.isfinite(u).all() and u.max() > 0
    u_theta = u.mean(axis=1)
    mid = len(u_theta) // 2
    # broadside peak, polar nulls
    assert u_theta[mid] == u_theta.max()
    assert u_theta[0] < 0.35 * u_theta[mid]
    assert u_theta[-1] < 0.35 * u_theta[mid]
    # azimuthal spread bounded
    assert (np.abs(u - u_theta[:, None]) / u.max() < 0.35).all()


def test_scattering_cross_section_pec_sphere():
    """sigma_scat of a PEC sphere ~ its geometric scale; an empty domain
    scatters ~nothing (TF/SF leakage only)."""
    radius = 3.0
    scene = Scene()
    scene.spawn(
        shape=Ball(radius),
        pose=Isometry.from_translation((0.0, 0.0, 0.0)),
        material=ft.PEC,
    )
    kwargs = dict(
        domain_half_extents=(22.0, 14.0, 14.0),
        dx=1.0,
        pulse_duration_steps=8,
        n_steps=400,
        cpml_cells=8,
    )
    res = scattering_cross_section(scene, **kwargs)
    geo = np.pi * radius**2
    assert 0.5 * geo < res.sigma_scat < 6.0 * geo, res

    empty = scattering_cross_section(Scene([ 
        # a vacuum marker so the volume resolves; material == background
    ]), **{**kwargs, "domain_half_extents": (22.0, 14.0, 14.0)})
    assert empty.sigma_scat < 0.05 * geo, empty
