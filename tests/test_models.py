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


_KWARGS = dict(
    domain_half_extents=(22.0, 16.0, 16.0),
    dx=1.0,
    pulse_duration_steps=8,
    n_steps=400,
    cpml_cells=8,
)


def _weighted_rayleigh(radius, eps, n_steps, dt, duration_steps):
    """Spectrum-weighted Rayleigh cross-section of a dielectric sphere for
    the EXACT GaussianDerivative pulse the workflow injects (c = 1 in
    REDUCED; the k^4 weighting is hypersensitive to the pulse shape, so we
    sample the library waveform rather than re-deriving it)."""
    wf = ft.GaussianDerivative(
        time=3 * duration_steps * dt, duration=duration_steps * dt
    )
    ts = np.arange(n_steps) * dt
    e = np.asarray([float(wf(t)) for t in ts])
    k = np.fft.rfftfreq(n_steps, dt) * 2 * np.pi
    w = np.abs(np.fft.rfft(e)) ** 2
    sig = (8 * np.pi / 3) * k**4 * radius**6 * ((eps - 1) / (eps + 2)) ** 2
    return float(np.sum(sig * w) / np.sum(w))


def test_scattering_cross_section_dielectric_vs_rayleigh():
    """Quantitative gate: a weakly-scattering dielectric sphere's broadband
    sigma_scat must match the spectrum-weighted Rayleigh formula (the exact
    small-ka limit). Measured agreement is ~5% at this resolution."""
    radius, eps = 3.0, 2.0
    scene = Scene()
    scene.spawn(
        shape=Ball(radius),
        pose=Isometry.from_translation((0.0, 0.0, 0.0)),
        material=ft.Material(relative_permittivity=eps),
    )
    res = scattering_cross_section(scene, **_KWARGS)
    dt = res.grid.dt
    theory = _weighted_rayleigh(radius, eps, _KWARGS["n_steps"], dt,
                                _KWARGS["pulse_duration_steps"])
    assert abs(res.sigma_scat - theory) < 0.2 * theory, (res.sigma_scat, theory)


def test_scattering_cross_section_pec_sphere():
    """PEC sphere scatters strongly; an empty domain scatters ~nothing
    (TF/SF box leakage only). The PEC bound is deliberately loose: a 6-cell
    staircased PEC sphere over-scatters the pulse's under-resolved spectral
    tail by ~3x (185 -> 93 when dx is halved; weighted Mie says 34-56),
    so this is a smoke test — the dielectric/Rayleigh test above is the
    quantitative one."""
    radius = 3.0
    scene = Scene()
    scene.spawn(
        shape=Ball(radius),
        pose=Isometry.from_translation((0.0, 0.0, 0.0)),
        material=ft.PEC,
    )
    res = scattering_cross_section(scene, **_KWARGS)
    geo = np.pi * radius**2
    assert 0.5 * geo < res.sigma_scat < 8.0 * geo, res

    empty = scattering_cross_section(Scene([
        # a vacuum marker so the volume resolves; material == background
    ]), **_KWARGS)
    assert empty.sigma_scat < 0.05 * geo, empty


def test_scattering_oblique_rotation_invariance():
    """A sphere's cross-section cannot depend on the incidence direction:
    sigma at 45-degree (x-y) oblique incidence (analytic ObliqueTfsf path)
    must match the axis-aligned aux-grid path on the SAME staircased
    sphere. Agreement is bounded by the oblique path's dispersion leakage
    and the (direction-dependent) staircasing — measured at 1.3% at this
    resolution (the 30% gate is generous)."""
    kwargs = dict(
        domain_half_extents=(18.0, 18.0, 16.0),
        dx=1.0,
        pulse_duration_steps=12,
        n_steps=400,
        cpml_cells=8,
    )

    def sphere_scene():
        scene = Scene()
        scene.spawn(shape=Ball(3.0),
                    pose=Isometry.from_translation((0.0, 0.0, 0.0)),
                    material=ft.PEC)
        return scene

    res_axis = scattering_cross_section(sphere_scene(), **kwargs)
    res_45 = scattering_cross_section(
        sphere_scene(), direction=(1.0, 1.0, 0.0),
        polarization=(0.0, 0.0, 1.0), **kwargs,
    )
    assert res_axis.sigma_scat > 0 and res_45.sigma_scat > 0
    rel = abs(res_45.sigma_scat - res_axis.sigma_scat) / res_axis.sigma_scat
    assert rel < 0.3, (res_axis.sigma_scat, res_45.sigma_scat, rel)
