"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path can
be exercised without TPU hardware. float64 is enabled so f64 runs can be
compared exactly against the NumPy oracle.
"""

import os

# Must be set before the backend initializes (first jax.devices() call).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-sets JAX_PLATFORMS in the parent
# env; override through the config API, which wins after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (documented in CLAUDE.md):
#   -m smoke            fast gate, < 5 min on a 1-CPU box
#   -m "smoke or slow"  full single-chip coverage (~9 min)
#   -m sharded          multi-device interpret-mode kernels (slowest chunk,
#                       tens of minutes on 1 CPU — run when touching
#                       parallel/ or the kernel halo logic)
# Every test gets exactly one tier marker, assigned here by file (and by
# name for a few individually-slow single-chip tests) so test authors
# don't have to remember to tag anything.
# ---------------------------------------------------------------------------

_SHARDED_FILES = {
    "test_sharding.py",
    "test_sharded_engine.py",
    "test_sharded_cpml.py",
    "test_sharded_simulation.py",
    "test_pallas_sharded.py",
    "test_blocked_cpml.py",
    "test_rotation.py",
}
_SLOW_FILES = {"test_pallas_cpml.py", "test_oblique_kernel.py",
               "test_xz_cpml.py"}
_SLOW_TESTS = {
    "test_tet_leapfrog_energy_conserved",
    "test_boxdft_kernel_tier_matches_per_tick",
    "test_dense_pml_in_kernel_matches_engine",
    "test_io_alias_folded_halo_matches_plain",
    "test_bf16_storage_error_study",
}


# curated per-change gate for the sharded tier (full tier: 45+ min on a
# 1-CPU box): one representative per mechanism — 1-D halo exactness,
# 2-D mesh, gb blocks, z-cut rotation, oblique, the donated double pass
# — so fdtd_tpu/parallel/ and kernel-halo edits can be gated in ~10 min
# with `-m sharded_smoke` before a full tier run (measured 18:38
# on a loaded 1-CPU box, round 5).
_SHARDED_SMOKE = {
    "test_sharded_cpml_all_axes_matches_single_device",
    "test_sharded_cpml_2d_mesh_matches_single_device",
    "test_sharded_cpml_inkernel_dft_matches_single_device",
    "test_sharded_gb_matches_single_device",
    "test_sharded_gb_step2_matches_two_passes",
    "test_sharded_oblique_matches_single_device",
    "test_zcut_cpml_bit_equal_to_xcut_and_matches_single_chip",
    "test_sharded_k_step_matches_single",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name
        if fname in _SHARDED_FILES:
            item.add_marker(pytest.mark.sharded)
            if item.name.split("[")[0] in _SHARDED_SMOKE:
                item.add_marker(pytest.mark.sharded_smoke)
        elif fname in _SLOW_FILES or item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
