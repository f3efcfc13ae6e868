"""Test configuration: force CPU backend with a virtual 8-device mesh.

Numerical-contract tests (1e-12 px round trips) run the NumPy float64 host
path; JAX-path tests run on the CPU backend (fast, deterministic), with the
8 virtual devices standing in for a TPU slice so multi-chip sharding logic is
exercised exactly as the driver's ``dryrun_multichip`` does.
"""
import os

# Force CPU even if the environment preselects the TPU platform: tests
# exercise the sharding/compile logic, not the chip. pytest's plugin
# discovery can import the jax package before this conftest runs, so set the
# config directly as well as the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

TESTS_DIR = pathlib.Path(__file__).parent
REPO_DIR = TESTS_DIR.parent


@pytest.fixture(scope="session")
def assets_dir() -> pathlib.Path:
    """Directory holding binary test fixtures."""
    return TESTS_DIR / "assets"
