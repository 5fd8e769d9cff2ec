"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: the fake-backend trick) —
must be configured before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override — parity tests need f64
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# env alone is not enough here: the machine's sitecustomize pins the TPU
# ("axon") platform, so pin the config directly before backends initialize
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR
