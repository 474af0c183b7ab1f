"""Test config: force CPU with 8 virtual devices BEFORE jax import.

This is the standard trick for testing multi-device sharding without a real
TPU slice (SURVEY.md §4): the driver separately dry-runs the multi-chip path
via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This image's sitecustomize pre-imports jax and forces the axon (TPU)
# platform via env; override post-import so tests run on the CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True)
def _reset_silent():
    """CLI tests that pass -silent set a process-global flag; training
    behavior must not depend on which test ran last (silent mode batches
    host syncs), so reset it around every test."""
    from ranklib_tpu.utils.logging import set_silent

    set_silent(False)
    yield
    set_silent(False)
