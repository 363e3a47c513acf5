"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (survey §4 implication: the reference has
no tests; we add kernel-level + multi-device ones).

Note: the sandbox's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so we must switch platforms via jax.config *after*
import (before first backend use)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_CKPT_DIR = "/root/reference/checkpoints"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_CKPT_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkpoints not mounted"
)
