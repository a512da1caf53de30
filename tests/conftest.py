"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags BEFORE jax is imported anywhere, so this lives at the
top of conftest and tests must not import jax at module scope before pytest
collects this file.
"""

import os

# Force CPU: the ambient environment registers a tunneled TPU backend ("axon")
# from sitecustomize.py, which imports jax AT INTERPRETER STARTUP — so setting
# the JAX_PLATFORMS env var here is too late (jax.config already read it).
# Use jax.config.update instead, which works post-import. Set
# HAWKEYE_TEST_TPU=1 to run the suite against the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"  # still set for any subprocesses
if not os.environ.get("HAWKEYE_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
