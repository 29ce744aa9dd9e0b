"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-selects the TPU backend regardless of
# JAX_PLATFORMS; override it so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True)
def _reset_module_api():
    yield
    import vectordb_tpu
    vectordb_tpu._reset_for_tests()
