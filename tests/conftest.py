"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that the multi-chip sharding
paths compile and execute without real TPU hardware. These env vars must be
set before JAX initialises its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU plugin at interpreter start and
# programmatically sets jax_platforms="axon,cpu", overriding the env var —
# force it back to CPU before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
