"""Test harness: run all tests on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU platform at interpreter start and
ignores JAX_PLATFORMS from the env, so the reliable way to force CPU is
jax.config.update after import. XLA_FLAGS must still be set before the first
backend initialization.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
