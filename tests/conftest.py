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

import pytest

# ---------------------------------------------------------------------------
# Marker groups (CLAUDE.md "Commands"): the full suite outgrew any 10-minute
# command window on this 1-CPU host, so every module is auto-marked into one
# of seven groups, each runnable standalone via `-m <group>`. r4 review:
# trajectory parity outgrew the parity group (15:43) — it now rides alone,
# as does the driver A/B group.
# ---------------------------------------------------------------------------
_QUICK = {
    "test_config", "test_losses", "test_metrics", "test_frontend",
    "test_attention", "test_codec_prefetch", "test_batvision_data",
    "test_sparse_dataset", "test_tools", "test_native_io", "test_serve",
}
_PARITY = {
    "test_grad_parity", "test_optim",
    "test_torch_interop", "test_data_pipeline_parity",
}
_TRAJECTORY = {"test_trajectory_parity"}
_DRIVER = {"test_driver_parity"}
_DIST = {
    "test_sharding", "test_sharded_stft", "test_ckpt_topology",
}
_CLUSTER = {"test_multihost"}  # real multi-process clusters: heaviest group


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _QUICK:
            item.add_marker(pytest.mark.quick)
        elif mod in _PARITY:
            item.add_marker(pytest.mark.parity)
        elif mod in _TRAJECTORY:
            item.add_marker(pytest.mark.trajectory)
        elif mod in _DRIVER:
            item.add_marker(pytest.mark.driver)
        elif mod in _DIST:
            item.add_marker(pytest.mark.dist)
        elif mod in _CLUSTER:
            item.add_marker(pytest.mark.cluster)
        else:
            item.add_marker(pytest.mark.models)
