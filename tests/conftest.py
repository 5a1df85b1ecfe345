"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding paths (SyncBN-equivalent cross-replica batch stats,
gradient psum, sharded eval) are exercised on CPU via
``--xla_force_host_platform_device_count=8`` — the JAX-native analogue of
testing DDP without a GPU cluster (SURVEY §4 plan item (c)).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some images pre-import jax from sitecustomize (TPU plugin registration), so
# env vars set here are too late for platform selection — force it through
# the live config instead (backend init is lazy, so this still lands before
# any client is created).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from semi_seg_ecg_tpu.parallel import mesh as _mesh_mod  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_current_mesh():
    """make_mesh registers the mesh it builds as the process-wide current
    mesh (consumed by mesh-aware ops like sharded_flash_attention). Tests
    build many meshes; isolate them so a mesh from one test can't leak
    sharding decisions into another."""
    prev = _mesh_mod.get_current_mesh()
    yield
    _mesh_mod.set_current_mesh(prev)


@pytest.fixture(scope="session")
def synth_dataset_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_data")
    return make_synthetic_dataset(str(root), seed=0)


@pytest.fixture(scope="session")
def e2e_data(tmp_path_factory):
    """Small (length-500) dataset for end-to-end algorithm runs."""
    root = tmp_path_factory.mktemp("e2e_data")
    return make_synthetic_dataset(
        str(root), num_train_labeled=8, num_train_unlabeled=16,
        num_valid=4, num_test=4, length=500, seed=3,
    )


@pytest.fixture(scope="session")
def synth_dataset_cfg_varied_fs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_data_fs")
    return make_synthetic_dataset(str(root), seed=1, varied_fs=True, length=1000)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
