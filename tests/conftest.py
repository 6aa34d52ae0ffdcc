"""Test config: force a virtual 8-device CPU mesh for sharding tests.

Must run before JAX backend initialization; the axon sitecustomize registers a
TPU platform, so we override jax_platforms programmatically as well.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Default the suite to the row-op engine so small test vocabs keep exercising
# the MP/DP gather paths; the one-hot MXU engine has its own dedicated tests
# (tests/test_onehot_engine.py) that re-enable it per-test.
os.environ.setdefault("HCTR_TPU_ONEHOT_VOCAB", "0")
os.environ.setdefault("HCTR_TPU_HOT_ROWS", "0")
# ... and to the windowed-trio update path (dense-sweep small-shard updates
# have their own tests that re-enable them: test_dense_update_path); the
# key-ratio dense rule would likewise reroute tiny test tables (K >= R/2)
os.environ.setdefault("HCTR_TPU_DENSE_UPDATE_ROWS", "0")
os.environ.setdefault("HCTR_TPU_DENSE_KEY_RATIO", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/hugectr_tpu_jaxcache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from hugectr_tpu.core.mesh import ResourceManager

    return ResourceManager.create(num_devices=8)


@pytest.fixture(scope="session")
def mesh1():
    from hugectr_tpu.core.mesh import ResourceManager

    return ResourceManager.create(num_devices=1)
