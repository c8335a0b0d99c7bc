"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analogue of the reference's "test locally before the
cluster": multi-chip sharding code paths (pjit/shard_map/psum) execute on
8 virtual CPU devices, so distributed logic is exercised without hardware.
"""

import os

# Hard-force CPU: the axon TPU plugin is registered from sitecustomize.py at
# interpreter start and overrides JAX_PLATFORMS, so we must override the
# config again here (before any jax computation) or tests silently run over
# the TPU tunnel (~60x slower).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Hermetic tests: never touch (or depend on the state of) the user-level
# persistent XLA compile cache — a cache-warm engine build legitimately
# skips writing its exec.xla artifact (see export/exec_cache.py), which
# would make the exec-cache tests pass or fail based on ~/.cache contents.
os.environ["RTDM_XLA_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = pathlib.Path("/root/reference")
CLS_WEIGHTS = REFERENCE_ROOT / "code/disaster_detection/weights"


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran first
    return np.random.default_rng(42)


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")
