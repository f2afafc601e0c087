"""Test configuration: CPU backend with 8 virtual devices.

Tests must run without a TPU and must exercise multi-device sharding, so we
force the host platform with 8 virtual devices before JAX initializes.
"""

import os

# Force-override: the ambient environment presets JAX_PLATFORMS to the
# tunneled TPU platform; tests must run on the local CPU backend with a
# virtual 8-device mesh.  Pytest plugins (jaxtyping) import jax BEFORE this
# conftest runs, so the env var alone is not enough — also set the config
# flag, which takes effect as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: XLA-CPU compiles are expensive on this
# single-core machine; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; a plugin initialized "
        f"{jax.default_backend()!r} first"
    )
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_frames(rng, batch, sig_len, min_seg=20, max_seg=200):
    """Random valid frames arrays: [0, e1, e2, e3, e4] strictly increasing,
    e4 <= sig_len (mirrors the PhysioNet 1D data contract, SURVEY.md §2.2
    with frames[0]==0 as produced by databuilder.ipynb cell 25)."""
    lens = rng.integers(min_seg, max_seg, size=(batch, 4))
    frames = np.zeros((batch, 5), dtype=np.int64)
    frames[:, 1:] = np.cumsum(lens, axis=1)
    assert frames[:, -1].max() <= sig_len
    return frames


@pytest.fixture
def frames_factory():
    return make_frames
