"""Test env: CPU backend with 8 virtual devices.

Mirrors the SURVEY.md §4 plan: multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), and every
kernel has a CPU-runnable path (the reference's 'lavapipe analog').
"""

import os
import sys

# NOTE: the axon sitecustomize pins JAX_PLATFORMS=axon (the real TPU
# tunnel); jax.config.update is the reliable way to force CPU here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# LPT_TPU_TESTS=1 keeps the real TPU backend for the `tpu`-marked
# hardware-invariant tests (tests/test_tpu.py); everything else runs on
# the virtual-device CPU mesh.
if not os.environ.get("LPT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: TPU-marked runs only.  CPU runs
# get NO persistent cache — XLA:CPU executable (de)serialization
# segfaults intermittently on this host (utils/cache.py docstring), and
# a crashed suite is worse than a slow one.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from logipathtracer_tpu.utils.cache import configure_compile_cache  # noqa: E402

configure_compile_cache(
    jax, os.path.join(os.path.dirname(__file__), ".jax_cache"),
    cpu=not os.environ.get("LPT_TPU_TESTS"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_RESOURCES = "/root/reference/resources"


@pytest.fixture(scope="session")
def cornell_gltf():
    from logipathtracer_tpu.scene.gltf import load_gltf
    return load_gltf(os.path.join(REFERENCE_RESOURCES, "cornell_box.gltf"))


@pytest.fixture(scope="session")
def cornell_scene(cornell_gltf):
    from logipathtracer_tpu.scene.compile import compile_scene
    return compile_scene(cornell_gltf)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Free compiled executables between test modules.

    XLA:CPU segfaults on this host once a single process accumulates
    enough compiled code: the FULL suite reliably dies compiling a
    late heavyweight graph (test_wavefront's sort_every=2 body) in
    backend_compile_and_load, while either half of the suite + that
    same test passes — a cumulative JIT code-memory failure, not a
    specific graph (utils/cache.py documents the sibling serialize/
    deserialize crashes).  Dropping the jit caches per module bounds
    the resident compiled-code volume; cross-module graph reuse was
    already near zero (graphs are file-specific), so the cost is
    seconds, not minutes.
    """
    yield
    jax.clear_caches()
