"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax import, so
multi-chip sharding (pjit/shard_map over a Mesh) is testable on one host —
the framework's analog of a fake-backend distributed test rig (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon sitecustomize registers a remote-TPU backend that overrides
# JAX_PLATFORMS; dropping its trigger variable keeps tests on CPU
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize may have force-registered a remote-TPU backend at
# interpreter start; the config override wins over it
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the big while-loop programs take minutes to
# compile on this 1-core host; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/rtjax-jit-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSETS = os.path.join(os.path.dirname(__file__), os.pardir, "assets")
BUNNY_PLY = os.path.abspath(os.path.join(ASSETS, "bun_zipper.ply"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)


def random_triangles(rng, n, lo=-1.0, hi=1.0, size=0.4):
    """Random triangle soup for property tests."""
    base = rng.uniform(lo, hi, (n, 3))
    p1 = base + rng.uniform(-size, size, (n, 3))
    p2 = base + rng.uniform(-size, size, (n, 3))
    return base, p1, p2
