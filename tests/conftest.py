"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax import, so
multi-chip sharding (pjit/shard_map over a Mesh) is testable on one host —
the framework's analog of a fake-backend distributed test rig (SURVEY.md §4).
"""

import os
import resource
import sys

# XLA's executable (de)serialization recurses over the HLO graph; the
# engine's nested-while-loop render programs (interpret-mode pallas
# inside lax.while_loop) are deep enough to overflow the default 8 MB
# main-thread stack — a segfault inside the persistent compilation
# cache's put/get.  Raising RLIMIT_STACK at runtime is NOT enough (the
# kernel may already have placed mappings under the 8 MB-sized stack),
# so pytest_configure below raises the limit and re-execs once: rlimits
# survive exec, and the fresh process's main stack grows as far as it
# needs.  The re-exec must suspend pytest's fd-level capture first or
# the child inherits the redirected fds and its report vanishes.


def pytest_configure(config):
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if soft == resource.RLIM_INFINITY \
            or os.environ.get("RTJAX_STACK_REEXEC") == "1":
        return
    try:
        resource.setrlimit(resource.RLIMIT_STACK,
                           (resource.RLIM_INFINITY, hard))
    except (ValueError, OSError):
        return  # finite hard limit: run with what we have
    os.environ["RTJAX_STACK_REEXEC"] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    # NOT [sys.executable] + sys.argv: under `python -m pytest`, argv[0]
    # is .../pytest/__main__.py, and running that file as a script
    # silently no-ops (its package dir shadows the import)
    os.execv(sys.executable,
             [sys.executable, "-m", "pytest"] + sys.argv[1:])

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


def pytest_collection_modifyitems(config, items):
    """Default run excludes @pytest.mark.slow (the interpret-mode kernel
    parity matrices dominate the suite on the 1-core host: ~12.6 min with
    them, < 5 min without).  Run them with ``-m slow``; CI runs both."""
    if config.getoption("-m"):
        return  # an explicit marker expression overrides the default skip
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)


def random_triangles(rng, n, lo=-1.0, hi=1.0, size=0.4):
    """Random triangle soup for property tests."""
    base = rng.uniform(lo, hi, (n, 3))
    p1 = base + rng.uniform(-size, size, (n, 3))
    p2 = base + rng.uniform(-size, size, (n, 3))
    return base, p1, p2
