"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate numerics and sharding semantics on the CPU backend (bit-exact
integer arithmetic is platform-independent); the real-TPU path is exercised
by bench.py and the driver's compile checks.

Note: this environment preloads the axon TPU plugin via sitecustomize, so
XLA_FLAGS/JAX_PLATFORMS env vars are applied too late — use jax.config
instead (it wins as long as no backend has been touched yet).
"""

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def _cpu_cache_dir() -> str:
    """Persistent-cache dir keyed by this host's CPU feature set.

    XLA:CPU cache entries are machine code; this VM can migrate between
    hosts with different CPU features, and loading an entry compiled for a
    richer ISA segfaults/SIGILLs mid-suite (the cpu_aot_loader 'machine
    type ... doesn't match' warnings). A per-feature-set dir trades a
    one-time recompile after migration for never loading foreign code.
    """
    try:
        flags = [
            line for line in open("/proc/cpuinfo") if line.startswith("flags")
        ][0]
    except (OSError, IndexError):
        flags = "unknown"
    return "/tmp/jax_cache_" + hashlib.sha1(flags.encode()).hexdigest()[:12]


# Persistent compilation cache: the scan-heavy oracle takes minutes to
# compile; cache across test sessions.
jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xBEEF)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop live executables between test modules.

    XLA:CPU's executable (de)serialization segfaults once a process holds
    enough live compiled executables (diagnosed round 2: the full suite
    crashes inside jax's persistent-cache serialize/deserialize at a fixed
    test position, while every module passes standalone; memory is not the
    limit). Keeping the live-executable count bounded per module avoids
    the crash; re-compiles hit the persistent cache as cheap reads.
    """
    import jax

    jax.clear_caches()
    yield
