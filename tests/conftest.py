import os

# Tests run on a virtual CPU mesh: multi-chip sharding is validated without
# TPU hardware.  Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
import jax

# The JAX_PLATFORMS env var is not honored under the axon TPU plugin; force
# the CPU backend through the config API so tests never touch the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
# NOTE: jax_enable_x64 is deliberately NOT forced here: production TPUs have
# no x64, and the device code paths must be int32/f32-clean.  Tests that
# exercise f64 *host-side jax* math opt in locally via the `enable_x64`
# fixture below.
# Persistent compile cache: jitted transforms recompile once per shape —
# per PHYSICAL HOST TYPE.  This VM migrates between machines with different
# CPU features; a shared cache dir serves AOT executables compiled for the
# wrong machine, which the XLA:CPU loader can SIGSEGV on (observed: crash in
# compilation_cache.get_executable_and_time mid-suite).  Key the dir by the
# host's CPU flags so each machine type gets its own cache.
import hashlib

def _cpu_cache_dir():
    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")][0]
    except Exception:
        flags = "unknown"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_{tag}"

_cache = _cpu_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture
def enable_x64():
    """Opt-in f64 jax semantics for host-side f64 checks (never used by the
    production device path)."""
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    yield
    _jax.config.update("jax_enable_x64", False)
