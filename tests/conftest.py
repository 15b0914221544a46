"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile and run without TPU hardware (the driver validates
the real multi-chip path via __graft_entry__.dryrun_multichip).

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup (before this file runs), so env vars alone are too
late — `jax.config.update` after import still works because no backend is
initialised until the first array op.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PJRT_LIBRARY_PATH", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite compiles hundreds of CPU executables in one process; past a
# threshold XLA's CPU compiler segfaults under the accumulated memory
# pressure.  A persistent on-disk cache makes recompiles cheap and clearing
# jax's live-executable caches between test modules keeps the process lean.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.local_device_count()}"
