"""Test harness config: force an 8-device CPU mesh before any JAX use.

Mirrors the rebuild test strategy from SURVEY.md §4: multi-device tests run
on a host-platform mesh so sharding is exercised without TPU hardware.

NOTE: this image's sitecustomize registers a remote-TPU PJRT plugin and
calls ``jax.config.update("jax_platforms", "axon,cpu")``, which overrides
the ``JAX_PLATFORMS`` env var. We must update the config value itself.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (sitecustomize has already registered the plugin)

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: most suite wall-time is CPU XLA compiles of the
# tiny-config train/decode graphs; warm re-runs skip them entirely.
# Per-user path so concurrent CI runners don't share/grow one directory.
import getpass  # noqa: E402
import tempfile  # noqa: E402

_cache = os.path.join(tempfile.gettempdir(),
                      f"var_tpu_test_cache_{getpass.getuser()}")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
