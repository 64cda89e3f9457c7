"""Test config: force CPU with 8 virtual devices so mesh/collective tests run
without TPU hardware (SURVEY.md §4 item 5), and enable a persistent
compilation cache (compiles dominate test wall-clock on small CPU hosts).

NOTE: env vars are not enough here — the host image's sitecustomize registers
a TPU PJRT plugin and hard-sets ``jax_platforms`` via ``jax.config.update``,
which overrides ``JAX_PLATFORMS``. We must re-override the config value after
importing jax (backends are not initialized yet at conftest import time, so
the switch is effective).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_atr")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}")
