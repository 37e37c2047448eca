"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Must set env vars before jax is imported anywhere.
"""

import os

# Force-override: the environment presets JAX_PLATFORMS=axon (TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests compile tiny ephemeral graphs; don't churn the user's persistent
# XLA compile cache through CLI-driven tests (utils/compile_cache.py).
os.environ.setdefault("REPTEXT_COMPILE_CACHE", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA CPU's default matmul precision is reduced (~bf16-level error); force full
# fp32 accumulation so numerics tests compare against numpy exactly.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# jax 0.9's CPU backend ignores --xla_force_host_platform_device_count; the
# supported switch is the config option:
jax.config.update("jax_num_cpu_devices", 8)
# The env's sitecustomize registers a remote-TPU tunnel backend at interpreter
# start and jax captures jax_platforms from the env BEFORE this conftest runs,
# so the os.environ override above is too late for platform selection — every
# dispatch would silently go through the single-chip tunnel (slow, 1 device).
# The config update is honored after import and restores the CPU backend.
jax.config.update("jax_platforms", "cpu")
