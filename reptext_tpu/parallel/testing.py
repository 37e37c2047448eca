"""Host-side helpers for running code on a virtual multi-device CPU mesh.

This build environment tunnels JAX to a remote single TPU chip through a
``sitecustomize`` hook that registers the tunnel backend at interpreter start
(so in-process ``JAX_PLATFORMS=cpu`` / ``jax.config`` overrides are too late).
The only reliable way to get a real N-device CPU backend — needed to validate
the §2.3 sharding layer without N physical chips — is a subprocess with the
tunnel env scrubbed. These helpers centralize that.

The reference has no distributed machinery at all (SURVEY.md §2.3); CPU-mesh
validation is the green-field TPU-native test strategy (SURVEY.md §4).
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict, Optional

# Env keys (by prefix) that wire the interpreter to the remote-TPU tunnel.
_TUNNEL_PREFIXES = ("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU")


def cpu_mesh_env(n_devices: int = 8) -> Dict[str, str]:
    """Environment for a subprocess that sees ``n_devices`` virtual CPU devices.

    Scrubs the remote-TPU tunnel variables (including PYTHONPATH, which injects
    the sitecustomize that registers the tunnel PJRT plugin) and forces the CPU
    platform with a host-platform device-count override.
    """
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(_TUNNEL_PREFIXES)
    }
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def run_in_cpu_mesh(
    code: str,
    n_devices: int = 8,
    timeout: float = 900.0,
    cwd: Optional[str] = None,
) -> str:
    """Run ``code`` in a scrubbed subprocess with an n-device CPU backend.

    Returns captured stdout; raises ``RuntimeError`` (with both streams) on a
    non-zero exit. ``cwd`` defaults to the repo root so ``reptext_tpu`` and
    ``__graft_entry__`` are importable.
    """
    if cwd is None:
        cwd = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=cpu_mesh_env(n_devices),
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"cpu-mesh subprocess failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
        )
    return proc.stdout
