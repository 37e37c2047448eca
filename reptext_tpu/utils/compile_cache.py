"""Persistent XLA compilation cache for CLI / serving cold starts.

The reference pays torch's eager/compile warmup on every process start; under
XLA the equivalent cost is the first-trace compile of the fused sampler
(20-40s+ per (geometry, batch-bucket) signature on a TPU host). JAX ships a
persistent compilation cache keyed on the serialized HLO + compile options +
jaxlib version; pointing it at a directory makes every later process with the
same graphs load the compiled executable from disk instead of recompiling —
serve restarts, repeated CLI runs, and crash-recovery (sampling/elastic.py)
all skip straight to execution.

Off by default inside tests (they compile tiny ephemeral graphs); enabled by
the CLI for every mode unless ``--compile-cache off``.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "reptext_tpu", "xla")


def enable_compile_cache(directory: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``directory``.

    ``None`` resolves to ``$REPTEXT_COMPILE_CACHE`` or the default user-cache
    path; the string ``"off"`` (or an empty ``$REPTEXT_COMPILE_CACHE``)
    disables caching. Returns the directory in use, or None when disabled.
    """
    if directory is None:
        directory = os.environ.get("REPTEXT_COMPILE_CACHE", _DEFAULT)
    if not directory or directory == "off":
        return None

    import jax

    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache every compile that took measurable work; the tiny-graph floor
    # avoids churning the cache with sub-second CPU helper compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return directory
