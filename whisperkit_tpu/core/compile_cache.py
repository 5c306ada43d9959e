"""Persistent XLA compilation cache.

Reference: CoreML caches compiled model specializations on disk and the
reference exposes `prewarm` to force them ahead of time
(WhisperKit.swift:392-427, Configurations.swift:43-67). The JAX equivalent
is the persistent compilation cache: first-run jit compiles (~20-40 s on
TPU) are written to disk and later runs load them in milliseconds.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_enabled = False

DEFAULT_CACHE_DIR = os.environ.get(
    "WHISPERKIT_TPU_COMPILE_CACHE",
    str(Path.home() / ".cache" / "whisperkit_tpu" / "xla"),
)


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Idempotently point JAX's persistent compilation cache at `path`."""
    global _enabled
    import jax

    cache_dir = path or DEFAULT_CACHE_DIR
    if _enabled:
        return cache_dir
    if jax.default_backend() == "cpu":
        # CPU AOT executables are machine-feature specific; cached entries
        # from another machine (e.g. a remote-compile relay) can SIGILL on
        # load — only the TPU backend gets the persistent cache
        return cache_dir
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: model-load latency matters more than disk
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
    return cache_dir
