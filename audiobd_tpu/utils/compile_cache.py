"""Persistent XLA compilation cache setup.

Every jitted program in this fixture pays a ~20-60 s remote compile over the
axon tunnel (CLAUDE.md); defense chains are compile-dominated (dozens of
short-lived programs — VALIDATION.md r2 wall-clock tables). The persistent
cache serializes compiled executables to disk keyed by HLO hash + backend
fingerprint, so every rerun of an attack/defense CLI (and every identical
program *within* a chain, across processes) skips the tunnel compile.

Enabled by every CLI entry point before the first compile (the reference has
no analogue — torch eager). Controlled by ``TrainConfig.compilation_cache``:
  "auto" (default) — $JAX_COMPILATION_CACHE_DIR if set, else
                     ~/.cache/audiobd_tpu/jax_cache
  "off"            — disabled
  any other string — used as the cache directory path
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "audiobd_tpu", "jax_cache"
)

_enabled_dir: str | None = None


def enable_compilation_cache(mode: str = "auto") -> str | None:
    """Point jax at a persistent on-disk compilation cache. Idempotent.

    Returns the cache directory in use, or None when disabled. Must run
    before the first compile to catch it (later calls still help subsequent
    compiles). min_compile_time is kept above zero so trivial CPU test
    programs don't churn the disk, but low enough that every tunnel compile
    (seconds) is cached.
    """
    global _enabled_dir
    if mode == "off":
        return None
    if mode in (None, "", "auto"):
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    else:
        path = mode
    if _enabled_dir == path:
        return path

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = path
    return path
