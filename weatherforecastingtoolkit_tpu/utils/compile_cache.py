"""Persistent XLA compilation cache.

TPU compiles of the big programs here run minutes (the axon tunnel compiles
remotely); the persistent cache makes every rerun of bench/experiments
near-instant after the first. Call once early, before the first jit
execution.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str = None, min_compile_secs: float = 1.0) -> str:
    import jax

    # CPU executables are AOT'd with host-specific machine features; reusing
    # them across heterogeneous hosts risks SIGILL (observed: cached
    # '+prefer-no-gather' artifacts on a host without it). Cache only
    # accelerator backends, where compiles are the expensive ones anyway.
    # Honor WX_PLATFORM here too (not just experiments/common.py): scripts
    # whose first repo import is this function (bench.py and everything that
    # imports bench) must never open a TPU tunnel when the caller asked for
    # CPU — a stray second axon client can wedge the one legitimate TPU
    # process (see CLAUDE.md environment rules).
    if os.environ.get("WX_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WX_PLATFORM"])
    platforms = (os.environ.get("WX_PLATFORM")
                 or str(jax.config.jax_platforms or "")).lower()
    if platforms.startswith("cpu"):
        return ""

    path = path or os.environ.get("WX_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[compile-cache] disabled ({type(e).__name__}: {e})")
    return path
