"""Persistent XLA compilation cache.

The docking pipeline compiles one program per (bucket, poses) key; a cold
DiffDock-L compile is minutes on TPU. The reference has no analogue (torch
eager). Enabling JAX's persistent compilation cache makes every compile
after the first — across processes and across eval sweeps — a disk load
instead, which turns the per-bucket compile churn of a realistic
complex-size distribution (see bench.py --churn) into a one-time cost.

Opt out with ``DIFFDOCK_TPU_NO_COMPILE_CACHE=1``; redirect with
``DIFFDOCK_TPU_COMPILE_CACHE=<dir>``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "diffdock_tpu", "xla_cache"
)

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the JAX persistent compilation cache.

    Returns the cache dir, or None when disabled by env or unsupported.
    """
    global _enabled
    if os.environ.get("DIFFDOCK_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("DIFFDOCK_TPU_COMPILE_CACHE")
        or _DEFAULT_DIR
    )
    if _enabled:
        return cache_dir
    try:
        import jax

        # XLA:CPU AOT cache entries record compile-machine features that can
        # mismatch the executing host (SIGILL risk observed in this image);
        # the cache's payoff is TPU compiles anyway, so gate on backend.
        if jax.default_backend() == "cpu":
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        return cache_dir
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
