"""Persistent XLA compilation cache.

On this class of TPU deployment (remote compile service) a cold graph costs
minutes; the cache turns every repeat run — reruns, sweeps, serving
restarts, eval grids — into millisecond loads.  Enabled by default in all
CLI entry points; opt out with SPEECHLID_NO_COMPILE_CACHE=1 or relocate via
SPEECHLID_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import logging
import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SPEECHLID_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = path or os.environ.get(
        "SPEECHLID_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "speechlid_tpu",
                     "xla_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        logging.info("XLA compilation cache: %s", cache_dir)
        return cache_dir
    except Exception as e:  # older jax or read-only fs — run uncached
        logging.warning("compilation cache disabled: %s", e)
        return None
