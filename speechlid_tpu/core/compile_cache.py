"""Persistent XLA compilation cache.

On this class of TPU deployment (remote compile service) a cold graph costs
minutes; the cache turns every repeat run — reruns, sweeps, serving
restarts, eval grids — into millisecond loads.  Enabled by default in all
CLI entry points; opt out with SPEECHLID_NO_COMPILE_CACHE=1 or relocate via
SPEECHLID_COMPILE_CACHE_DIR.

Seeding from a snapshot directory is OPT-IN ONLY: set
``SPEECHLID_CACHE_SEED_DIR`` to a directory of previously captured cache
entries (e.g. on a shared scratch volume) and they are *copied* — never
hard-linked — into the runtime cache on enable.  No seed snapshot is
committed to the repository: pre-baked compiled artifacts in git would be
an unauditable supply-chain surface and would defeat any timing gate that
is supposed to measure real cold-compile cost.  Entries are keyed by
XLA/jax version + platform + flags, so stale seeds are harmless misses.
"""

from __future__ import annotations

import logging
import os
import shutil


def seed_cache(cache_dir: str, seed_dir: str | None = None) -> int:
    """Copy seed entries into ``cache_dir`` (opt-in; see module docstring).

    Only regular files whose names look like XLA cache entries are copied,
    and only when absent from ``cache_dir``.  Copies (not hard links) keep
    the seed directory immutable: XLA may rewrite runtime entries in place,
    and a shared inode would silently mutate the source.  Returns the
    number of entries copied.  Never raises: a broken seed must not take
    down the run it was meant to speed up.
    """
    seed = seed_dir or os.environ.get("SPEECHLID_CACHE_SEED_DIR")
    if not seed or not os.path.isdir(seed):
        return 0
    n = 0
    try:
        names = os.listdir(seed)
    except OSError:
        return 0
    for name in names:
        if not name.endswith("-cache"):  # skip READMEs / strays
            continue
        src = os.path.join(seed, name)
        dst = os.path.join(cache_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
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
        if seeded:
            logging.info("XLA compilation cache: %s (%d seeded)",
                         cache_dir, seeded)
        else:
            logging.info("XLA compilation cache: %s", cache_dir)
        return cache_dir
    except Exception as e:  # older jax or read-only fs — run uncached
        logging.warning("compilation cache disabled: %s", e)
        return None
