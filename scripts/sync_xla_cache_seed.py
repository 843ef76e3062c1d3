#!/usr/bin/env python
"""Refresh the committed XLA-cache seed from the runtime cache.

The runtime cache (~/.cache/speechlid_tpu/xla_cache) is lost whenever the
container is re-materialized; the git tree survives.  This script snapshots
the runtime cache into tools/xla_cache_seed/ so the FIRST run in a fresh
container — most importantly the driver's ``timeout 600 python bench.py``
gate — starts with warm compiles instead of multi-minute cold ones.

Usage:  python scripts/sync_xla_cache_seed.py [--max-mb 200] [--prune]

--prune removes seed entries that no longer exist in the runtime cache
(e.g. entries invalidated by a code change); default keeps them (they are
harmless misses and may serve a rolled-back tree).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(REPO, "tools", "xla_cache_seed")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=os.environ.get(
        "SPEECHLID_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "speechlid_tpu",
                     "xla_cache")))
    ap.add_argument("--seed-dir", default=SEED)
    ap.add_argument("--max-mb", type=float, default=200.0,
                    help="total seed size cap; largest entries kept first "
                         "(they are the expensive compiles)")
    ap.add_argument("--prune", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(args.cache_dir):
        print(f"no runtime cache at {args.cache_dir}", file=sys.stderr)
        return 1
    os.makedirs(args.seed_dir, exist_ok=True)

    entries = []
    for name in os.listdir(args.cache_dir):
        p = os.path.join(args.cache_dir, name)
        if os.path.isfile(p):
            entries.append((os.path.getsize(p), name))
    # Largest first: big entries are the multi-minute compiles whose
    # warmth matters; tiny ones recompile in seconds anyway.
    entries.sort(reverse=True)

    budget = args.max_mb * 1e6
    copied = skipped = 0
    kept = set()
    for size, name in entries:
        if budget - size < 0:
            skipped += 1
            continue
        budget -= size
        kept.add(name)
        dst = os.path.join(args.seed_dir, name)
        src = os.path.join(args.cache_dir, name)
        if (os.path.exists(dst)
                and os.path.getsize(dst) == size
                and os.path.getmtime(dst) >= os.path.getmtime(src)):
            continue
        shutil.copy2(src, dst)
        copied += 1

    pruned = 0
    if args.prune:
        for name in os.listdir(args.seed_dir):
            if name not in kept:
                os.remove(os.path.join(args.seed_dir, name))
                pruned += 1

    total = sum(
        os.path.getsize(os.path.join(args.seed_dir, f))
        for f in os.listdir(args.seed_dir)
        if os.path.isfile(os.path.join(args.seed_dir, f)))
    print(f"seed: {copied} copied, {skipped} over-budget, {pruned} pruned, "
          f"{len(os.listdir(args.seed_dir))} entries, "
          f"{total/1e6:.1f} MB at {args.seed_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
