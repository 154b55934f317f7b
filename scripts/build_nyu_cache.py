"""Build the NYUv2 preprocessed cache (one-time; see data/nyu_cache.py).

Decodes every PNG through the exact per-sample Python path and persists the
prepared arrays as memmaps, turning the host input path from PNG-decode
bound (~31 img/s) into a memcpy (>1000 img/s).

Usage: python scripts/build_nyu_cache.py [--data_dir DIR] [--stage train|test|both] [--force]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=None, help="NYUv2 root (default: cfg)")
    p.add_argument("--stage", choices=["train", "test", "both"], default="both")
    p.add_argument("--force", action="store_true", help="rebuild even if valid")
    args = p.parse_args()

    from vision_mtl_tpu.data.nyu_cache import build_cache
    from vision_mtl_tpu.data.nyuv2 import NYUv2

    stages = ["train", "test"] if args.stage == "both" else [args.stage]
    for stage in stages:
        ds = NYUv2(stage=stage, data_base_dir=args.data_dir)
        t0 = time.perf_counter()
        cdir = build_cache(ds, force=args.force)
        dt = time.perf_counter() - t0
        print(f"{stage}: {len(ds)} samples -> {cdir}  ({dt:.1f}s)")


if __name__ == "__main__":
    main()
