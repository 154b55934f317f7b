"""One-time preprocessed cache for the NYUv2 host input path.

The raw NYUv2 pipeline is PNG-decode-bound (~31 img/s on this host vs
~1900 img/s device compute — docs/BENCH_NOTES.md), so real epochs would
idle the chip ~98% of the time. This module decodes every sample ONCE
through the exact per-sample Python path (NYUv2.load_raw_sample +
prepare_sample — all reference quirks included: mask un-scaling, uint16/1e4
depth, antialiased bilinear resize of every stream; reference
nyuv2.py:93-133) and writes the prepared arrays to flat ``.npy`` memmaps:

    {data_dir}/_cache/{stage}_{H}x{W}_v1/
        img.npy    (N, H, W, 3) float32   — exactly prepare_sample's output
        mask.npy   (N, H, W)    uint8     — int32 on read (values are 0..255)
        depth.npy  (N, H, W, 1) float32
        meta.json  {version, n, height, width, max_depth, filenames_sha1,
                    source_sig (size+mtime content fingerprint)}

``NYUv2.load_batch`` serves training batches straight from the memmaps
(a fancy-index gather = one memcpy per stream), so the cached path is
byte-identical to the Python path by construction — meta.json pins the
file list, shape, and max_depth so a stale cache is never silently used.

Build: ``python scripts/build_nyu_cache.py --data_dir ... `` or set
``VMTL_BUILD_NYU_CACHE=1`` to build lazily on first dataset construction.
"""

from __future__ import annotations

import hashlib
import json
import os
import typing as t

import numpy as np

CACHE_VERSION = 1


def _filenames_sha1(filenames: t.Sequence[str]) -> str:
    h = hashlib.sha1()
    for fn in filenames:
        h.update(fn.encode())
        h.update(b"\0")
    return h.hexdigest()


def _source_sig(ds: t.Any) -> str:
    """Content fingerprint of the source PNGs (size + mtime per file).
    Without it, a dataset tree regenerated IN PLACE (same filenames — e.g.
    scripts/make_synthetic_trees.py rerun, or a corrected data drop) would
    silently keep serving the stale cache. stat-only: ~2400 stats, no
    reads."""
    h = hashlib.sha1()
    parts = ["rgb", "seg13", "depth"] + (
        ["sn"] if getattr(ds, "use_sn", False) else []
    )
    for part in parts:
        d = os.path.join(ds.data_base_dir, f"{ds.stage}_{part}")
        for fn in ds.filenames:
            try:
                st = os.stat(os.path.join(d, fn))
                h.update(f"{part}/{fn}:{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(f"{part}/{fn}:missing".encode())
    return h.hexdigest()


def cache_dir_for(ds: t.Any) -> str:
    spec = ds.transform
    tag = f"{spec.height}x{spec.width}" if spec is not None else "raw"
    return os.path.join(
        ds.data_base_dir, "_cache", f"{ds.stage}_{tag}_v{CACHE_VERSION}"
    )


def _meta_for(ds: t.Any, shapes: t.Dict[str, tuple]) -> t.Dict[str, t.Any]:
    return {
        "version": CACHE_VERSION,
        "n": len(ds),
        "height": int(shapes["img"][0]),
        "width": int(shapes["img"][1]),
        "max_depth": float(ds.max_depth),
        "filenames_sha1": _filenames_sha1(ds.filenames),
        "source_sig": _source_sig(ds),
    }


def build_cache(ds: t.Any, force: bool = False) -> str:
    """Decode every sample through the exact Python path and persist the
    prepared arrays. Idempotent: a valid existing cache is kept unless
    ``force``. Concurrent builders (every process of a pod launch reaches
    here under ``VMTL_BUILD_NYU_CACHE=1``; tuning threads construct datasets
    too) are serialized by an ``flock`` — without it two writers truncate
    each other's live ``.tmp`` memmaps and the torn arrays would still pass
    the metadata-only validity probe. Returns the cache directory."""
    from vision_mtl_tpu.utils.io import file_lock

    cdir = cache_dir_for(ds)
    if not force and cache_valid(ds):
        return cdir
    os.makedirs(cdir, exist_ok=True)
    with file_lock(os.path.join(cdir, ".build.lock")):
        return _build_cache_locked(ds, force, cdir)


def _build_cache_locked(ds: t.Any, force: bool, cdir: str) -> str:
    # revalidate under the lock: a concurrent builder may have finished
    # (and published) while this process waited on the flock
    if not force and cache_valid(ds):
        return cdir

    first = ds.prepare_sample(ds.load_raw_sample(0), ds.transform)
    n = len(ds)
    shapes = {k: v.shape for k, v in first.items()}
    # write to temp names; rename after the full pass so a crashed build is
    # never mistaken for a complete cache (meta.json is written last)
    mm = {
        "img": np.lib.format.open_memmap(
            os.path.join(cdir, "img.npy.tmp"),
            mode="w+",
            dtype=np.float32,
            shape=(n,) + shapes["img"],
        ),
        "mask": np.lib.format.open_memmap(
            os.path.join(cdir, "mask.npy.tmp"),
            mode="w+",
            dtype=np.uint8,
            shape=(n,) + shapes["mask"],
        ),
        "depth": np.lib.format.open_memmap(
            os.path.join(cdir, "depth.npy.tmp"),
            mode="w+",
            dtype=np.float32,
            shape=(n,) + shapes["depth"],
        ),
    }

    def put(i: int, sample: t.Dict[str, np.ndarray]) -> None:
        mm["img"][i] = sample["img"]
        mask = sample["mask"]
        assert mask.min() >= 0 and mask.max() <= 255, (
            "mask out of uint8 range; cache layout assumes reference "
            "un-scaling semantics (values 0..255)"
        )
        mm["mask"][i] = mask.astype(np.uint8)
        mm["depth"][i] = sample["depth"]

    put(0, first)
    for i in range(1, n):
        put(i, ds.prepare_sample(ds.load_raw_sample(i), ds.transform))

    for key, arr in mm.items():
        arr.flush()
        del arr
    mm.clear()
    for key in ("img", "mask", "depth"):
        os.replace(
            os.path.join(cdir, f"{key}.npy.tmp"),
            os.path.join(cdir, f"{key}.npy"),
        )
    from vision_mtl_tpu.utils.io import atomic_write_json

    atomic_write_json(os.path.join(cdir, "meta.json"), _meta_for(ds, shapes))
    # a dataset that already probed for a cache (load_batch -> None) latched
    # the miss; reset so its next load_batch picks up the fresh cache
    # instead of silently staying on the ~60x slower per-sample path
    if hasattr(ds, "_cache_checked"):
        ds._cache_checked = False
        ds._cache = None
    return cdir


def cache_valid(ds: t.Any) -> bool:
    """Metadata-only validity probe for this dataset's (stage, transform,
    max_depth, file list) — opens NO array memmaps, so it is the right check
    for callers that only need a yes/no (build_cache's idempotency guard)."""
    cdir = cache_dir_for(ds)
    meta_path = os.path.join(cdir, "meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    expected = {
        "version": CACHE_VERSION,
        "n": len(ds),
        "max_depth": float(ds.max_depth),
        "filenames_sha1": _filenames_sha1(ds.filenames),
        "source_sig": _source_sig(ds),
    }
    if any(meta.get(k) != v for k, v in expected.items()):
        return False
    return all(
        os.path.exists(os.path.join(cdir, f"{k}.npy"))
        for k in ("img", "mask", "depth")
    )


def open_cache(ds: t.Any) -> t.Optional[t.Dict[str, np.ndarray]]:
    """Open a cache for this dataset's (stage, transform, max_depth, file
    list); None when absent or stale."""
    if not cache_valid(ds):
        return None
    cdir = cache_dir_for(ds)
    try:
        return {
            k: np.load(os.path.join(cdir, f"{k}.npy"), mmap_mode="r")
            for k in ("img", "mask", "depth")
        }
    except (OSError, ValueError):
        return None
