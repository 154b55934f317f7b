"""Input-pipeline + end-to-end epoch throughput benchmark.

Generates a fake Cityscapes npy tree (shape-faithful), then measures:
  1. host loader throughput — native C++ path vs pure-Python path
  2. full train-epoch throughput (loader + H2D prefetch + fused train step)

Usage: python scripts/bench_pipeline.py [--samples 256] [--batch_size 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root: str, n: int, h: int = 128, w: int = 256) -> None:
    rng = np.random.default_rng(0)
    for sub in ("image", "label", "depth"):
        os.makedirs(os.path.join(root, "train", sub), exist_ok=True)
    for i in range(n):
        np.save(
            os.path.join(root, "train", "image", f"{i:05d}.npy"),
            rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32),
        )
        np.save(
            os.path.join(root, "train", "label", f"{i:05d}.npy"),
            rng.integers(-1, 19, size=(h, w)).astype(np.int64),
        )
        np.save(
            os.path.join(root, "train", "depth", f"{i:05d}.npy"),
            rng.uniform(0, 1, size=(h, w)).astype(np.float32),
        )


def make_nyu_tree(root: str, n: int, h: int = 480, w: int = 640) -> None:
    """Shape/format-faithful fake NYUv2 PNG tree (8-bit rgb, 8-bit seg13,
    16-bit depth = meters*1e4 — reference nyuv2.py:148-166)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub in ("rgb", "seg13", "depth"):
        os.makedirs(os.path.join(root, f"train_{sub}"), exist_ok=True)
    for i in range(n):
        fn = f"{i:05d}.png"
        Image.fromarray(
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ).save(os.path.join(root, "train_rgb", fn))
        Image.fromarray(
            rng.integers(0, 14, size=(h, w)).astype(np.uint8)
        ).save(os.path.join(root, "train_seg13", fn))
        Image.fromarray(
            rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
        ).save(os.path.join(root, "train_depth", fn))


def bench_nyu_loader(args) -> None:
    from vision_mtl_tpu.data import native
    from vision_mtl_tpu.data.loader import DataLoader
    from vision_mtl_tpu.data.nyuv2 import NYUv2

    tmp = tempfile.mkdtemp(prefix="nyu_bench_")
    n = min(args.samples, 64)  # 480x640 pngs are ~100x cityscapes npys
    print(f"Generating {n} fake NYUv2 samples (480x640 PNG) in {tmp} ...")
    make_nyu_tree(tmp, n)
    # test split just mirrors train here
    for sub in ("rgb", "seg13", "depth"):
        os.symlink(
            os.path.join(tmp, f"train_{sub}"), os.path.join(tmp, f"test_{sub}")
        )

    import vision_mtl_tpu.data.nyuv2 as nyu_mod

    for name, use_native in (("python/PIL", False), ("native C++", True)):
        if use_native and not native.available():
            print("native lib unavailable; skipping")
            continue
        ds = NYUv2(stage="train", data_base_dir=tmp)
        if use_native:
            # the dataset prefers PIL when importable (measured faster;
            # data/nyuv2.py) — hide it so this leg times the native decoder
            orig_image = nyu_mod.Image
            nyu_mod.Image = None
        try:
            dl = DataLoader(
                ds,
                batch_size=args.batch_size,
                shuffle=True,
                drop_last=False,
                num_workers=args.num_workers,
            )
            n_img = 0
            t0 = time.perf_counter()
            for batch in dl:
                n_img += batch["img"].shape[0]
            dt = time.perf_counter() - t0
            print(f"nyu loader[{name:10s}]: {n_img / dt:8.0f} images/sec (host)")
        finally:
            if use_native:
                nyu_mod.Image = orig_image

    # preprocessed-cache path (data/nyu_cache.py): one-time decode, then
    # memmap gathers — the round-3 fix for the ~60x host-bound NYUv2 epoch
    from vision_mtl_tpu.data.nyu_cache import build_cache

    ds = NYUv2(stage="train", data_base_dir=tmp)
    t0 = time.perf_counter()
    build_cache(ds)
    print(f"nyu cache build: {len(ds) / (time.perf_counter() - t0):8.0f} images/sec (one-time)")
    for rep in range(2):
        dl = DataLoader(
            ds,
            batch_size=args.batch_size,
            shuffle=True,
            drop_last=False,
            num_workers=args.num_workers,
        )
        n_img = 0
        t0 = time.perf_counter()
        for batch in dl:
            n_img += batch["img"].shape[0]
        dt = time.perf_counter() - t0
        tag = "cold page cache" if rep == 0 else "warm"
        print(f"nyu loader[cached {tag:15s}]: {n_img / dt:8.0f} images/sec (host)")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--nyu", action="store_true", help="also bench the NYUv2 PNG host path")
    args = p.parse_args()

    if args.nyu:
        bench_nyu_loader(args)

    tmp = tempfile.mkdtemp(prefix="cs_bench_")
    print(f"Generating {args.samples} fake cityscapes samples in {tmp} ...")
    make_tree(tmp, args.samples)

    from vision_mtl_tpu.data.cityscapes import CityscapesDataset
    from vision_mtl_tpu.data.loader import DataLoader
    from vision_mtl_tpu.data import native

    ds = CityscapesDataset(stage="train", data_base_dir=tmp)

    # ---- 1. host loader throughput ----
    for name, use_native in (("python", False), ("native C++", True)):
        if use_native and not native.available():
            print("native lib unavailable; skipping")
            continue
        dl = DataLoader(
            ds,
            batch_size=args.batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=args.num_workers,
        )
        if not use_native:
            dl.dataset = _NoNative(ds)
        n_img = 0
        t0 = time.perf_counter()
        for batch in dl:
            n_img += batch["img"].shape[0]
        dt = time.perf_counter() - t0
        print(f"loader[{name:10s}]: {n_img / dt:8.0f} images/sec (host)")

    if args.skip_train:
        return

    # ---- 2. full train epoch on device ----
    import jax
    import jax.numpy as jnp

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.data.loader import prefetch_to_device
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_train_step

    model = build_model(
        argparse.Namespace(model_name="basic", channel_wise_stitching=True),
        cityscapes_data_cfg,
        dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((args.batch_size, 128, 256, 3)),
        lr=5e-4,
    )
    step = make_train_step(model)
    mstate = init_metrics(19)

    for epoch in range(args.epochs):
        dl = DataLoader(
            ds,
            batch_size=args.batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=args.num_workers,
        )
        n_img = 0
        t0 = time.perf_counter()
        for batch in prefetch_to_device(dl, None, size=2):
            state, mstate, losses = step(state, batch, mstate)
            n_img += args.batch_size
        loss = float(losses["loss"])  # sync
        dt = time.perf_counter() - t0
        tag = "compile+epoch" if epoch == 0 else "epoch"
        print(
            f"{tag}: {n_img / dt:8.0f} images/sec end-to-end "
            f"(loss {loss:.3f})"
        )


class _NoNative:
    """Wrapper hiding load_batch to force the python path."""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        return self._ds[i]


if __name__ == "__main__":
    main()
