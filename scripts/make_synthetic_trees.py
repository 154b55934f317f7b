"""Fabricate reference-scale on-disk dataset trees for dress rehearsals.

No Cityscapes/NYUv2 data exists in this container (zero egress), so the
full-protocol rehearsal of the reference's training scripts
(scripts/train_cityscapes.sh: mtan 20 epochs bs8; scripts/train_nyu.sh:
basic 50 epochs bs4 — reference scripts/:8-15) runs against synthetic
trees with the REAL on-disk layouts and the REAL dataset sizes:

  * cityscapes: {root}/{train,val}/{image,label,depth}/*.npy — 2975/500
    triples at 128x256, labels in [-1, 18] (exercises the ignore fold-in,
    QUIRKS #3), inverse depth in [0,1] (reference README.md:26).
  * nyuv2: {root}/{train,test}_{rgb,seg13,depth}/*.png — 795/654 at
    480x640 (uint8 rgb, uint8 seg13 in [0,13], uint16 depth = meters*1e4;
    reference README.md:34) — resized to 256x256 by the pipeline.

Content is a learnable smooth-field recipe with one deliberate change
from data/synthetic.py's (which is frozen — the twin-study test bounds
derive from it): segmentation masks are EQUAL-MASS QUANTILE BANDS of a
smooth scalar of the image, not the argmax of random hyperplanes. The
argmax recipe leaves most of the 19/14 classes empty (the upper envelope
of K random hyperplanes over a 3-cube has few active facets), which
pinned the rehearsal's macro jaccard at ~0.14 no matter how well the
model trained (VERDICT r4 weak #5). With bands, every class carries
~equal pixel mass and errors land in ADJACENT bands, so the rehearsal's
jaccard sits in the sensitive 0.3-0.7 range and actually moves on
regressions.

Usage: python scripts/make_synthetic_trees.py [--dataset both]
           [--cityscapes_dir DIR] [--nyu_dir DIR] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vision_mtl_tpu.data.synthetic import _smooth  # noqa: E402


#: fixed scalar direction whose quantile bands define the mask classes
_BAND_VEC = np.array([0.55, -0.35, 0.75], np.float32)


def _band_edges(n_classes: int, samples: int = 48) -> np.ndarray:
    """Equal-mass band edges for ``img @ _BAND_VEC``, calibrated once from
    the recipe's own distribution (fixed seed -> deterministic trees)."""
    rs = np.random.default_rng(123)
    vals = []
    for _ in range(samples):
        base = rs.normal(size=(64, 64, 3)).astype(np.float32)
        img = _smooth(base)
        img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
        vals.append((img @ _BAND_VEC).ravel())
    q = np.linspace(0.0, 1.0, n_classes + 1)[1:-1]
    return np.quantile(np.concatenate(vals), q)


def _fields(
    rng: np.random.Generator, h: int, w: int, edges: np.ndarray, up: int = 1
):
    """Learnable sample recipe: smooth random field; mask = equal-mass
    quantile band of a fixed scalar of the image (see module docstring);
    depth a fixed smooth function, as in data/synthetic.py. ``up``:
    generate the smooth field at (h/up, w/up) and nearest-upsample — the
    box smoothing dominates generation time at 480x640 and fidelity is
    irrelevant here."""
    base = rng.normal(size=(h // up, w // up, 3)).astype(np.float32)
    img = _smooth(base)
    if up > 1:
        img = np.repeat(np.repeat(img, up, axis=0), up, axis=1)
    img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    mask = np.digitize(img @ _BAND_VEC, edges)
    depth = 1.0 / (1.0 + np.exp(-(img[..., 0] - img[..., 2])))
    return img, mask, depth


def make_cityscapes(root: str, n_train: int, n_val: int) -> None:
    edges = _band_edges(19)
    for stage, n in (("train", n_train), ("val", n_val)):
        for sub in ("image", "label", "depth"):
            os.makedirs(os.path.join(root, stage, sub), exist_ok=True)
        t0 = time.perf_counter()
        for i in range(n):
            rng = np.random.default_rng(
                i if stage == "train" else 1_000_000 + i
            )
            img, mask, depth = _fields(rng, 128, 256, edges)
            mask = mask.astype(np.int64)
            # a strip of ignore labels exercises the -1 -> 18 fold-in
            mask[: rng.integers(2, 8), :] = -1
            np.save(os.path.join(root, stage, "image", f"{i:05d}.npy"), img)
            np.save(os.path.join(root, stage, "label", f"{i:05d}.npy"), mask)
            np.save(
                os.path.join(root, stage, "depth", f"{i:05d}.npy"),
                depth.astype(np.float32),
            )
        print(
            f"cityscapes/{stage}: {n} triples -> {root}/{stage} "
            f"({time.perf_counter() - t0:.1f}s)"
        )


def make_nyuv2(root: str, n_train: int, n_test: int) -> None:
    from PIL import Image

    edges = _band_edges(14)
    h, w = 480, 640
    for stage, n in (("train", n_train), ("test", n_test)):
        for part in ("rgb", "seg13", "depth"):
            os.makedirs(os.path.join(root, f"{stage}_{part}"), exist_ok=True)
        t0 = time.perf_counter()
        for i in range(n):
            rng = np.random.default_rng(
                2_000_000 + (i if stage == "train" else 500_000 + i)
            )
            img, mask, depth01 = _fields(rng, h, w, edges, up=4)
            name = f"{i + 1:05d}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, f"{stage}_rgb", name)
            )
            Image.fromarray(mask.astype(np.uint8)).save(
                os.path.join(root, f"{stage}_seg13", name)
            )
            # meters in (0.5, 9.9] * 1e4, the uint16 on-disk convention
            depth16 = ((0.5 + depth01 * 9.4) * 1e4).astype(np.uint16)
            Image.fromarray(depth16).save(
                os.path.join(root, f"{stage}_depth", name)
            )
        print(
            f"nyuv2/{stage}: {n} png triples -> {root} "
            f"({time.perf_counter() - t0:.1f}s)"
        )


def main() -> None:
    from vision_mtl_tpu.cfg import cityscapes_data_cfg, nyuv2_data_cfg

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["cityscapes", "nyuv2", "both"], default="both")
    p.add_argument("--cityscapes_dir", default=cityscapes_data_cfg.data_dir)
    p.add_argument("--nyu_dir", default=nyuv2_data_cfg.data_dir)
    p.add_argument(
        "--scale", type=float, default=1.0,
        help="scale the reference dataset sizes (1.0 = 2975/500 + 795/654)",
    )
    args = p.parse_args()

    s = args.scale
    if args.dataset in ("cityscapes", "both"):
        make_cityscapes(
            args.cityscapes_dir, max(1, int(2975 * s)), max(1, int(500 * s))
        )
    if args.dataset in ("nyuv2", "both"):
        make_nyuv2(args.nyu_dir, max(1, int(795 * s)), max(1, int(654 * s)))


if __name__ == "__main__":
    main()
