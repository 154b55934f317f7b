"""Host-side resize transforms executed by the input pipeline.

Replaces the reference's albumentations (Cityscapes: A.Resize — bilinear for
images, nearest for masks, cfg.py:103-114) and torchvision (NYUv2:
Resize(256,256, antialias=True) — bilinear+antialias applied to ALL streams
including the mask, cfg.py:144-155 — reproduced, see docs/QUIRKS.md).

Implemented with PIL (bilinear/nearest; PIL's bilinear downscale is
area-averaged, matching torchvision's antialias=True closely).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from vision_mtl_tpu.cfg import ResizeSpec


def _resize2d(arr: np.ndarray, h: int, w: int, resample: int) -> np.ndarray:
    if arr.shape[0] == h and arr.shape[1] == w:
        return arr
    im = Image.fromarray(arr)
    return np.asarray(im.resize((w, h), resample=resample))


def resize_image(img: np.ndarray, spec: ResizeSpec) -> np.ndarray:
    """(H,W,3) float/uint8 image, bilinear."""
    if img.shape[0] == spec.height and img.shape[1] == spec.width:
        return img
    chans = [
        _resize2d(
            img[..., c].astype(np.float32), spec.height, spec.width, Image.BILINEAR
        )
        for c in range(img.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def resize_mask(
    mask: np.ndarray, spec: ResizeSpec, bilinear: bool = False
) -> np.ndarray:
    """(H,W) labels. Nearest by default (albumentations mask semantics);
    ``bilinear=True`` reproduces NYUv2's antialiased label resize quirk."""
    if mask.shape[0] == spec.height and mask.shape[1] == spec.width:
        return mask
    if bilinear:
        out = _resize2d(
            mask.astype(np.float32), spec.height, spec.width, Image.BILINEAR
        )
        return out
    if mask.dtype == np.int64:
        # PIL has no 64-bit integer mode ("Cannot handle this data type");
        # label ids fit int32 trivially. Hit by the Python fallback path on
        # raw Kaggle int64 label npys (the native C++ path resizes itself).
        mask = mask.astype(np.int32)
    return _resize2d(mask, spec.height, spec.width, Image.NEAREST)


def resize_depth(
    depth: np.ndarray, spec: ResizeSpec, bilinear: bool = False
) -> np.ndarray:
    """(H,W) or (H,W,1) depth. Nearest for Cityscapes (albumentations mask
    target), bilinear for NYUv2 (torchvision transform)."""
    squeeze = depth.ndim == 3
    d2 = depth[..., 0] if squeeze else depth
    resample = Image.BILINEAR if bilinear else Image.NEAREST
    out = _resize2d(d2.astype(np.float32), spec.height, spec.width, resample)
    return out[..., None] if squeeze else out
