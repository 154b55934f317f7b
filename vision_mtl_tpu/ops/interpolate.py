"""Resize / padding primitives for NHWC feature maps, written to map well
onto TPU (static shapes, MXU-friendly separable interpolation).

These replace the reference's ``F.interpolate`` / ``nn.Upsample`` calls:
  * nearest x2 upsampling (smp Unet decoder blocks; CSNet last decoder block,
    reference cross_stitch_model.py:132-134) -> ``upsample_nearest_2x`` via
    jnp.repeat (exact match of torch nearest for integer scale factors).
  * bilinear align_corners=True (MTAN decoder upsample, reference
    mtan_model.py:125) -> ``resize_bilinear_align_corners`` implemented as two
    separable 1-D interpolation matmuls, which XLA tiles onto the MXU instead
    of emitting gather ops.
  * pad-then-concat skip merge (reference
    utils/model_utils.py:46-58) -> ``pad_to_match`` + concat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsample, NHWC. Matches torch
    F.interpolate(scale_factor=2, mode='nearest') exactly."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


@functools.lru_cache(maxsize=128)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) linear interpolation matrix with torch
    align_corners=True semantics (host-computed, static)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True, NHWC, as two separable
    matmuls (rows then cols)."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    dtype = x.dtype
    mh = jnp.asarray(_align_corners_matrix(h, out_h), dtype=jnp.float32)
    mw = jnp.asarray(_align_corners_matrix(w, out_w), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    # rows: (B,H,W,C) x (out_h,H) -> (B,out_h,W,C)
    xf = jnp.einsum("bhwc,oh->bowc", xf, mh, precision=jax.lax.Precision.HIGHEST)
    # cols: (B,out_h,W,C) x (out_w,W) -> (B,out_h,out_w,C)
    xf = jnp.einsum("bhwc,ow->bhoc", xf, mw, precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)


def pad_to_match(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Zero-pad x1 spatially (centered) to x2's H,W — NHWC equivalent of the
    reference's concat_slightly_diff_sized_tensors padding step
    (utils/model_utils.py:46-58). Note: when the size difference is large
    (e.g. a 2x scale gap in CSNet's decoder) this really does zero-pad rather
    than upsample; that is the reference's behavior, reproduced deliberately
    (docs/QUIRKS.md)."""
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    return jnp.pad(
        x1,
        (
            (0, 0),
            (dy // 2, dy - dy // 2),
            (dx // 2, dx - dx // 2),
            (0, 0),
        ),
    )


def pad_concat(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """concat([x2, pad(x1)]) along channels — reference
    utils/model_utils.py:57 ordering (x2 first)."""
    return jnp.concatenate([x2, pad_to_match(x1, x2)], axis=-1)
