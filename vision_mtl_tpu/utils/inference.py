"""Inference helpers (reference utils/inference_utils.py:5-18 — notebook-
facing API kept for surface parity, generalized past the reference's
19-class hardcode)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp


def get_segm_preds(
    valid_mask: jax.Array,
    segm_logits: jax.Array,
    num_classes: t.Optional[int] = None,
) -> t.Tuple[jax.Array, jax.Array]:
    """Softmax probabilities and argmax predictions restricted to a validity
    mask; invalid pixels get probability 0 and class -1.

    Args:
      valid_mask: (B, H, W) bool.
      segm_logits: (B, H, W, C) float (NHWC — the reference is NCHW).
    Returns (probs (B,H,W,C), preds (B,H,W) int32).
    """
    del num_classes  # inferred from logits; kept for signature parity
    probs = jax.nn.softmax(segm_logits.astype(jnp.float32), axis=-1)
    probs = jnp.where(valid_mask[..., None], probs, 0.0)
    preds = jnp.where(
        valid_mask, jnp.argmax(probs, axis=-1).astype(jnp.int32), -1
    )
    return probs, preds
