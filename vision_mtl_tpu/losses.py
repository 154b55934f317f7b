"""Task losses, fused on-device.

Semantics replicate the reference exactly (verified empirically against
torch 2.x):

  * Segmentation: mean cross-entropy over all pixels, no ignore_index
    (reference lit_module.py:31,123).
  * Depth: SILog (AdaBins-style, reference losses.py:7-36). The reference
    feeds sigmoid-squashed predictions of shape (B,H,W,1) and depth targets of
    shape (B,H,W,1); its ``F.interpolate(pred, target.shape[-2:])`` is then an
    identity (size == (W,1) == input spatial dims), so the effective
    computation is: mask = target > min_depth; g = log(pred) - log(target)
    over masked pixels; loss = 10*sqrt(Var_unbiased(g) + 0.15*mean(g)^2).
    torch.var defaults to the unbiased (N-1) estimator — replicated here.
  * Combined: w_segm * CE + w_depth * SILog (reference lit_module.py:120-131).

All functions are shape-polymorphic pure jnp and safe under jit; the masked
SILog uses where-based masking (no dynamic shapes).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    valid: t.Optional[jax.Array] = None,
) -> jax.Array:
    """Mean softmax cross-entropy.

    Args:
      logits: (B, H, W, C) float.
      labels: (B, H, W) int class ids in [0, C).
      valid: optional (B,) per-sample weights (padded-batch support) — the
        mean is taken over valid samples only, so a padded final eval batch
        reproduces the reference's smaller-last-batch mean exactly.
    """
    # logsumexp - selected logit: avoids materializing the full (B,H,W,C)
    # log-softmax tensor (multi-GB of HBM traffic at scale); per-element
    # math is f32 regardless of (possibly bf16) logit storage.
    # The label logit is selected via an exact one-hot multiply-reduce, NOT
    # take_along_axis: XLA lowers that gather pathologically on TPU (~65 ms
    # per train step at bs128 128x256 — measured, docs/BENCH_NOTES.md round-2
    # "the CE gather"), while the one-hot form is a lane-local elementwise op
    # whose backward is also elementwise (no scatter). one_hot values are
    # exact {0,1} floats, so picked is bit-identical to the gather.
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    sel = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    picked = jnp.sum(logits * sel, axis=-1)
    nll = lse - picked
    if valid is None:
        return jnp.mean(nll)
    w = valid.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(jnp.sum(w) * nll.shape[1] * nll.shape[2], 1.0)
    return jnp.sum(nll * w) / denom


def silog_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: t.Optional[jax.Array] = None,
    min_depth: float = 1e-3,
    valid: t.Optional[jax.Array] = None,
) -> jax.Array:
    """Scale-invariant log loss with validity masking.

    Args:
      pred: (B, H, W, 1) strictly-positive depth predictions (post-sigmoid).
      target: (B, H, W, 1) ground-truth depth.
      mask: optional boolean validity mask; defaults to target > min_depth.
      valid: optional (B,) per-sample weights, AND-ed into the mask.

    Returns scalar: 10 * sqrt(Var_unbiased(g) + 0.15 * mean(g)^2) over masked
    pixels, g = log(pred) - log(target).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is None:
        mask = target > min_depth
    if valid is not None:
        mask = jnp.logical_and(
            mask, (valid > 0).reshape((-1,) + (1,) * (mask.ndim - 1))
        )
    mask_f = mask.astype(jnp.float32)
    n = jnp.sum(mask_f)
    safe_target = jnp.where(mask, target, 1.0)
    safe_pred = jnp.where(mask, jnp.maximum(pred, 1e-12), 1.0)
    g = jnp.where(mask, jnp.log(safe_pred) - jnp.log(safe_target), 0.0)
    n_safe = jnp.maximum(n, 1.0)
    mean_g = jnp.sum(g) / n_safe
    # unbiased variance (torch.var default) with masked denominator n-1
    var_g = jnp.sum(jnp.where(mask, (g - mean_g) ** 2, 0.0)) / jnp.maximum(
        n - 1.0, 1.0
    )
    dg = var_g + 0.15 * mean_g**2
    return 10.0 * jnp.sqrt(jnp.maximum(dg, 0.0))


def calc_loss(
    out: t.Dict[str, jax.Array],
    gt_mask: jax.Array,
    gt_depth: jax.Array,
    segm_criterion: t.Callable[..., jax.Array] = cross_entropy_loss,
    depth_criterion: t.Callable[..., jax.Array] = silog_loss,
) -> jax.Array:
    """Standalone unweighted loss combiner — API-parity shim for the
    reference's unused ``loss_utils.calc_loss`` (loss_utils.py:8-24): takes
    the raw model output dict, applies sigmoid to the depth logits, and sums
    CE + SILog with unit weights. The reference also permutes depth
    NCHW->NHWC; outputs here are already NHWC. The pipeline itself uses
    :func:`mtl_loss` (weighted), as the reference pipeline uses its
    lit_module path."""
    loss_segm = segm_criterion(out["segm"], gt_mask)
    depth_pred = jax.nn.sigmoid(out["depth"].astype(jnp.float32))
    loss_depth = depth_criterion(depth_pred, gt_depth)
    return loss_segm + loss_depth


def mtl_loss(
    segm_logits: jax.Array,
    depth_pred: jax.Array,
    gt_mask: jax.Array,
    gt_depth: jax.Array,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
    valid: t.Optional[jax.Array] = None,
) -> t.Dict[str, jax.Array]:
    """Weighted MTL objective; returns {"loss","loss_segm","loss_depth"}
    (reference lit_module.py:120-131)."""
    loss_segm = cross_entropy_loss(segm_logits, gt_mask, valid=valid)
    loss_depth = silog_loss(depth_pred, gt_depth, valid=valid)
    loss = loss_segm_weight * loss_segm + loss_depth_weight * loss_depth
    return {"loss": loss, "loss_segm": loss_segm, "loss_depth": loss_depth}
