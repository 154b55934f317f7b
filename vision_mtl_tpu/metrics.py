"""Streaming on-device metrics as pure accumulator pytrees.

Replaces torchmetrics 0.7.3 (the reference's pinned version,
requirements.txt:9; instantiated at lit_module.py:48-69) with
confusion-matrix-based accumulators that live on device and update inside the
jitted train/eval step. Semantics replicated:

  * Accuracy(average="micro", num_classes=C): correct / total over all pixels.
  * JaccardIndex(num_classes=C): per-class IoU from the confusion matrix;
    classes with empty union score ``absent_score=0.0`` and ARE included in
    the unweighted mean over classes (torchmetrics 0.7.3 default
    reduction="elementwise_mean").
  * FBetaScore(beta=1, average="weighted", mdmc_average="global"): tp/fp/fn
    accumulated globally per class, per-class F-beta with 0/0 -> 0, weighted
    by target support.
  * MeanAbsoluteError: sum |pred - target| / count.

Deliberate fix vs the reference (documented in docs/QUIRKS.md quirk #6): the
reference never resets its torchmetrics objects, so its "step" values are
running aggregates and its "epoch" values are means of running values. Here
accumulators are explicitly reset per epoch, so epoch metrics are exact
aggregates over the epoch.

All state is a flax.struct dataclass -> a pytree that can be donated through
jit, psum-reduced across a mesh (it is additive), and checkpointed.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import struct

# largest pixel count per confusion-matrix contraction that keeps f32
# partial sums exact (integer resolution of f32 is 2^24); larger updates
# are chunked in update_metrics
_CONFMAT_CHUNK_PX = 1 << 24


@struct.dataclass
class MetricState:
    """Additive metric accumulators. Merging two states = adding fields."""

    confmat: jax.Array  # (C, C) f64-ish f32 counts; [target, pred]
    mae_sum: jax.Array  # scalar f32
    mae_count: jax.Array  # scalar f32
    loss_sum: jax.Array  # scalar f32 (combined loss)
    loss_segm_sum: jax.Array
    loss_depth_sum: jax.Array
    num_steps: jax.Array  # scalar f32

    @property
    def num_classes(self) -> int:
        return self.confmat.shape[0]


def init_metrics(num_classes: int) -> MetricState:
    # distinct buffers per field: a shared zeros() array would alias leaves
    # and break buffer donation in the jitted steps
    z = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
    return MetricState(
        confmat=jnp.zeros((num_classes, num_classes), jnp.float32),
        mae_sum=z(),
        mae_count=z(),
        loss_sum=z(),
        loss_segm_sum=z(),
        loss_depth_sum=z(),
        num_steps=z(),
    )


def update_metrics(
    state: MetricState,
    segm_preds: jax.Array,
    gt_mask: jax.Array,
    depth_preds: jax.Array,
    gt_depth: jax.Array,
    losses: t.Optional[t.Dict[str, jax.Array]] = None,
    valid: t.Optional[jax.Array] = None,
) -> MetricState:
    """Accumulate one batch.

    Args:
      segm_preds: (B, H, W) int argmax class predictions.
      gt_mask: (B, H, W) int targets.
      depth_preds: (B, H, W, 1) float depth predictions.
      gt_depth: (B, H, W, 1) float depth targets.
      losses: optional {"loss","loss_segm","loss_depth"} scalars.
      valid: optional (B,) per-sample 0/1 weights (padded final batches) —
        padded samples contribute nothing to any accumulator.
    """
    c = state.num_classes
    b, h, w = gt_mask.shape[:3]
    flat_t = gt_mask.reshape(-1).astype(jnp.int32)
    flat_p = segm_preds.reshape(-1).astype(jnp.int32)
    # confusion matrix as a one-hot contraction on the MXU: scatter-based
    # bincount costs ~20% of a whole train step on TPU, the (N,C)x(N,C)
    # matmul with f32 accumulation is ~100x cheaper (0/1 values are exact in
    # bf16). A Pallas variant that expands one-hots in VMEM exists
    # (ops/pallas/confmat.py) but measured 4x SLOWER on v5e — XLA pipelines
    # the single big contraction better than a sequential tiled accumulate —
    # so the XLA form stays the default (docs/BENCH_NOTES.md).
    # Precision bound: each contraction's counts are exact while its partial
    # sums stay under 2^24 (f32 integer resolution) — 16.7M pixels of ONE
    # (target,pred) pair. The 128x256 configs peak at 4.2M px/batch (safe
    # 4x over); batches beyond the bound (native-resolution eval, e.g.
    # 1024x2048 at bs>=16) are split into <=2^24-pixel sub-contractions at
    # trace time and combined in int32, so a single update is exact up to
    # 2^31 px per cell. The cross-batch state.confmat accumulation is f32:
    # exact until a cell's EPOCH total passes 2^24, beyond which counts
    # round with <=2^-24 relative error — harmless for the ratio metrics
    # computed from it, and unavoidable without x64 (int32 would overflow a
    # native-res train epoch: 2975 x 2.1Mpx > 2^31).
    px_w = (
        None
        if valid is None
        else jnp.repeat(valid.astype(jnp.bfloat16), h * w)
    )

    def cm_block(ft: jax.Array, fp: jax.Array, w1) -> jax.Array:
        t1h = jax.nn.one_hot(ft, c, dtype=jnp.bfloat16)
        p1h = jax.nn.one_hot(fp, c, dtype=jnp.bfloat16)
        if w1 is not None:
            t1h = t1h * w1[:, None]
        return jax.lax.dot_general(
            t1h,
            p1h,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n = flat_t.shape[0]
    if n <= _CONFMAT_CHUNK_PX:
        cm = cm_block(flat_t, flat_p, px_w)
    else:
        # int32 combine: each <=2^24-px block is exact in f32, and integer
        # addition keeps the within-update total exact up to 2^31 per cell
        # (f32 addition would round past 2^24)
        cm_i = jnp.zeros((c, c), jnp.int32)
        for s in range(0, n, _CONFMAT_CHUNK_PX):
            e = s + _CONFMAT_CHUNK_PX
            cm_i = cm_i + cm_block(
                flat_t[s:e],
                flat_p[s:e],
                None if px_w is None else px_w[s:e],
            ).astype(jnp.int32)
        cm = cm_i.astype(jnp.float32)

    abs_err = jnp.abs(
        depth_preds.astype(jnp.float32) - gt_depth.astype(jnp.float32)
    )
    depth_px = abs_err.size // b
    if valid is None:
        mae_add = jnp.sum(abs_err)
        mae_cnt = jnp.float32(abs_err.size)
    else:
        vf = valid.astype(jnp.float32)
        mae_add = jnp.sum(abs_err.reshape(b, -1) * vf[:, None])
        mae_cnt = jnp.sum(vf) * depth_px
    losses = losses or {}
    zero = jnp.zeros((), jnp.float32)
    return MetricState(
        confmat=state.confmat + cm,
        mae_sum=state.mae_sum + mae_add,
        mae_count=state.mae_count + mae_cnt,
        loss_sum=state.loss_sum + losses.get("loss", zero),
        loss_segm_sum=state.loss_segm_sum + losses.get("loss_segm", zero),
        loss_depth_sum=state.loss_depth_sum + losses.get("loss_depth", zero),
        num_steps=state.num_steps + 1.0,
    )


def compute_metrics(state: MetricState) -> t.Dict[str, jax.Array]:
    """Finalize accumulators into the reference's metric dict."""
    cm = state.confmat
    total = jnp.maximum(jnp.sum(cm), 1.0)
    tp = jnp.diagonal(cm)
    support = jnp.sum(cm, axis=1)  # target counts per class (rows = target)
    pred_count = jnp.sum(cm, axis=0)

    accuracy = jnp.sum(tp) / total

    union = support + pred_count - tp
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1.0), 0.0)
    jaccard = jnp.mean(iou)  # absent classes score 0 and are included

    precision = jnp.where(pred_count > 0, tp / jnp.maximum(pred_count, 1.0), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1.0), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    weights = support / total
    fbeta = jnp.sum(weights * f1)

    mae = state.mae_sum / jnp.maximum(state.mae_count, 1.0)
    steps = jnp.maximum(state.num_steps, 1.0)
    return {
        "accuracy": accuracy,
        "jaccard_index": jaccard,
        "fbeta_score": fbeta,
        "mae": mae,
        "loss": state.loss_sum / steps,
        "loss_segm": state.loss_segm_sum / steps,
        "loss_depth": state.loss_depth_sum / steps,
    }


def merge_metrics(a: MetricState, b: MetricState) -> MetricState:
    """Combine two accumulator states (e.g., across hosts)."""
    return jax.tree.map(lambda x, y: x + y, a, b)
