"""Metric accumulator tests — hand-computed golden values replicating
torchmetrics 0.7.3 semantics (reference lit_module.py:48-69)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_mtl_tpu.metrics import (
    compute_metrics,
    init_metrics,
    merge_metrics,
    update_metrics,
)


def _update(state, preds, mask, dpred, dgt, losses=None):
    return update_metrics(
        state,
        jnp.asarray(preds),
        jnp.asarray(mask),
        jnp.asarray(dpred),
        jnp.asarray(dgt),
        losses,
    )


def test_perfect_predictions():
    state = init_metrics(3)
    mask = np.array([[[0, 1], [2, 1]]])
    dgt = np.full((1, 2, 2, 1), 0.5, np.float32)
    state = _update(state, mask, mask, dgt, dgt)
    m = compute_metrics(state)
    assert float(m["accuracy"]) == 1.0
    assert float(m["jaccard_index"]) == 1.0
    assert float(m["fbeta_score"]) == pytest.approx(1.0)
    assert float(m["mae"]) == 0.0


def test_hand_computed_confusion():
    # 2 classes, 4 pixels: targets [0,0,1,1], preds [0,1,1,1]
    state = init_metrics(2)
    target = np.array([[[0, 0], [1, 1]]])
    pred = np.array([[[0, 1], [1, 1]]])
    dpred = np.array([[[[0.2], [0.4]], [[0.6], [0.8]]]], np.float32)
    dgt = np.array([[[[0.0], [0.5]], [[0.5], [1.0]]]], np.float32)
    state = _update(state, pred, target, dpred, dgt)
    m = compute_metrics(state)
    # accuracy micro = 3/4
    assert float(m["accuracy"]) == pytest.approx(0.75)
    # IoU: class0 = 1/(2+1-1)=0.5; class1 = 2/(2+3-2)=2/3; macro mean
    assert float(m["jaccard_index"]) == pytest.approx((0.5 + 2 / 3) / 2)
    # F1: c0 P=1,R=.5 -> 2/3; c1 P=2/3,R=1 -> 0.8; weighted by support .5/.5
    assert float(m["fbeta_score"]) == pytest.approx(0.5 * 2 / 3 + 0.5 * 0.8)
    # MAE = mean(|.2-0|+|.4-.5|+|.6-.5|+|.8-1|)
    assert float(m["mae"]) == pytest.approx((0.2 + 0.1 + 0.1 + 0.2) / 4)


def test_absent_class_scores_zero_in_jaccard():
    # torchmetrics 0.7.3 JaccardIndex absent_score=0.0 is INCLUDED in mean
    state = init_metrics(3)
    target = np.array([[[0, 0], [1, 1]]])  # class 2 absent
    pred = target.copy()
    d = np.full((1, 2, 2, 1), 0.5, np.float32)
    state = _update(state, pred, target, d, d)
    m = compute_metrics(state)
    assert float(m["jaccard_index"]) == pytest.approx((1.0 + 1.0 + 0.0) / 3)


def test_streaming_equals_single_batch(rng):
    c = 5
    t1 = rng.integers(0, c, size=(2, 8, 8))
    p1 = rng.integers(0, c, size=(2, 8, 8))
    t2 = rng.integers(0, c, size=(2, 8, 8))
    p2 = rng.integers(0, c, size=(2, 8, 8))
    d1, g1 = (rng.uniform(size=(2, 8, 8, 1)).astype(np.float32) for _ in range(2))
    d2, g2 = (rng.uniform(size=(2, 8, 8, 1)).astype(np.float32) for _ in range(2))

    s_stream = init_metrics(c)
    s_stream = _update(s_stream, p1, t1, d1, g1)
    s_stream = _update(s_stream, p2, t2, d2, g2)

    s_once = init_metrics(c)
    s_once = _update(
        s_once,
        np.concatenate([p1, p2]),
        np.concatenate([t1, t2]),
        np.concatenate([d1, d2]),
        np.concatenate([g1, g2]),
    )
    m1, m2 = compute_metrics(s_stream), compute_metrics(s_once)
    for k in ("accuracy", "jaccard_index", "fbeta_score", "mae"):
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-6)


def test_merge_metrics(rng):
    c = 4
    s1 = init_metrics(c)
    s2 = init_metrics(c)
    t = rng.integers(0, c, size=(1, 4, 4))
    p = rng.integers(0, c, size=(1, 4, 4))
    d = rng.uniform(size=(1, 4, 4, 1)).astype(np.float32)
    s1 = _update(s1, p, t, d, d)
    s2 = _update(s2, p, t, d, d)
    merged = merge_metrics(s1, s2)
    assert float(merged.num_steps) == 2.0
    np.testing.assert_allclose(np.asarray(merged.confmat), 2 * np.asarray(s1.confmat))


def test_loss_averaging():
    state = init_metrics(2)
    t = np.zeros((1, 2, 2), np.int64)
    d = np.full((1, 2, 2, 1), 0.5, np.float32)
    state = _update(state, t, t, d, d, {"loss": jnp.float32(2.0)})
    state = _update(state, t, t, d, d, {"loss": jnp.float32(4.0)})
    m = compute_metrics(state)
    assert float(m["loss"]) == pytest.approx(3.0)


def test_confmat_chunking_matches_unchunked(rng, monkeypatch):
    """Oversized updates are split into exact sub-contractions (the 2^24
    f32 bound for native-resolution eval); results match the single-shot
    path bit-for-bit, with and without a valid mask."""
    import vision_mtl_tpu.metrics as M

    b, h, w, c = 4, 8, 8, 5
    preds = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    mask = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    d = rng.uniform(0.1, 1.0, size=(b, h, w, 1)).astype(np.float32)
    valid = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)

    for v in (None, valid):
        ref = update_metrics(
            init_metrics(c), jnp.asarray(preds), jnp.asarray(mask),
            jnp.asarray(d), jnp.asarray(d), valid=v,
        )
        # force chunking: 3 pixels/chunk (not a divisor of b*h*w -> ragged
        # final chunk covered too)
        monkeypatch.setattr(M, "_CONFMAT_CHUNK_PX", 3)
        got = update_metrics(
            init_metrics(c), jnp.asarray(preds), jnp.asarray(mask),
            jnp.asarray(d), jnp.asarray(d), valid=v,
        )
        monkeypatch.undo()
        np.testing.assert_array_equal(
            np.asarray(ref.confmat), np.asarray(got.confmat)
        )
