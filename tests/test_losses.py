"""Golden-value tests: losses vs the reference's torch semantics
(reference losses.py:7-36, lit_module.py:120-131)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_mtl_tpu.losses import (
    calc_loss,
    cross_entropy_loss,
    mtl_loss,
    silog_loss,
)

torch = pytest.importorskip("torch")


def _torch_silog(pred, target, min_depth=1e-3):
    """Reference SILogLoss.forward with (B,H,W,1) tensors: the interpolate is
    an identity (verified in docs/QUIRKS.md), then masked select + unbiased
    var."""
    pred_t = torch.from_numpy(pred)
    target_t = torch.from_numpy(target)
    mask = target_t > min_depth
    p = pred_t[mask]
    tt = target_t[mask]
    g = torch.log(p) - torch.log(tt)
    dg = torch.var(g) + 0.15 * torch.mean(g) ** 2
    return float(10 * torch.sqrt(dg))


def test_silog_matches_torch(rng):
    pred = rng.uniform(0.05, 0.95, size=(2, 16, 24, 1)).astype(np.float32)
    target = rng.uniform(0.0, 1.0, size=(2, 16, 24, 1)).astype(np.float32)
    target[0, :4] = 0.0  # some invalid pixels below min_depth
    expected = _torch_silog(pred, target)
    got = float(silog_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_silog_all_invalid_is_finite():
    pred = jnp.full((1, 4, 4, 1), 0.5)
    target = jnp.zeros((1, 4, 4, 1))
    assert np.isfinite(float(silog_loss(pred, target)))


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8))
    expected = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels),
        )
    )
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mtl_loss_weighting(rng):
    logits = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(1, 8, 8))
    depth_pred = rng.uniform(0.1, 0.9, size=(1, 8, 8, 1)).astype(np.float32)
    depth_gt = rng.uniform(0.1, 1.0, size=(1, 8, 8, 1)).astype(np.float32)
    out = mtl_loss(
        jnp.asarray(logits),
        jnp.asarray(depth_pred),
        jnp.asarray(labels),
        jnp.asarray(depth_gt),
        loss_segm_weight=0.3,
        loss_depth_weight=0.7,
    )
    assert float(out["loss"]) == pytest.approx(
        0.3 * float(out["loss_segm"]) + 0.7 * float(out["loss_depth"]), rel=1e-6
    )


def test_calc_loss_parity_shim(rng):
    # calc_loss (API parity with reference loss_utils.py:8-24): sigmoid on
    # raw depth logits, unweighted CE + SILog sum
    logits = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(1, 8, 8))
    depth_logits = rng.normal(size=(1, 8, 8, 1)).astype(np.float32)
    depth_gt = rng.uniform(0.1, 1.0, size=(1, 8, 8, 1)).astype(np.float32)
    got = float(
        calc_loss(
            {"segm": jnp.asarray(logits), "depth": jnp.asarray(depth_logits)},
            jnp.asarray(labels),
            jnp.asarray(depth_gt),
        )
    )
    ref = mtl_loss(
        jnp.asarray(logits),
        jnp.asarray(1.0 / (1.0 + np.exp(-depth_logits))),
        jnp.asarray(labels),
        jnp.asarray(depth_gt),
    )
    assert got == pytest.approx(float(ref["loss"]), rel=1e-5)
