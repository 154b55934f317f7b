"""Resize/pad ops vs torch reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_mtl_tpu.ops.interpolate import (
    pad_concat,
    pad_to_match,
    resize_bilinear_align_corners,
    upsample_nearest_2x,
)

torch = pytest.importorskip("torch")


def test_nearest_2x_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    exp = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, exp)


@pytest.mark.parametrize("shape_out", [(8, 12), (16, 6), (5, 5)])
def test_bilinear_align_corners_matches_torch(rng, shape_out):
    x = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    got = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(x), shape_out[0], shape_out[1])
    )
    exp = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=shape_out,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_pad_concat_matches_torch(rng):
    # reference concat_slightly_diff_sized_tensors (utils/model_utils.py:46-58)
    x1 = rng.normal(size=(1, 4, 6, 2)).astype(np.float32)
    x2 = rng.normal(size=(1, 9, 13, 3)).astype(np.float32)
    got = np.asarray(pad_concat(jnp.asarray(x1), jnp.asarray(x2)))

    t1 = torch.from_numpy(x1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(x2).permute(0, 3, 1, 2)
    dy = t2.size(2) - t1.size(2)
    dx = t2.size(3) - t1.size(3)
    t1p = torch.nn.functional.pad(
        t1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2]
    )
    exp = torch.cat([t2, t1p], dim=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp)


def test_pad_to_match_identity(rng):
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pad_to_match(jnp.asarray(x), jnp.asarray(x))), x
    )


def test_get_segm_preds_masks_invalid(rng):
    """reference utils/inference_utils.py:5-18: softmax/argmax restricted to
    a validity mask; invalid pixels -> prob 0 / class -1."""
    import jax.numpy as jnp

    from vision_mtl_tpu.utils.inference import get_segm_preds

    logits = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
    valid = jnp.asarray(rng.integers(0, 2, size=(2, 4, 6)).astype(bool))
    probs, preds = get_segm_preds(valid, logits)
    v = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1)[v], 1.0, rtol=1e-5
    )
    assert np.all(np.asarray(probs)[~v] == 0.0)
    assert np.all(np.asarray(preds)[~v] == -1)
    np.testing.assert_array_equal(
        np.asarray(preds)[v], np.asarray(jnp.argmax(logits, -1))[v]
    )
