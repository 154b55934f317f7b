"""vis.py + utils/inference.py coverage (parity map rows 18/19).

The vis functions mirror reference utils/vis_utils.py:11-163; get_segm_preds
mirrors utils/inference_utils.py:5-18 but with static shapes (full-shape
outputs with 0/-1 at invalid pixels instead of the reference's
boolean-mask gather, which is a dynamic-shape op XLA can't compile) — the
golden test below checks exact agreement with the torch form on the valid
pixels.
"""

import matplotlib

matplotlib.use("Agg")  # before pyplot import anywhere

import matplotlib.pyplot as plt
import numpy as np
import pytest

from vision_mtl_tpu import vis
from vision_mtl_tpu.cfg import cfg, cityscapes_data_cfg
from vision_mtl_tpu.utils.inference import get_segm_preds


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


# ---------------------------------------------------------------- colorize


def test_colorize_mask_palette_exact(rng):
    palette = cfg.vis.rgb_palette
    mask = rng.integers(0, len(palette), size=(7, 9))
    out = vis.colorize_mask(mask)
    assert out.shape == (7, 9, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, palette[mask])


def test_colorize_mask_clips_out_of_range():
    palette = cfg.vis.rgb_palette
    mask = np.array([[-1, 0], [255, len(palette) - 1]])
    out = vis.colorize_mask(mask)
    np.testing.assert_array_equal(out[0, 0], palette[0])
    np.testing.assert_array_equal(out[1, 0], palette[-1])
    np.testing.assert_array_equal(out[1, 1], palette[-1])


# ------------------------------------------------------------ wire decode


def test_img_and_depth_wire_format_decode(rng):
    """uint8 images /255 and uint16 depths /65535 (the compact H2D wire
    format) must decode to the same floats the f32 path produces."""
    img_f = rng.uniform(size=(4, 6, 3)).astype(np.float32)
    img_u8 = (img_f * 255).round().astype(np.uint8)
    np.testing.assert_allclose(
        vis._img(img_u8), img_u8.astype(np.float32) / 255.0
    )
    np.testing.assert_allclose(vis._img(img_f), img_f)

    depth_u16 = rng.integers(0, 65535, size=(4, 6), dtype=np.uint16)
    np.testing.assert_allclose(
        vis._depth(depth_u16), depth_u16.astype(np.float32) / 65535.0
    )


def test_img_clips_to_unit_range():
    arr = np.array([[-0.5, 0.3], [1.7, 1.0]], dtype=np.float32)
    out = vis._img(arr)
    assert out.min() >= 0.0 and out.max() <= 1.0


# ------------------------------------------------------------------ plots


def _sample(rng, h=8, w=10):
    return (
        rng.uniform(size=(h, w, 3)).astype(np.float32),
        rng.integers(0, 19, size=(h, w)),
        rng.uniform(size=(h, w, 1)).astype(np.float32),
    )


def test_plot_sample_grid(rng):
    img, mask, depth = _sample(rng)
    fig = vis.plot_sample(img, mask, depth)
    assert len(fig.axes) == 3


def test_plot_batch_grid_caps_rows(rng):
    b = 6
    batch = {
        "img": rng.uniform(size=(b, 8, 10, 3)).astype(np.float32),
        "mask": rng.integers(0, 19, size=(b, 8, 10)),
        "depth": rng.uniform(size=(b, 8, 10, 1)).astype(np.float32),
    }
    fig = vis.plot_batch(batch, max_rows=4)
    assert len(fig.axes) == 4 * 3  # capped at max_rows


def test_plot_annotated_segm_mask_legend_matches_classes(rng):
    img, _, _ = _sample(rng)
    mask = np.zeros((8, 10), dtype=np.int64)
    mask[2:, :] = 5
    mask[0, 0] = -1  # out-of-range id must still render + get a legend entry
    fig = vis.plot_annotated_segm_mask(
        img, mask, cityscapes_data_cfg.class_names
    )
    legend = fig.axes[0].get_legend()
    labels = [t.get_text() for t in legend.get_texts()]
    # present ids: -1 (labelled by number), 0, 5
    assert labels == [
        "-1",
        cityscapes_data_cfg.class_names[0],
        cityscapes_data_cfg.class_names[5],
    ]


def test_plot_preds_full_and_gtless(rng):
    b, h, w = 3, 8, 10
    inputs = {
        "img": rng.uniform(size=(b, h, w, 3)).astype(np.float32),
        "mask": rng.integers(0, 19, size=(b, h, w)),
        "depth": rng.uniform(size=(b, h, w, 1)).astype(np.float32),
    }
    preds = {
        "segm": rng.integers(0, 19, size=(b, h, w)),
        "depth": rng.uniform(size=(b, h, w, 1)).astype(np.float32),
    }
    fig = vis.plot_preds(b, inputs, preds)
    assert len(fig.axes) == b * 5

    # GT-less branch (predict on unlabeled data): still renders B x 5
    fig2 = vis.plot_preds(b, {"img": inputs["img"]}, preds)
    assert len(fig2.axes) == b * 5


def test_convert_figure_to_image(rng):
    img, mask, depth = _sample(rng)
    fig = vis.plot_sample(img, mask, depth)
    arr = vis.convert_figure_to_image(fig)
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
    assert arr.shape[0] > 0 and arr.shape[1] > 0


# -------------------------------------------------------- get_segm_preds


def test_get_segm_preds_golden_vs_torch(rng):
    """Valid-pixel agreement with the reference's semantics
    (utils/inference_utils.py:5-18): softmax over classes, argmax, both
    restricted to the validity mask. We compare per-pixel values rather
    than the reference's flattened return: its `reshape(-1, 19)` after an
    NCHW boolean gather groups 19 consecutive SAME-CHANNEL pixels per row
    (the gather is channel-major), so the flattened probs are scrambled —
    documented as quirk 16; ours keeps static well-formed shapes."""
    import torch
    import torch.nn.functional as F

    b, h, w, c = 2, 6, 7, 19
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    valid = rng.uniform(size=(b, h, w)) > 0.4

    probs, preds = get_segm_preds(valid, logits)
    probs, preds = np.asarray(probs), np.asarray(preds)

    tlogits = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tvalid = torch.from_numpy(valid)
    tprobs = F.softmax(tlogits, dim=1).permute(0, 2, 3, 1)  # -> NHWC
    tcls = torch.argmax(tprobs, dim=-1)
    np.testing.assert_allclose(
        probs[valid], tprobs.numpy()[valid], atol=1e-6
    )
    np.testing.assert_array_equal(preds[valid], tcls[tvalid].numpy())

    # invalid pixels: probability exactly 0, class exactly -1
    assert (probs[~valid] == 0.0).all()
    assert (preds[~valid] == -1).all()


def test_get_segm_preds_all_valid_rowsum(rng):
    logits = rng.normal(size=(1, 4, 4, 7)).astype(np.float32)
    valid = np.ones((1, 4, 4), dtype=bool)
    probs, preds = get_segm_preds(valid, logits)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-6)
    assert int(np.asarray(preds).min()) >= 0
