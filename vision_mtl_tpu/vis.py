"""Visualization — matplotlib prediction grids and annotated masks
(reference utils/vis_utils.py:11-163), working on NHWC numpy/JAX arrays.
"""

from __future__ import annotations

import os
import typing as t

import numpy as np

# headless backend switch — reference parity: Agg unless DISPLAY is exactly
# ":0" (reference training_lit.py:10-13), i.e. any remote/forwarded DISPLAY
# still renders off-screen
if os.environ.get("DISPLAY", "") != ":0":
    import matplotlib

    matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402

from vision_mtl_tpu.cfg import cfg  # noqa: E402


def _np(x: t.Any) -> np.ndarray:
    return np.asarray(x)


def _img(x: t.Any) -> np.ndarray:
    """Image to float [0,1], decoding the compact wire format (uint8)."""
    arr = np.asarray(x)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return np.clip(arr, 0, 1)


def _depth(x: t.Any) -> np.ndarray:
    """Depth to float, decoding the compact wire format (uint16)."""
    arr = np.asarray(x)
    if arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    return arr


def colorize_mask(mask: np.ndarray, palette: t.Optional[np.ndarray] = None) -> np.ndarray:
    """(H,W) ids -> (H,W,3) uint8 using the config palette."""
    if palette is None:
        palette = cfg.vis.rgb_palette
    mask = _np(mask).astype(np.int64)
    mask = np.clip(mask, 0, len(palette) - 1)
    return palette[mask].astype(np.uint8)


def plot_sample(
    img: np.ndarray, mask: np.ndarray, depth: np.ndarray
) -> plt.Figure:
    """1x3 grid: image / mask / depth (reference plot_sample)."""
    fig, axs = plt.subplots(1, 3, figsize=(12, 4))
    axs[0].imshow(_img(img))
    axs[0].set_title("img")
    axs[1].imshow(colorize_mask(mask))
    axs[1].set_title("mask")
    axs[2].imshow(_depth(depth).squeeze(), cmap="viridis")
    axs[2].set_title("depth")
    for ax in axs:
        ax.axis("off")
    fig.tight_layout()
    return fig


def plot_batch(batch: t.Dict[str, np.ndarray], max_rows: int = 4) -> plt.Figure:
    """B x 3 grid over a batch dict (reference plot_batch)."""
    imgs, masks, depths = batch["img"], batch["mask"], batch["depth"]
    n = min(len(imgs), max_rows)
    fig, axs = plt.subplots(n, 3, figsize=(12, 4 * n), squeeze=False)
    for i in range(n):
        axs[i][0].imshow(_img(imgs[i]))
        axs[i][1].imshow(colorize_mask(masks[i]))
        axs[i][2].imshow(_depth(depths[i]).squeeze(), cmap="viridis")
        for ax in axs[i]:
            ax.axis("off")
    fig.tight_layout()
    return fig


def plot_annotated_segm_mask(
    img: np.ndarray,
    mask: np.ndarray,
    class_names: t.Sequence[str],
    alpha: float = 0.5,
) -> plt.Figure:
    """Palette overlay with a legend of the classes present
    (reference vis_utils.py:47-88)."""
    import matplotlib.patches as mpatches

    mask = _np(mask).astype(np.int64)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(_img(img))
    ax.imshow(colorize_mask(mask), alpha=alpha)
    present = np.unique(mask)
    palette = cfg.vis.rgb_palette
    # legend colors/labels must match the overlay, which CLIPS ids to the
    # palette range (colorize_mask) — a modulo here would pair an id like -1
    # or 255 with a different color than its painted pixels
    handles = [
        mpatches.Patch(
            color=palette[int(np.clip(c, 0, len(palette) - 1))] / 255.0,
            label=class_names[c] if 0 <= c < len(class_names) else str(c),
        )
        for c in present
    ]
    ax.legend(handles=handles, bbox_to_anchor=(1.02, 1), loc="upper left")
    ax.axis("off")
    fig.tight_layout()
    return fig


def plot_preds(
    batch_size: int,
    inputs_batch: t.Dict[str, np.ndarray],
    preds_batch: t.Dict[str, np.ndarray],
) -> plt.Figure:
    """B x 5 grid: RGB / GT depth / pred depth / GT mask / pred mask —
    the grid logged every val epoch and during predict
    (reference vis_utils.py:105-157)."""
    imgs = _img(inputs_batch["img"])
    gt_depth = _depth(inputs_batch["depth"]) if "depth" in inputs_batch else None
    gt_mask = _np(inputs_batch["mask"]) if "mask" in inputs_batch else None
    pred_depth = _depth(preds_batch["depth"])
    pred_mask = _np(preds_batch["segm"])

    n = min(batch_size, len(imgs), len(pred_mask))
    fig, axs = plt.subplots(n, 5, figsize=(18, 3 * n), squeeze=False)
    titles = ["img", "gt depth", "pred depth", "gt mask", "pred mask"]
    for i in range(n):
        axs[i][0].imshow(imgs[i])
        if gt_depth is not None:
            axs[i][1].imshow(gt_depth[i].squeeze(), cmap="viridis")
        axs[i][2].imshow(pred_depth[i].squeeze(), cmap="viridis")
        if gt_mask is not None:
            axs[i][3].imshow(colorize_mask(gt_mask[i]))
        axs[i][4].imshow(colorize_mask(pred_mask[i]))
        for j, ax in enumerate(axs[i]):
            if i == 0:
                ax.set_title(titles[j])
            ax.axis("off")
    fig.tight_layout()
    return fig


def convert_figure_to_image(fig: plt.Figure) -> np.ndarray:
    """Rasterize a figure to an RGB array (reference vis_utils.py:160-163)."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3]
