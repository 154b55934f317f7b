"""Loop behaviors: plateau LR reduction fires on stalled val loss;
benchmark-batch prediction plotting produces figures; vis functions render."""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import create_train_state, get_lr, set_lr
from vision_mtl_tpu.vis import (
    colorize_mask,
    convert_figure_to_image,
    plot_annotated_segm_mask,
    plot_batch,
    plot_preds,
    plot_sample,
)


def test_plateau_reduces_lr_when_val_stalls():
    sched = ReduceLROnPlateau(patience=2, factor=0.9)
    lr = 1.0
    lrs = []
    for v in [10.0, 10.0, 10.0, 10.0, 10.0]:
        lr = sched.step(v, lr)
        lrs.append(lr)
    # first value sets best; then 3 bad epochs > patience 2 -> reduce once
    assert lrs == [1.0, 1.0, 1.0, 0.9, 0.9]


def test_run_pipe_applies_plateau(rng):
    """With val loss never improving (frozen lr schedule scenario), the loop
    must lower the state's lr after patience is exhausted."""
    nc = 7
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    # zero lr so nothing learns -> val loss constant -> plateau must fire
    state = set_lr(state, 0.0)
    args = argparse.Namespace(
        loss_segm_weight=1.0, loss_depth_weight=1.0, val_epoch_freq=1,
        save_epoch_freq=100, do_plot_preds=False, do_show_preds=False,
    )
    state, _ = run_pipe(
        args, model, state, dm, num_epochs=5, num_classes=nc, logger=None
    )
    # lr = 0 * 0.9^k stays 0, but the scheduler path ran; instead verify via
    # the scheduler state having been consulted: rerun with a real lr
    state2 = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    state2 = set_lr(state2, 1e-3)
    # freeze learning by zeroing gradients is overkill; instead pass a
    # scheduler with tiny patience and a pre-set unbeatable best
    sched = ReduceLROnPlateau(patience=0, factor=0.5)
    sched.best = -1.0  # no val loss can beat this -> reduce every val epoch
    state2, _ = run_pipe(
        args, model, state2, dm, num_epochs=3, num_classes=nc,
        logger=None, scheduler=sched,
    )
    assert get_lr(state2) < 1e-3


def test_vis_functions_render(rng):
    img = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    mask = rng.integers(0, 5, size=(16, 24))
    depth = rng.uniform(size=(16, 24, 1)).astype(np.float32)

    fig = plot_sample(img, mask, depth)
    arr = convert_figure_to_image(fig)
    assert arr.ndim == 3 and arr.shape[-1] == 3

    batch = {
        "img": np.stack([img] * 2),
        "mask": np.stack([mask] * 2),
        "depth": np.stack([depth] * 2),
    }
    preds = {
        "segm": np.stack([mask] * 2),
        "depth": np.stack([depth] * 2),
    }
    fig2 = plot_preds(2, batch, preds)
    assert fig2 is not None
    fig3 = plot_batch(batch)
    assert fig3 is not None
    fig4 = plot_annotated_segm_mask(img, mask, [f"c{i}" for i in range(5)])
    assert fig4 is not None

    # wire-format inputs render too
    batch_u8 = dict(batch)
    batch_u8["img"] = (batch["img"] * 255).astype(np.uint8)
    batch_u8["depth"] = (batch["depth"] * 65535).astype(np.uint16)
    fig5 = plot_preds(2, batch_u8, preds)
    assert fig5 is not None

    cm = colorize_mask(mask)
    assert cm.shape == (16, 24, 3) and cm.dtype == np.uint8

    import matplotlib.pyplot as plt

    plt.close("all")

def test_run_pipe_reshuffles_across_epochs(rng):
    """The loop must reuse ONE train loader so its seeded per-epoch reshuffle
    advances — a fresh instance per epoch would silently replay the same
    batch order forever (regression: loop.py round 2)."""
    nc = 7
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    dm = MTLDataModule("synthetic", batch_size=4)
    dm.setup()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=0.0
    )

    calls = {"n": 0}
    orders = []
    real_factory = dm.train_dataloader

    def counting_factory():
        calls["n"] += 1
        dl = real_factory()
        real_index_batches = dl._index_batches

        def spy():
            batches = real_index_batches()
            orders.append(tuple(int(i) for b in batches for i in b))
            return batches

        dl._index_batches = spy
        return dl

    dm.train_dataloader = counting_factory
    args = argparse.Namespace(
        loss_segm_weight=1.0, loss_depth_weight=1.0, val_epoch_freq=100,
        save_epoch_freq=100, do_plot_preds=False, do_show_preds=False,
    )
    run_pipe(args, model, state, dm, num_epochs=3, num_classes=nc, logger=None)
    assert calls["n"] == 1, "train loader must be constructed once"
    assert len(orders) == 3
    assert orders[0] != orders[1] != orders[2], "epochs must reshuffle"
    # (drop_last trims a different shuffled tail each epoch, so the kept
    # index SETS legitimately differ — only the ordering is asserted)

def test_resume_continues_shuffle_stream(rng):
    """--resume_dir semantics: restarting at start_epoch=k must replay the
    SAME batch order epoch k of an uninterrupted run would have used (the
    loader's reshuffle is seeded by seed+epoch)."""
    nc = 7
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    args = argparse.Namespace(
        loss_segm_weight=1.0, loss_depth_weight=1.0, val_epoch_freq=100,
        save_epoch_freq=100, do_plot_preds=False, do_show_preds=False,
    )

    def run(start_epoch, num_epochs):
        dm = MTLDataModule("synthetic", batch_size=4)
        dm.setup()
        orders = []
        real_factory = dm.train_dataloader

        def factory():
            dl = real_factory()
            real_ib = dl._index_batches

            def spy():
                b = real_ib()
                orders.append(tuple(int(i) for bb in b for i in bb))
                return b

            dl._index_batches = spy
            return dl

        dm.train_dataloader = factory
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=0.0
        )
        run_pipe(
            args, model, state, dm, num_epochs=num_epochs, num_classes=nc,
            logger=None, start_epoch=start_epoch,
        )
        return orders

    full = run(0, 3)
    resumed = run(2, 3)  # resume at epoch 2
    assert len(full) == 3 and len(resumed) == 1
    assert resumed[0] == full[2]
