"""Exact session resume: optimizer moments, lr, plateau state, epoch."""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.cfg import fetch_data_cfg
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.checkpoint import restore_session, save_ckpt
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import create_train_state, get_lr, set_lr


def _tiny_model(nc):
    return MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )


class _Logger:
    def __init__(self, tmp):
        self.log_dir = str(tmp)

    def log_metrics(self, *a, **k):
        pass

    def log_figure(self, *a, **k):
        pass


def test_restore_session_roundtrip(tmp_path, rng):
    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    args = argparse.Namespace(
        loss_segm_weight=1.0, loss_depth_weight=1.0, val_epoch_freq=1,
        save_epoch_freq=10, do_plot_preds=False, do_show_preds=False,
    )
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    logger = _Logger(tmp_path)
    state, _ = run_pipe(
        args, model, state, dm, num_epochs=2, num_classes=nc, logger=logger
    )
    # mutate lr + scheduler, checkpoint at epoch 4
    state = set_lr(state, 1.23e-3)
    sched = ReduceLROnPlateau()
    sched.best = 0.5
    sched.num_bad_epochs = 1
    save_ckpt(state, sched, 4, str(tmp_path))

    fresh = create_train_state(
        model, jax.random.key(1), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    sched2 = ReduceLROnPlateau()
    restored, sched2, start_epoch = restore_session(
        fresh, sched2, str(tmp_path)
    )
    assert start_epoch == 5
    assert get_lr(restored) == pytest.approx(1.23e-3)
    assert sched2.best == 0.5 and sched2.num_bad_epochs == 1
    assert int(restored.step) == int(state.step)
    # params AND adam moments match
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), rtol=1e-6)
    mu0 = jax.tree.leaves(state.opt_state.inner_state[0].mu)[0]
    mu1 = jax.tree.leaves(restored.opt_state.inner_state[0].mu)[0]
    np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu1), rtol=1e-6)
