"""Integration: run_pipe end to end on synthetic data with a tiny model,
checkpoint save/restore roundtrip, warm start, predict sweep."""

import argparse
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.predict import predict, save_preds
from vision_mtl_tpu.train.checkpoint import (
    load_args,
    load_ckpt_session,
    log_args,
    restore_state,
    save_ckpt,
)
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.cfg import fetch_data_cfg


class _Logger:
    def __init__(self, tmp):
        self.log_dir = str(tmp)
        self.records = []

    def log_metrics(self, metrics, step):
        self.records.append((step, metrics))

    def log_figure(self, *a, **k):
        pass


def _args(**kw):
    base = dict(
        loss_segm_weight=1.0,
        loss_depth_weight=1.0,
        val_epoch_freq=1,
        save_epoch_freq=10,
        do_plot_preds=False,
        do_show_preds=False,
        batch_size=4,
        num_workers=0,
        do_overfit=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _tiny_model(num_classes):
    return MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": num_classes},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    data_cfg = fetch_data_cfg("synthetic")
    args = _args()
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    model = _tiny_model(data_cfg.num_classes)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    logger = _Logger(tmp)
    state, epoch_metrics = run_pipe(
        args,
        model,
        state,
        dm,
        num_epochs=2,
        num_classes=data_cfg.num_classes,
        logger=logger,
    )
    return args, data_cfg, dm, model, state, epoch_metrics, logger


def test_run_pipe_tp_mesh(tmp_path):
    """run_pipe with --mesh_shape data:2,model:2: the CLI-path TP wiring
    (shard_state inside run_pipe) trains to finite metrics and leaves the
    returned state mesh-placed."""
    from vision_mtl_tpu.parallel.mesh import create_mesh

    data_cfg = fetch_data_cfg("synthetic")
    args = _args()
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    model = _tiny_model(data_cfg.num_classes)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    mesh = create_mesh("data:2,model:2", devices=jax.devices()[:4])
    logger = _Logger(tmp_path)
    state, epoch_metrics = run_pipe(
        args,
        model,
        state,
        dm,
        num_epochs=1,
        num_classes=data_cfg.num_classes,
        mesh=mesh,
        logger=logger,
    )
    assert np.isfinite(epoch_metrics["train"]["train/loss"][0])
    assert np.isfinite(epoch_metrics["val"]["val/accuracy"][0])
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.mesh.shape == {"data": 2, "model": 2}


def test_run_pipe_epoch_callback_prunes(tmp_path):
    """epoch_callback fires with val metrics after each val epoch, and an
    exception from it stops training early (the tuning pruning hook)."""
    data_cfg = fetch_data_cfg("synthetic")
    args = _args()
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    model = _tiny_model(data_cfg.num_classes)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    seen = []

    class Stop(Exception):
        pass

    def cb(epoch, val_metrics):
        assert "accuracy" in val_metrics and "loss" in val_metrics
        seen.append(epoch)
        raise Stop()

    with pytest.raises(Stop):
        run_pipe(
            args,
            model,
            state,
            dm,
            num_epochs=3,
            num_classes=data_cfg.num_classes,
            logger=_Logger(tmp_path),
            epoch_callback=cb,
        )
    assert seen == [0]


def test_run_pipe_metrics_surface(trained):
    _, _, _, _, _, epoch_metrics, logger = trained
    assert len(epoch_metrics["train"]["train/loss"]) == 2
    assert len(epoch_metrics["val"]["val/accuracy"]) == 2
    # reference metric-name surface
    step_keys = {k for _, m in logger.records for k in m}
    assert "step/train/loss" in step_keys
    assert "epoch/train/accuracy" in step_keys
    assert "epoch/val/loss" in step_keys
    # loss must decrease while overfitting 4 samples
    losses = epoch_metrics["train"]["train/loss"]
    assert losses[-1] < losses[0]


def test_checkpoint_saved_on_final_epoch(trained):
    *_, logger = trained
    assert os.path.exists(os.path.join(logger.log_dir, "model_1"))
    assert os.path.exists(os.path.join(logger.log_dir, "session_1"))


def test_checkpoint_roundtrip(trained):
    _, data_cfg, _, model, state, _, logger = trained
    fresh = create_train_state(
        model, jax.random.key(1), jnp.zeros((4, 64, 64, 3)), lr=3e-3
    )
    restored = restore_state(fresh, logger.log_dir)
    trained_leaf = jax.tree.leaves(state.params)[0]
    restored_leaf = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(
        np.asarray(trained_leaf), np.asarray(restored_leaf), rtol=1e-6
    )
    session = load_ckpt_session(logger.log_dir)
    assert session["epoch"] == 1
    assert session["scheduler"]["patience"] == 2


def test_explicit_save_and_args_roundtrip(trained, tmp_path):
    args, _, _, _, state, _, _ = trained
    sched = ReduceLROnPlateau()
    save_ckpt(state, sched, 5, str(tmp_path))
    assert os.path.exists(tmp_path / "model_5")
    log_args(args, str(tmp_path / "train_args.yaml"))
    loaded = load_args(str(tmp_path / "train_args.yaml"))
    assert loaded.batch_size == args.batch_size


def test_predict_sweep(trained, tmp_path):
    _, data_cfg, dm, model, state, _, _ = trained
    preds, metrics = predict(
        dm.predict_dataloader(),
        model,
        state,
        num_classes=data_cfg.num_classes,
    )
    assert preds[0]["segm"].shape == (4, 64, 64)
    assert preds[0]["depth"].shape == (4, 64, 64, 1)
    assert "predict/accuracy" in metrics
    assert 0.0 <= metrics["predict/accuracy"] <= 1.0
    save_preds(preds, str(tmp_path / "preds.npz"))
    z = np.load(tmp_path / "preds.npz")
    assert z["segm"].shape[0] == sum(p["segm"].shape[0] for p in preds)
