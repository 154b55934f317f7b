"""End-to-end NYUv2: fake on-disk PNG tree -> datamodule -> run_pipe ->
predict, through the real config wiring (late-bound data_dir, reference
lit_datamodule.py val-stage naming: nyuv2 holdout = 'test')."""

import argparse

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vision_mtl_tpu.cfg import nyuv2_data_cfg
from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.predict import predict
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.state import create_train_state


class _Logger:
    log_dir = ""

    def __init__(self):
        self.records = []

    def log_metrics(self, metrics, step):
        self.records.append((step, metrics))

    def log_figure(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def nyu_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyuv2_e2e")
    rng = np.random.default_rng(7)
    h, w = 32, 32
    for stage, n in (("train", 6), ("test", 3)):
        for part in ("rgb", "seg13", "depth"):
            (root / f"{stage}_{part}").mkdir(parents=True)
        for i in range(n):
            name = f"{i + 1:04d}.png"
            rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            seg = rng.integers(0, 14, size=(h, w)).astype(np.uint8)
            # stay under 6.5535m so meters*1e4 fits uint16 without wrapping
            depth16 = (rng.uniform(0.5, 6.5, size=(h, w)) * 1e4).astype(
                np.uint16
            )
            Image.fromarray(rgb).save(root / f"{stage}_rgb" / name)
            Image.fromarray(seg).save(root / f"{stage}_seg13" / name)
            Image.fromarray(depth16).save(root / f"{stage}_depth" / name)
    return str(root)


def test_nyuv2_end_to_end(nyu_tree, monkeypatch, tmp_path):
    # the CLI's --data_dir override path: data_cfg.data_dir is late-bound,
    # so pointing the singleton at the tree is all the wiring needs
    monkeypatch.setattr(nyuv2_data_cfg, "data_dir", nyu_tree)
    num_classes = nyuv2_data_cfg.num_classes  # 13 + background
    dm = MTLDataModule(
        "nyuv2",
        train_transform=None,
        test_transform=None,
        batch_size=2,
        do_overfit=True,
    )
    dm.setup()
    # benchmark idxs (647, ...) exceed the tiny tree -> gracefully nulled
    assert dm.benchmark_batch is None
    batch = next(iter(dm.train_dataloader()))
    assert batch["img"].shape[1:] == (32, 32, 3)
    assert int(batch["mask"].max()) <= num_classes - 1

    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": num_classes},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 32, 32, 3)), lr=3e-3
    )
    args = argparse.Namespace(
        loss_segm_weight=1.0,
        loss_depth_weight=1.0,
        val_epoch_freq=1,
        save_epoch_freq=10,
        do_plot_preds=False,
        do_show_preds=False,
        batch_size=2,
        num_workers=0,
        do_overfit=True,
    )
    logger = _Logger()
    logger.log_dir = str(tmp_path)
    state, epoch_metrics = run_pipe(
        args, model, state, dm, num_epochs=1,
        num_classes=num_classes, logger=logger,
    )
    train_loss = epoch_metrics["train"]["train/loss"][0]
    assert np.isfinite(train_loss)
    assert np.isfinite(epoch_metrics["val"]["val/mae"][0])

    preds, metrics = predict(
        dm.predict_dataloader(), model, state, num_classes=num_classes,
        loss_segm_weight=1.0, loss_depth_weight=1.0,
    )
    assert preds[0]["segm"].shape == (2, 32, 32)
    assert preds[0]["depth"].shape == (2, 32, 32, 1)
    assert int(preds[0]["segm"].max()) <= num_classes - 1
    assert np.isfinite(metrics["predict/loss"])
