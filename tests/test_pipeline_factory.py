"""Pipeline factory helpers (pipeline.py) + small utils: the --ckpt_dir
warm-start branch of init_model (reference pipeline_utils.py:28-29), dtype
selection, and the profiling/debug helpers the reference lacks."""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu import pipeline
from vision_mtl_tpu.cfg import fetch_data_cfg
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.checkpoint import save_ckpt
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau


def _args(**kw):
    base = dict(
        dataset_name="synthetic",
        model_name="mtan",
        batch_size=2,
        num_workers=0,
        do_overfit=True,
        lr=1e-3,
        seed=11,
        precision="bf16",
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _tiny(args, data_cfg, dtype=jnp.float32):
    return MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": data_cfg.num_classes},
        task_subnets_hidden_channels=4,
        encoder_first_channel=4,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )


def test_compute_dtype():
    assert pipeline.compute_dtype(_args()) == jnp.bfloat16
    assert pipeline.compute_dtype(_args(precision="f32")) == jnp.float32


def test_init_model_warm_start(tmp_path, monkeypatch):
    """--ckpt_dir warm-starts params/batch_stats through restore_state."""
    monkeypatch.setattr(pipeline, "build_model", _tiny)
    data_cfg = fetch_data_cfg("synthetic")

    _, state = pipeline.init_model(_args(), data_cfg)
    # perturb + checkpoint, then re-init warm-started from the checkpoint
    perturbed = jax.tree.map(lambda a: a + 1.0, jax.device_get(state.params))
    state = state.replace(params=perturbed)
    save_ckpt(state, ReduceLROnPlateau(), epoch=3, save_dir=str(tmp_path))

    _, fresh = pipeline.init_model(_args(), data_cfg)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(fresh.params)),
        jax.tree.leaves(perturbed),
    ):
        assert not np.allclose(np.asarray(a), np.asarray(b))

    _, warm = pipeline.init_model(_args(ckpt_dir=str(tmp_path)), data_cfg)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(warm.params)),
        jax.tree.leaves(perturbed),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_init_model_shape_mismatch_actionable(tmp_path, monkeypatch):
    """A checkpoint from a different config fails with the actionable
    shape-mismatch message, not a cryptic tree error."""
    monkeypatch.setattr(pipeline, "build_model", _tiny)
    data_cfg = fetch_data_cfg("synthetic")
    _, state = pipeline.init_model(_args(), data_cfg)
    save_ckpt(state, ReduceLROnPlateau(), epoch=0, save_dir=str(tmp_path))

    def bigger(args, data_cfg, dtype=jnp.float32):
        return MTANMiniUnet(
            map_tasks_to_num_channels={
                "depth": 1, "segm": data_cfg.num_classes
            },
            task_subnets_hidden_channels=8,
            encoder_first_channel=8,
            encoder_num_channels=2,
            dtype=jnp.float32,
        )

    monkeypatch.setattr(pipeline, "build_model", bigger)
    with pytest.raises(ValueError, match="shape mismatch"):
        pipeline.init_model(_args(ckpt_dir=str(tmp_path)), data_cfg)


def test_step_timer():
    from vision_mtl_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    assert t.images_per_sec == 0.0
    for _ in range(6):
        t.tick(8)
    assert t.images_per_sec > 0.0
    # window bounds the history
    assert len(t._times) <= 5


def test_print_sample_stats(capsys):
    from vision_mtl_tpu.utils.debug import print_sample_stats

    print_sample_stats({"img": np.zeros((2, 4, 4, 3), np.float32)})
    out = capsys.readouterr().out
    assert "img" in out and "arr.shape=(2, 4, 4, 3)" in out


def test_get_module_by_name_walks_param_trees():
    """Dotted-path pytree lookup (the JAX re-interpretation of the
    reference's nn.Module walk, utils/utils.py:52-58)."""
    import pytest

    from vision_mtl_tpu.utils.debug import get_module_by_name

    tree = {"encoder": {"block_0": {"conv": {"kernel": np.ones((3, 3))}}}}
    got = get_module_by_name(tree, "encoder.block_0.conv.kernel")
    assert got.shape == (3, 3)
    # intermediate nodes resolve too
    assert set(get_module_by_name(tree, "encoder.block_0")) == {"conv"}
    with pytest.raises(KeyError, match="encoder.block_1"):
        get_module_by_name(tree, "encoder.block_1.conv")
    # attribute fallback for dataclass-like leaves
    class Node:
        weight = 7

    assert get_module_by_name({"head": Node()}, "head.weight") == 7
    with pytest.raises(KeyError, match="head.bias"):
        get_module_by_name({"head": Node()}, "head.bias")


def test_restore_session_skips_epoch_without_session(tmp_path, monkeypatch):
    """A crash between the async model/session saves can leave model_N
    without session_N; exact-resume must fall back to the latest epoch with
    BOTH artifacts instead of pairing mismatched state."""
    import shutil

    from vision_mtl_tpu.train.checkpoint import restore_session

    monkeypatch.setattr(pipeline, "build_model", _tiny)
    data_cfg = fetch_data_cfg("synthetic")
    _, state = pipeline.init_model(_args(), data_cfg)
    sched = ReduceLROnPlateau()
    save_ckpt(state, sched, epoch=3, save_dir=str(tmp_path))
    save_ckpt(state, sched, epoch=7, save_dir=str(tmp_path))
    shutil.rmtree(tmp_path / "session_7")  # simulate crash mid-save

    _, _, start_epoch = restore_session(state, sched, str(tmp_path))
    assert start_epoch == 4  # epoch 3 + 1, NOT 8


def test_metrics_logger_claims_distinct_versions(tmp_path):
    """Concurrent loggers must never share a version dir (atomic claim)."""
    import threading

    from vision_mtl_tpu.tracking.tb import MetricsLogger

    dirs = []
    lock = threading.Lock()

    def make():
        lg = MetricsLogger(str(tmp_path), "run")
        with lock:
            dirs.append(lg.log_dir)
        lg.close()

    threads = [threading.Thread(target=make) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(set(dirs)) == 8
