"""Preemption-safe training (train/preempt.py): signal/injection guard,
loader mid-epoch skip, and the end-to-end guarantee — a run interrupted
mid-epoch and resumed from its preemption checkpoint reproduces the
uninterrupted run exactly (params, optimizer, metric accumulators,
shuffle order)."""

import argparse
import os
import signal
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.cfg import fetch_data_cfg
from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.data.loader import DataLoader
from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.checkpoint import (
    resolve_resume,
    restore_preempt,
    save_ckpt,
)
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.preempt import PreemptionGuard
from vision_mtl_tpu.train.state import create_train_state


@pytest.fixture(autouse=True)
def _restore_sigterm():
    """Every PreemptionGuard installs a SIGTERM handler it never removes;
    without restoration the rest of the suite would silently ignore SIGTERM
    (timeout wrappers / kill-by-PID would need SIGKILL)."""
    old = signal.getsignal(signal.SIGTERM)
    yield
    signal.signal(signal.SIGTERM, old)


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
        os.makedirs(self.log_dir, exist_ok=True)

    def log_metrics(self, *a, **k):
        pass

    def log_figure(self, *a, **k):
        pass


def _args():
    return argparse.Namespace(
        loss_segm_weight=1.0,
        loss_depth_weight=1.0,
        val_epoch_freq=1,
        save_epoch_freq=10,
        do_plot_preds=False,
        do_show_preds=False,
    )


def test_loader_skip_batches():
    ds = SyntheticMTLDataset(stage="train")
    full = list(DataLoader(ds, batch_size=8, shuffle=True, seed=3))
    lo = DataLoader(ds, batch_size=8, shuffle=True, seed=3)
    lo.skip_batches = 3
    tail = list(lo)
    assert len(tail) == len(full) - 3
    for got, want in zip(tail, full[3:]):
        np.testing.assert_array_equal(got["img"], want["img"])
    # one-shot: the next epoch runs in full (different seeded order)
    assert lo.skip_batches == 0
    assert len(list(lo)) == len(full)


def test_guard_injection_and_signal():
    g = PreemptionGuard(inject_at_step=5)
    assert not g.requested(4)
    assert g.requested(5) and g.requested(6)

    # (the autouse fixture restores the pre-test SIGTERM disposition)
    g2 = PreemptionGuard()
    assert not g2.requested(0)
    os.kill(os.getpid(), signal.SIGTERM)
    deadline = time.time() + 5.0
    while not g2.requested(0) and time.time() < deadline:
        time.sleep(0.01)
    assert g2.requested(0)


@pytest.mark.parametrize("grad_accum", [1, 2])
def test_preempt_mid_epoch_exact_resume(tmp_path, grad_accum):
    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    args = _args()
    # accum interplay: a "step" is one OPTIMIZER step over the full batch
    # (microbatched in-step), so the resume position stays batch-granular
    args.grad_accum_steps = grad_accum

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 64, 64, 3)), lr=3e-3
        )

    def fresh_dm():
        dm = MTLDataModule("synthetic", batch_size=8)
        dm.setup()
        return dm

    # ---- run A: uninterrupted 2 epochs ----
    dm = fresh_dm()
    n_batches = len(dm.train_dataloader())
    assert n_batches >= 4  # need a mid-epoch step to interrupt at
    state_a, metrics_a = run_pipe(
        args, model, fresh_state(), dm,
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "a"),
    )

    # ---- run B: preempted mid-epoch-2 (injected fault), then resumed ----
    interrupt_at = n_batches + 2  # 2 steps into epoch index 1
    guard = PreemptionGuard(inject_at_step=interrupt_at)
    ckpt_dir = tmp_path / "b"
    with pytest.raises(SystemExit) as exc:
        run_pipe(
            args, model, fresh_state(), fresh_dm(),
            num_epochs=2, num_classes=nc, logger=_Logger(ckpt_dir),
            preempt_guard=guard,
        )
    assert exc.value.code == 143
    assert resolve_resume(str(ckpt_dir)) == "preempt"

    sched = ReduceLROnPlateau(patience=2, factor=0.9)
    state, sched, epoch, batch_in_epoch, mstate, val_step = restore_preempt(
        fresh_state(), sched, str(ckpt_dir), nc
    )
    assert (epoch, batch_in_epoch) == (1, 2)
    assert val_step > 0  # epoch 1's validation already ran
    state_b, metrics_b = run_pipe(
        args, model, state, fresh_dm(),
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "b2"),
        scheduler=sched, start_epoch=epoch, start_batch=batch_in_epoch,
        initial_train_mstate=mstate, start_val_step=val_step,
    )

    # the resumed trajectory IS the uninterrupted one: params and the
    # interrupted epoch's full train/val metrics match exactly
    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert int(state_a.step) == int(state_b.step)
    for k in metrics_a["train"]:
        np.testing.assert_allclose(
            metrics_b["train"][k][-1], metrics_a["train"][k][-1],
            rtol=0, atol=0, err_msg=k,
        )
    for k in metrics_a["val"]:
        np.testing.assert_allclose(
            metrics_b["val"][k][-1], metrics_a["val"][k][-1],
            rtol=0, atol=0, err_msg=k,
        )


class _CountingGuard:
    """Guard double that fires at the Nth poll — pins the preemption to an
    exact loop position (e.g. inside the validation sweep, which
    VMTL_PREEMPT_AT_STEP cannot reach: the train loop checks first)."""

    def __init__(self, fire_at_poll):
        self.polls = 0
        self.fire_at = fire_at_poll

    def requested(self, step):
        self.polls += 1
        return self.polls >= self.fire_at


def test_preempt_during_validation_exact_resume(tmp_path):
    """Preemption mid-VAL saves the full-epoch train state; resume re-runs
    validation from the top and the final trajectory still matches an
    uninterrupted run exactly."""
    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    args = _args()

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 64, 64, 3)), lr=3e-3
        )

    def fresh_dm():
        dm = MTLDataModule("synthetic", batch_size=8)
        dm.setup()
        return dm

    dm = fresh_dm()
    n_batches = len(dm.train_dataloader())
    state_a, metrics_a = run_pipe(
        args, model, fresh_state(), dm,
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "a"),
    )

    # fire at the FIRST val-loop poll of epoch 0 (train polls 1..n_batches)
    guard = _CountingGuard(n_batches + 1)
    ckpt_dir = tmp_path / "b"
    with pytest.raises(SystemExit):
        run_pipe(
            args, model, fresh_state(), fresh_dm(),
            num_epochs=2, num_classes=nc, logger=_Logger(ckpt_dir),
            preempt_guard=guard,
        )

    sched = ReduceLROnPlateau(patience=2, factor=0.9)
    state, sched, epoch, batch_in_epoch, mstate, val_step = restore_preempt(
        fresh_state(), sched, str(ckpt_dir), nc
    )
    # full-epoch train state: epoch 0 trained in full, val pending
    assert (epoch, batch_in_epoch, val_step) == (0, n_batches, 0)
    state_b, metrics_b = run_pipe(
        args, model, state, fresh_dm(),
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "b2"),
        scheduler=sched, start_epoch=epoch, start_batch=batch_in_epoch,
        initial_train_mstate=mstate, start_val_step=val_step,
    )

    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # the re-entered epoch's train metrics come from the restored
    # accumulators (zero batches re-trained) and val re-runs from the top —
    # BOTH epochs' metric streams must match the uninterrupted run
    for stage in ("train", "val"):
        for k in metrics_a[stage]:
            np.testing.assert_allclose(
                metrics_b[stage][k], metrics_a[stage][k],
                rtol=0, atol=0, err_msg=f"{stage}/{k}",
            )


def test_preempt_at_epoch_end_tail_exact_resume(tmp_path):
    """A notice landing in the epoch-end tail (after the scheduler stepped)
    is honored via a REGULAR end-of-epoch checkpoint — resume starts at
    epoch+1 and still matches the uninterrupted run exactly."""
    from vision_mtl_tpu.train.checkpoint import restore_session

    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    args = _args()

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 64, 64, 3)), lr=3e-3
        )

    def fresh_dm():
        dm = MTLDataModule("synthetic", batch_size=8)
        dm.setup()
        return dm

    dm = fresh_dm()
    n_train = len(dm.train_dataloader())
    n_val = len(dm.val_dataloader())
    state_a, metrics_a = run_pipe(
        args, model, fresh_state(), dm,
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "a"),
    )

    # polls in epoch 0: n_train (train loop) + n_val (val loop) + 1 (tail)
    guard = _CountingGuard(n_train + n_val + 1)
    ckpt_dir = tmp_path / "b"
    with pytest.raises(SystemExit):
        run_pipe(
            args, model, fresh_state(), fresh_dm(),
            num_epochs=2, num_classes=nc, logger=_Logger(ckpt_dir),
            preempt_guard=guard,
        )
    # the epoch completed: a normal session checkpoint, no preempt artifact
    assert resolve_resume(str(ckpt_dir)) == "epoch"

    sched = ReduceLROnPlateau(patience=2, factor=0.9)
    state, sched, start_epoch = restore_session(
        fresh_state(), sched, str(ckpt_dir)
    )
    assert start_epoch == 1
    state_b, metrics_b = run_pipe(
        args, model, state, fresh_dm(),
        num_epochs=2, num_classes=nc, logger=_Logger(tmp_path / "b2"),
        scheduler=sched, start_epoch=start_epoch,
    )

    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for stage in ("train", "val"):
        for k in metrics_a[stage]:
            np.testing.assert_allclose(
                metrics_b[stage][k][-1], metrics_a[stage][k][-1],
                rtol=0, atol=0, err_msg=f"{stage}/{k}",
            )


def test_auto_resume_finds_nested_run_dirs(tmp_path):
    """--auto_resume must find run dirs nested under a run-name level (with
    comet enabled, create_tools names the subdir after the experiment —
    a relaunch cannot reconstruct it)."""
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.train.checkpoint import (
        find_latest_resumable_run,
        save_preempt_ckpt,
    )

    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    base = tmp_path / "training-basic"
    nested = base / "brave_comet_1234" / "version_0"
    os.makedirs(nested)
    assert find_latest_resumable_run(str(base)) is None
    save_preempt_ckpt(
        state, ReduceLROnPlateau(), 0, 1, init_metrics(nc), 0, str(nested)
    )
    assert find_latest_resumable_run(str(base)) == str(nested)


def test_resolve_resume_prefers_latest(tmp_path):
    """A stale preemption artifact must lose to later epoch checkpoints."""
    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    sched = ReduceLROnPlateau()

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.train.checkpoint import save_preempt_ckpt

    # preempted at epoch 1, batch 2 ...
    save_preempt_ckpt(
        state, sched, 1, 2, init_metrics(nc), 4, str(tmp_path)
    )
    assert resolve_resume(str(tmp_path)) == "preempt"
    # ... then (after a resume) epoch 3 completed normally
    save_ckpt(state, sched, 3, str(tmp_path))
    assert resolve_resume(str(tmp_path)) == "epoch"
    # ... and a NEWER preemption (epoch 4, mid-epoch) wins again
    save_preempt_ckpt(
        state, sched, 4, 1, init_metrics(nc), 8, str(tmp_path)
    )
    assert resolve_resume(str(tmp_path)) == "preempt"


def test_cli_preempt_and_resume_end_to_end(tmp_path):
    """The full CLI flow: --preempt_save + an injected preemption exits 143
    with a mid-epoch checkpoint; --resume_dir detects it (resolve_resume)
    and finishes the run."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["VMTL_LOG_ROOT"] = str(tmp_path)
    cli = [
        sys.executable, "-m", "vision_mtl_tpu.training",
        "--device", "cpu:1", "--dataset_name", "synthetic",
        "--model_name", "basic", "--num_epochs", "2",
        "--batch_size", "8", "--exp_disabled",
    ]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env1 = dict(env, VMTL_PREEMPT_AT_STEP="3")
    p1 = subprocess.run(
        cli + ["--preempt_save"], env=env1, cwd=cwd, timeout=560,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    out1 = p1.stdout.decode()
    assert p1.returncode == 143, out1[-3000:]
    assert "Preemption checkpoint saved" in out1

    run_dir = os.path.join(str(tmp_path), "training-basic", "version_0")
    assert os.path.isdir(os.path.join(run_dir, "preempt_model")), os.listdir(
        os.path.join(str(tmp_path), "training-basic")
    )
    assert resolve_resume(run_dir) == "preempt"

    # a relaunch loop re-runs the SAME command: --auto_resume finds the
    # interrupted run dir itself
    p2 = subprocess.run(
        cli + ["--auto_resume"], env=env, cwd=cwd, timeout=560,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    out2 = p2.stdout.decode()
    assert p2.returncode == 0, out2[-3000:]
    assert f"--auto_resume: resuming {run_dir}" in out2
    assert "Resumed preempted run" in out2
    assert "predict:" in out2  # ran to completion through the predict sweep

    # the COMPLETED run published itself in the local trained-run registry
    # (training.main -> tracking/artifacts.register_run); the preempted
    # first launch must NOT have (it exited 143 before the predict sweep)
    from vision_mtl_tpu.tracking.artifacts import registered_runs

    reg_path = os.path.join(str(tmp_path), "run_registry.json")
    assert os.path.exists(reg_path), os.listdir(str(tmp_path))
    got = registered_runs("synthetic", path=reg_path)
    assert set(got) == {"basic"}
    # the resumed run claims a fresh version dir (version_1) and that —
    # the dir holding the COMPLETED run's checkpoints — is what registers;
    # it must be loadable by the eval harness (has epoch checkpoints)
    reg_dir = got["basic"]["run_dir"]
    assert reg_dir.startswith(os.path.join(str(tmp_path), "training-basic"))
    assert any(
        name.startswith("model_") for name in os.listdir(reg_dir)
    ), os.listdir(reg_dir)

    # a restart-policy relaunch of the ALREADY-COMPLETED run trains zero
    # epochs into a fresh version dir with no checkpoints — it must not
    # clobber the good registry entry with a checkpoint-less one
    p3 = subprocess.run(
        cli + ["--auto_resume"], env=env, cwd=cwd, timeout=560,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    out3 = p3.stdout.decode()
    assert p3.returncode == 0, out3[-3000:]
    assert "Not registering" in out3, out3[-3000:]
    got3 = registered_runs("synthetic", path=reg_path)
    assert got3["basic"]["run_dir"] == reg_dir
    assert any(
        name.startswith("model_")
        for name in os.listdir(got3["basic"]["run_dir"])
    ), os.listdir(reg_dir)


def test_resolve_resume_survives_corrupt_meta(tmp_path, capsys):
    """A truncated preempt_meta.json (SIGKILL mid-write on a pre-atomic
    build) must not turn every --auto_resume relaunch into a crash loop:
    the sidecar is only a recency cache — fall back to the preemption
    artifact when it is the only state (its true position lives in the
    Orbax session) and to the epoch checkpoints otherwise."""
    from vision_mtl_tpu.train.checkpoint import resolve_resume

    run = tmp_path / "version_0"
    (run / "preempt_model").mkdir(parents=True)
    (run / "preempt_session").mkdir()
    (run / "preempt_meta.json").write_text('{"epoch": 1, "ba')  # truncated

    # no epoch saves: the preemption artifact is the only state
    assert resolve_resume(str(run)) == "preempt"
    assert "unreadable" in capsys.readouterr().out

    # epoch saves exist: recency is undecidable -> conservative epoch resume
    (run / "model_0").mkdir()
    (run / "session_0").mkdir()
    assert resolve_resume(str(run)) == "epoch"

    # an intact sidecar newer than the epoch saves still wins
    (run / "preempt_meta.json").write_text('{"epoch": 1, "batch_in_epoch": 3}')
    assert resolve_resume(str(run)) == "preempt"


def test_find_latest_resumable_run(tmp_path):
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.train.checkpoint import (
        find_latest_resumable_run,
        save_preempt_ckpt,
    )

    assert find_latest_resumable_run(str(tmp_path / "absent")) is None

    base = tmp_path / "training-basic"
    for v in range(3):
        os.makedirs(base / f"version_{v}")
    # nothing resumable yet (empty run dirs — e.g. crashed before saving)
    assert find_latest_resumable_run(str(base)) is None

    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    # version_1 has a full epoch pair; version_2 (newer) stays empty — the
    # scan must skip the empty one and return version_1
    save_ckpt(state, ReduceLROnPlateau(), 0, str(base / "version_1"))
    assert find_latest_resumable_run(str(base)) == str(base / "version_1")
    # a newer preempted run wins
    save_preempt_ckpt(
        state, ReduceLROnPlateau(), 0, 1, init_metrics(nc), 0,
        str(base / "version_2"),
    )
    assert find_latest_resumable_run(str(base)) == str(base / "version_2")


def test_prune_old_ckpts(tmp_path):
    """Retention keeps the newest K pairs, never touches preemption
    artifacts, and the run dir stays exact-resumable."""
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.train.checkpoint import (
        prune_old_ckpts,
        restore_session,
        save_preempt_ckpt,
    )

    nc = fetch_data_cfg("synthetic").num_classes
    model = _tiny_model(nc)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 64, 64, 3)), lr=1e-3
    )
    sched = ReduceLROnPlateau()
    for e in range(4):
        save_ckpt(state, sched, e, str(tmp_path))
    save_preempt_ckpt(state, sched, 4, 1, init_metrics(nc), 0, str(tmp_path))

    assert prune_old_ckpts(str(tmp_path), 0) == []  # keep-all default
    assert prune_old_ckpts(str(tmp_path), 2) == [0, 1]
    names = set(os.listdir(tmp_path))
    assert {"model_2", "session_2", "model_3", "session_3"} <= names
    assert not ({"model_0", "session_0", "model_1", "session_1"} & names)
    assert {"preempt_model", "preempt_session"} <= names
    # pruning again is a no-op, and the dir still exact-resumes (epoch 3)
    assert prune_old_ckpts(str(tmp_path), 2) == []
    _, _, start_epoch = restore_session(
        create_train_state(
            model, jax.random.key(1), jnp.zeros((4, 64, 64, 3)), lr=1e-3
        ),
        ReduceLROnPlateau(),
        str(tmp_path),
    )
    assert start_epoch == 4
