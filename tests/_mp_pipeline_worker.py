"""Worker for the FULL-pipeline 2-process test (test_multiprocess.py).

Each of 2 processes owns 1 virtual CPU device; together they drive
``run_pipe`` end to end under jax.distributed over a data:2 mesh:
host-sharded loaders (each host decodes only its half of every global
batch — data/loader.py), global-batch assembly in put_batch, ONE coherent
Orbax checkpoint written by process 0, then an exact resume that must
reproduce an uninterrupted run's final-epoch metrics.

Usage: python tests/_mp_pipeline_worker.py <pid> <port> <tmpdir> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Logger:
    def __init__(self, log_dir):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def log_metrics(self, metrics, step):
        pass

    def log_figure(self, *a, **k):
        pass


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    tmpdir = sys.argv[3]
    out_path = sys.argv[4]

    # ONE device per process: this host has a single core, and 2 devices
    # x 2 processes of concurrent XLA compute starve gloo's TCP event loop
    # past its hard 30s rendezvous timeout (measured: "Connect timeout" /
    # "GetKeyValue timed out" at the first collective). A data:2 mesh still
    # exercises true process-spanning collectives.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    import argparse

    import jax.numpy as jnp

    from vision_mtl_tpu.cfg import fetch_data_cfg
    from vision_mtl_tpu.data.datamodule import MTLDataModule
    from vision_mtl_tpu.models.mtan import MTANMiniUnet
    from vision_mtl_tpu.parallel.mesh import create_mesh
    from vision_mtl_tpu.train.checkpoint import restore_session
    from vision_mtl_tpu.train.loop import run_pipe
    from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
    from vision_mtl_tpu.train.state import create_train_state

    data_cfg = fetch_data_cfg("synthetic")
    mesh = create_mesh("data:2")
    args = argparse.Namespace(
        loss_segm_weight=1.0,
        loss_depth_weight=1.0,
        val_epoch_freq=1,
        save_epoch_freq=2,
        # exercise the multi-process benchmark path: EVERY process must run
        # predict_step (it reads process-spanning state); only process 0
        # renders/logs the figure (train/loop.py)
        do_plot_preds=True,
        do_show_preds=False,
        batch_size=4,
        num_workers=0,
        do_overfit=True,
    )

    from vision_mtl_tpu.cfg import ResizeSpec

    spec = ResizeSpec(32, 32)

    def fresh():
        dm = MTLDataModule(
            "synthetic", batch_size=4, do_overfit=True,
            train_transform=spec, test_transform=spec,
        )
        dm.setup()
        model = MTANMiniUnet(
            map_tasks_to_num_channels={"depth": 1, "segm": data_cfg.num_classes},
            task_subnets_hidden_channels=4,
            encoder_first_channel=4,
            encoder_num_channels=2,
            dtype=jnp.float32,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((4, 32, 32, 3)), lr=3e-3
        )
        return dm, model, state

    # ---- phase 0: AOT-precompile every collective program, then barrier.
    # XLA:CPU's gloo rendezvous has a hard 30s key-exchange timeout; on a
    # 1-core host the two processes' jit compiles skew by minutes, so the
    # first process to EXECUTE a collective times out waiting for its peer.
    # .lower().compile() builds the executables (populating the persistent
    # compile cache) WITHOUT running any collective; the coordination-service
    # barrier (gRPC, long timeout) then aligns both processes so every first
    # execution inside run_pipe is a near-simultaneous cache hit.
    from vision_mtl_tpu.data.loader import prefetch_to_device  # noqa: F401
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.parallel.mesh import put_batch, shard_state
    from vision_mtl_tpu.train.step import make_eval_step, make_train_step

    dm0, model0, state0 = fresh()
    state0 = shard_state(state0, mesh)
    mstate0 = init_metrics(data_cfg.num_classes)
    train_b = put_batch(next(iter(dm0.train_dataloader())), mesh)
    val_b = put_batch(next(iter(dm0.val_dataloader())), mesh)
    make_train_step(model0, mesh=mesh).lower(state0, train_b, mstate0).compile()
    make_eval_step(model0, mesh=mesh).lower(state0, val_b, mstate0).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("precompiled", timeout_in_ms=600_000)
    # executed warmup collective: creates the all-device gloo context while
    # the processes are tightly aligned (the rendezvous has a hard 30s
    # timeout that compile/trace skew on a 1-core host can exceed)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo_warmup")

    # ---- run A: uninterrupted 3 epochs ----
    # NOTE: the run dir is SHARED across processes — orbax checkpointing is
    # collective (every process calls save; process 0 writes), so the save
    # path must be identical everywhere. The no-op logger writes no metric
    # files, so there is no cross-process file race here.
    dm, model, state = fresh()
    _, metrics_a = run_pipe(
        args, model, state, dm,
        num_epochs=3, num_classes=data_cfg.num_classes, mesh=mesh,
        logger=_Logger(os.path.join(tmpdir, "runA")),
    )

    # ---- run B: 2 epochs, checkpoint (process 0 writes), resume, 1 more ----
    ckpt_dir = os.path.join(tmpdir, "runB")
    dm, model, state = fresh()
    _, metrics_b1 = run_pipe(
        args, model, state, dm,
        num_epochs=2, num_classes=data_cfg.num_classes, mesh=mesh,
        logger=_Logger(ckpt_dir),
    )
    # every process must see the finished checkpoint before restoring
    # (coordination-service barrier: pure gRPC, no gloo rendezvous)
    _dist.global_state.client.wait_at_barrier("ckpt_written", timeout_in_ms=600_000)
    assert os.path.isdir(os.path.join(ckpt_dir, "model_1")), os.listdir(ckpt_dir)

    dm, model, state = fresh()
    scheduler = ReduceLROnPlateau(patience=2, factor=0.9)
    state, scheduler, start_epoch = restore_session(state, scheduler, ckpt_dir)
    assert start_epoch == 2, start_epoch
    _, metrics_b2 = run_pipe(
        args, model, state, dm,
        num_epochs=3, num_classes=data_cfg.num_classes, mesh=mesh,
        logger=_Logger(os.path.join(tmpdir, "runB_resumed")),
        scheduler=scheduler, start_epoch=start_epoch,
    )

    # ---- run C: preemption under jax.distributed — the preempt save is a
    # COLLECTIVE orbax write (every process calls it; orbax elects process
    # 0), then an exact resume must reproduce run A's tail. The injected
    # fault is process-uniform (same step on both), mirroring a real spot
    # eviction delivered through jax's preemption sync point. ----
    from vision_mtl_tpu.train.checkpoint import (
        resolve_resume,
        restore_preempt,
    )
    from vision_mtl_tpu.train.preempt import PreemptionGuard

    guard = PreemptionGuard(inject_at_step=2)
    pre_dir = os.path.join(tmpdir, "runC")
    dm, model, state = fresh()
    preempt_code = None
    try:
        run_pipe(
            args, model, state, dm,
            num_epochs=3, num_classes=data_cfg.num_classes, mesh=mesh,
            logger=_Logger(pre_dir), preempt_guard=guard,
        )
    except SystemExit as e:
        preempt_code = e.code
    _dist.global_state.client.wait_at_barrier(
        "preempt_saved", timeout_in_ms=600_000
    )
    resume_mode = resolve_resume(pre_dir)
    dm, model, state = fresh()
    sched = ReduceLROnPlateau(patience=2, factor=0.9)
    state, sched, c_epoch, c_batch, c_mstate, c_vstep = restore_preempt(
        state, sched, pre_dir, data_cfg.num_classes
    )
    _, metrics_c = run_pipe(
        args, model, state, dm,
        num_epochs=3, num_classes=data_cfg.num_classes, mesh=mesh,
        logger=_Logger(os.path.join(tmpdir, "runC_resumed")),
        scheduler=sched, start_epoch=c_epoch, start_batch=c_batch,
        initial_train_mstate=c_mstate, start_val_step=c_vstep,
    )

    # ---- predict sweep under jax.distributed: sharded step outputs are
    # all-gathered by predict()'s replicate identity so EVERY host fetches
    # the full predictions (and slices padding identically) ----
    from vision_mtl_tpu.predict import predict as predict_sweep

    preds, predict_metrics = predict_sweep(
        dm.predict_dataloader(),
        model,
        state,
        num_classes=data_cfg.num_classes,
        mesh=mesh,
    )
    n_pred = int(sum(p["segm"].shape[0] for p in preds))

    result = {
        "process_id": pid,
        "n_pred": n_pred,
        "n_predict_ds": len(dm.data_predict),
        "predict_acc": predict_metrics.get("predict/accuracy", -1.0),
        "a_train_loss": metrics_a["train"]["train/loss"],
        "a_val_loss": metrics_a["val"]["val/loss"],
        "a_val_acc": metrics_a["val"]["val/accuracy"],
        "b1_train_loss": metrics_b1["train"]["train/loss"],
        "resumed_train_loss": metrics_b2["train"]["train/loss"],
        "resumed_val_loss": metrics_b2["val"]["val/loss"],
        "resumed_val_acc": metrics_b2["val"]["val/accuracy"],
        "preempt_code": preempt_code,
        "preempt_resume_mode": resume_mode,
        "preempt_pos": [c_epoch, c_batch],
        "c_train_loss": metrics_c["train"]["train/loss"],
        "c_val_loss": metrics_c["val"]["val/loss"],
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
