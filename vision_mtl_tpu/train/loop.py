"""Training pipeline — the reference's manual epoch loop (training_lit.py:
37-183) rebuilt around jitted steps and device-prefetched data.

Per epoch: hot loop of ``train_step`` over sharded batches (forward + loss +
backward + Adam + metric accumulation fused in one XLA program), epoch-end
metric finalize, periodic validation (benchmark-batch prediction plots +
eval sweep), host-side plateau LR schedule stepped on the SUMMED val loss
(reference :168, quirk #4), periodic dual-artifact checkpointing.

Metric-name surface matches the reference: ``step/{stage}/{k}``,
``epoch/{stage}/{k}``, epoch_metrics dict keyed ``{stage}/{k}``.
"""

from __future__ import annotations

import argparse
import time
import typing as t
from collections import defaultdict

import jax

from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.data.loader import prefetch_to_device
from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.parallel.mesh import put_batch, shard_state
from vision_mtl_tpu.train.checkpoint import save_ckpt
from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import TrainState, get_lr, set_lr
from vision_mtl_tpu.train.step import (
    make_eval_step,
    make_predict_step,
    make_train_step,
)

METRIC_KEYS = (
    "loss",
    "accuracy",
    "jaccard_index",
    "fbeta_score",
    "mae",
)


def _metrics_float(mstate) -> t.Dict[str, float]:
    return {k: float(v) for k, v in compute_metrics(mstate).items()}


class _LaggedLossLog:
    """One-step-lagged per-step loss logging: step N's device_get happens
    only after step N+1 was enqueued, so the host sync overlaps device
    compute instead of serializing dispatch against completion (measured:
    the eager fetch cost run_pipe ~its whole step budget through the relay
    — docs/BENCH_NOTES.md round-3). ONE device_get per logged step (a
    per-scalar float() would round-trip 3x). Shared by the train and val
    loops; call ``flush()`` after the loop to drain the last pending step."""

    def __init__(self, prefix: str, logger: t.Any, exp: t.Any = None):
        self._prefix, self._logger, self._exp = prefix, logger, exp
        self._pending: t.Optional[t.Tuple[int, t.Any]] = None

    def offer(self, step_no: int, step_losses: t.Any, want: bool) -> None:
        self.flush()
        if self._logger is not None and want:
            self._pending = (step_no, step_losses)

    def flush(self) -> None:
        if self._pending is None:
            return
        step_no, step_losses = self._pending
        self._pending = None
        stats = {
            f"{self._prefix}/{k}": float(v)
            for k, v in jax.device_get(step_losses).items()
        }
        self._logger.log_metrics(stats, step=step_no)
        if self._exp:
            for k, v in stats.items():
                self._exp.log_metric(k, v, step=step_no)


def _log_param_histograms(logger: t.Any, state: TrainState, step: int) -> None:
    tb = getattr(logger, "_tb", None)
    if tb is None:
        return
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, value in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        try:
            tb.add_histogram(name, jax.device_get(value), step)
        except Exception:
            return


def _align_cpu_multiprocess(
    datamodule, train_step, eval_step, state, num_classes, mesh
) -> None:
    """CPU multi-process survival kit (tests/_mp_pipeline_worker.py taught
    it): AOT-compile the big collective programs on every process first
    (populates the persistent compile cache — no collective runs), align
    at a coordination-service barrier (gRPC, long timeout), then execute
    ONE tiny warmup collective while the processes are tightly in step —
    so every first execution in the real loop is a near-simultaneous
    cache hit inside gloo's 30s rendezvous window."""
    # fresh throwaway loaders (datamodule factories construct per call, so
    # peeking here cannot consume the training loader's epoch/skip state)
    train_loader = datamodule.train_dataloader()
    train_batch = next(iter(train_loader))
    val_batch = next(iter(datamodule.val_dataloader()))

    full = getattr(train_loader, "shard_rows", True) is False
    mstate0 = init_metrics(num_classes)
    tb = put_batch(train_batch, mesh, full_local=full)
    vb = put_batch(val_batch, mesh, full_local=full)
    train_step.lower(state, tb, mstate0).compile()
    eval_step.lower(state, vb, mstate0).compile()

    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        "vmtl_cpu_align", timeout_in_ms=600_000
    )
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vmtl_gloo_warmup")


def run_pipe(
    args: argparse.Namespace,
    model: t.Any,
    state: TrainState,
    datamodule: MTLDataModule,
    num_epochs: int,
    num_classes: int,
    mesh: t.Any = None,
    exp: t.Any = None,
    logger: t.Any = None,
    log_every_n_steps: int = 1,
    log_param_histograms_every: int = 0,
    scheduler: t.Optional[ReduceLROnPlateau] = None,
    start_epoch: int = 0,
    epoch_callback: t.Optional[
        t.Callable[[int, t.Dict[str, float]], None]
    ] = None,
    preempt_guard: t.Any = None,
    start_batch: int = 0,
    initial_train_mstate: t.Any = None,
    start_val_step: int = 0,
) -> t.Tuple[TrainState, t.Dict[str, t.Dict[str, list]]]:
    """``epoch_callback(epoch, val_metrics)`` fires after each validation
    epoch (hyperparameter-tuning hook: the pruning callback raises
    TrialPruned to stop the run early — tuning.py). Exceptions propagate;
    pending async checkpoint saves are finalized either way.

    ``preempt_guard`` (train/preempt.py) is polled at every step boundary;
    when it fires, a mid-epoch preemption checkpoint is written and the
    process exits 143. ``start_batch``/``initial_train_mstate``/
    ``start_val_step`` continue an interrupted epoch exactly: the loader
    skips the already-trained batches of ``start_epoch``'s seeded order and
    the epoch's metric accumulators pick up where they stopped
    (checkpoint.restore_preempt)."""
    if mesh is not None:
        # place params/opt_state on the mesh — tensor-parallel layout when
        # the mesh has a 'model' axis, explicit replication otherwise. This
        # makes --mesh_shape data:K,model:M real in the CLI path (not just
        # the driver's dryrun).
        state = shard_state(state, mesh)
        # multi-process: row-sliced host-sharded loading is only valid when
        # processes span the data axis alone; otherwise flip the loaders to
        # full-batch mode (must happen before train_dataloader() below)
        from vision_mtl_tpu.data.datamodule import (
            configure_host_sharded_loading,
        )

        configure_host_sharded_loading(datamodule, mesh)
    train_step = make_train_step(
        model,
        loss_segm_weight=args.loss_segm_weight,
        loss_depth_weight=args.loss_depth_weight,
        mesh=mesh,
        grad_accum_steps=getattr(args, "grad_accum_steps", 1),
    )
    eval_step = make_eval_step(
        model,
        loss_segm_weight=args.loss_segm_weight,
        loss_depth_weight=args.loss_depth_weight,
        mesh=mesh,
    )
    # benchmark-batch predict stays replicated (4 samples need not divide
    # the data axis — see put_batch(benchmark_batch, None) below)
    predict_step = make_predict_step(model)

    if scheduler is None:
        scheduler = ReduceLROnPlateau(patience=2, factor=0.9)

    if jax.process_count() > 1 and jax.default_backend() == "cpu":
        # XLA:CPU's gloo collectives have a HARD 30s first-rendezvous
        # timeout per executable, and multi-minute compile/AOT-load skew
        # between processes (one busy core, 13M-param programs) blows it:
        # the raw CLI pod launch died here while the worker-based tests —
        # which AOT-precompile, barrier, then warm up gloo — pass. Encode
        # that survival kit in the product so the launch contract
        # (scripts/launch_local_pod.sh) holds on CPU hosts too. TPU pods
        # skip this: ICI collectives have no such rendezvous cliff.
        _align_cpu_multiprocess(
            datamodule, train_step, eval_step, state, num_classes, mesh
        )

    def _preempt_exit(epoch, batch_in_epoch, mstate_, val_step_):
        """Write the mid-epoch preemption checkpoint and exit 143.
        ``batch_in_epoch``/``mstate_`` are the epoch's trained-batch count
        and TRAIN accumulators (a val-time preemption saves the full-epoch
        pair — resume re-enters the epoch with zero train batches left and
        re-runs validation from the top, which only duplicates val work)."""
        if logger is not None:
            from vision_mtl_tpu.train.checkpoint import save_preempt_ckpt

            save_preempt_ckpt(
                state,
                scheduler,
                epoch,
                batch_in_epoch,
                mstate_,
                val_step_,
                save_dir=logger.log_dir,
            )
        else:
            print(
                "Preemption requested but run_pipe has no logger — no "
                "checkpoint dir to write; exiting without saving."
            )
        from vision_mtl_tpu.train.checkpoint import wait_for_saves

        wait_for_saves()
        print(
            f"Preempted at epoch {epoch + 1} step {global_step}; resume "
            "with --resume_dir."
        )
        # NOTE: no jax.distributed shutdown here — run_pipe does not own
        # the process group (tests resume in-process after catching this
        # SystemExit). training.main's finally does the coordinated
        # shutdown on this exit path too.
        raise SystemExit(143)

    benchmark_batch = datamodule.benchmark_batch
    benchmark_gather = None
    if jax.process_count() > 1:
        # presence must be process-UNIFORM: datamodule.setup() swallows a
        # per-host benchmark load failure into None (warn-and-continue),
        # and the benchmark predict below is collective — a host that
        # silently skipped it would hang every other host at the gather
        from vision_mtl_tpu.parallel.multihost import all_processes_agree

        if not all_processes_agree(
            benchmark_batch is not None, "benchmark_batch"
        ):
            if benchmark_batch is not None:
                print(
                    "benchmark batch dropped: at least one process failed "
                    "to load it, and the benchmark predict is collective"
                )
            benchmark_batch = None
    if benchmark_batch is not None:
        if jax.process_count() > 1 and mesh is not None:
            # multi-process: predict_step reads the (process-spanning)
            # train state, so its other inputs must live on the same global
            # device set — replicated from identical local copies (every
            # host loads the same fixed benchmark idxs). Outputs may still
            # come back sharded (e.g. model-axis TP layouts), so they are
            # all-gathered before the process-0 host fetch.
            from vision_mtl_tpu.parallel.mesh import (
                put_replicated,
                replicate_gather,
            )

            benchmark_batch = put_replicated(benchmark_batch, mesh)
            benchmark_gather = replicate_gather(mesh)
        else:
            # replicated placement: the 4-sample standing batch need not
            # divide the data axis
            benchmark_batch = put_batch(benchmark_batch, None)
    else:
        print("A batch for benchmarking is not found.")

    # resume continues the step axis (state.step was restored by
    # restore_session) so step-level metric streams do not restart at 0
    global_step = int(state.step)
    val_step = start_val_step
    if logger is None:
        print(
            "WARNING: run_pipe called without a logger — no checkpoints "
            "will be saved (save_dir comes from logger.log_dir)."
        )
    epoch_metrics: t.Dict[str, t.Dict[str, list]] = {
        "train": defaultdict(list),
        "val": defaultdict(list),
    }

    # ONE loader instance across epochs: its seeded reshuffle advances with
    # an internal epoch counter (loader.py), so a fresh instance per epoch
    # would silently train on the same batch order every epoch
    train_loader = datamodule.train_dataloader()
    train_loader.epoch = start_epoch  # resume continues the shuffle stream
    # mid-epoch (preemption) resume: skip start_epoch's already-trained
    # batches without decoding them (one-shot — later epochs run in full)
    train_loader.skip_batches = start_batch

    for epoch in range(start_epoch, num_epochs):
        print(f"### Epoch {epoch + 1}/{num_epochs} ###")
        # ---------------- train ----------------
        epoch_t0 = time.perf_counter()
        if epoch == start_epoch and initial_train_mstate is not None:
            # continue the interrupted epoch's metric accumulators so its
            # epoch-end train metrics match an uninterrupted run exactly
            mstate = initial_train_mstate
            batch_in_epoch = start_batch
        else:
            mstate = init_metrics(num_classes)
            batch_in_epoch = 0

        step_log = _LaggedLossLog("step/train", logger, exp)
        for batch in prefetch_to_device(train_loader, mesh, size=2):
            state, mstate, losses = train_step(state, batch, mstate)
            step_log.offer(
                global_step, losses, global_step % log_every_n_steps == 0
            )
            if (
                log_param_histograms_every
                and global_step % log_param_histograms_every == 0
            ):
                # parameter histograms (reference on_after_backward logs the
                # state_dict every 25 steps, lit_module.py:221-230). Opt-in:
                # fetching all params to host is expensive.
                _log_param_histograms(logger, state, global_step)
            global_step += 1
            batch_in_epoch += 1
            if preempt_guard is not None and preempt_guard.requested(
                global_step
            ):
                step_log.flush()
                _preempt_exit(epoch, batch_in_epoch, mstate, val_step)
        step_log.flush()
        epoch_start_batch = start_batch if epoch == start_epoch else 0

        train_metrics = _metrics_float(mstate)
        # end-to-end epoch throughput (host decode + H2D + compute): the
        # _metrics_float device fetch above IS the honest sync — on
        # relay-attached TPUs block_until_ready alone measures dispatch rate
        # (docs/BENCH_NOTES.md). Observability only; NOT part of the
        # reference-parity metric surface (epoch_metrics stays untouched).
        epoch_dt = time.perf_counter() - epoch_t0
        imgs_seen = (batch_in_epoch - epoch_start_batch) * train_loader.batch_size
        if epoch_dt > 0 and imgs_seen > 0:
            ips = imgs_seen / epoch_dt
            print(
                f"epoch/train throughput: {ips:.1f} img/s end-to-end "
                f"({imgs_seen} imgs in {epoch_dt:.1f}s)"
            )
            if logger is not None:
                logger.log_metrics(
                    {"epoch/train/imgs_per_sec": ips}, step=epoch
                )
        for k, v in train_metrics.items():
            epoch_metrics["train"][f"train/{k}"].append(v)
        print(
            "epoch/train: "
            + " ".join(f"{k}: {train_metrics[k]:.3f}" for k in METRIC_KEYS)
        )
        if logger is not None:
            logger.log_metrics(
                {f"epoch/train/{k}": v for k, v in train_metrics.items()},
                step=epoch,
            )
        if exp:
            exp.log_metrics(
                {f"epoch/train/{k}": v for k, v in train_metrics.items()},
                step=epoch,
            )

        # ---------------- validation ----------------
        if (epoch + 1) % args.val_epoch_freq == 0:
            if jax.process_count() > 1:
                # exp exists only on process 0 (pipeline.create_tools), but
                # predict_step reads the process-spanning state — EVERY
                # process must execute it or none. Gate on a predicate all
                # processes compute identically from args/env.
                from vision_mtl_tpu.tracking.comet import comet_enabled

                want_benchmark = args.do_plot_preds or comet_enabled(args)
            else:
                want_benchmark = bool(exp) or args.do_plot_preds
            if benchmark_batch is not None and want_benchmark:
                benchmark_preds = predict_step(state, benchmark_batch["img"])
                if benchmark_gather is not None:
                    # collective all-gather (every process participates):
                    # under e.g. model-axis TP the preds come back sharded
                    # and process 0 could not device_get them otherwise
                    benchmark_preds = benchmark_gather(benchmark_preds)
                if jax.process_index() != 0:
                    benchmark_preds = None  # plotting is process-0-only
            else:
                benchmark_preds = None
            if benchmark_preds is not None:
                try:
                    from vision_mtl_tpu.vis import plot_preds

                    fig = plot_preds(
                        batch_size=benchmark_batch["img"].shape[0],
                        inputs_batch=jax.device_get(benchmark_batch),
                        preds_batch=jax.device_get(benchmark_preds),
                    )
                    if exp:
                        exp.log_figure("preds", fig)
                    if logger is not None:
                        logger.log_figure("preds", fig, step=epoch)
                    import matplotlib.pyplot as plt

                    if args.do_show_preds:
                        plt.show()
                    plt.close(fig)
                except Exception as e:
                    print("benchmark plot failed:", e)

            val_mstate = init_metrics(num_classes)
            # reference logs val steps to TB and comet (training_lit.py:
            # 143-145); exp is process-0-only, matching the sink ownership
            val_log = _LaggedLossLog("step/val", logger, exp)
            # val-time preemption resumes val from the top: remember where
            # this sweep's step numbering started
            val_step0 = val_step
            for batch in prefetch_to_device(
                datamodule.val_dataloader(), mesh, size=2
            ):
                val_mstate, losses = eval_step(state, batch, val_mstate)
                val_log.offer(
                    val_step, losses, val_step % log_every_n_steps == 0
                )
                val_step += 1
                if preempt_guard is not None and preempt_guard.requested(
                    global_step
                ):
                    # native-res val sweeps are long — don't sit out the
                    # grace window waiting for the next train step
                    val_log.flush()
                    _preempt_exit(epoch, batch_in_epoch, mstate, val_step0)
            val_log.flush()

            # summed val loss drives the plateau scheduler (reference :168)
            val_loss_sum = float(val_mstate.loss_sum)
            val_metrics = _metrics_float(val_mstate)
            for k, v in val_metrics.items():
                epoch_metrics["val"][f"val/{k}"].append(v)
            print(
                "epoch/val: "
                + " ".join(f"{k}: {val_metrics[k]:.3f}" for k in METRIC_KEYS)
            )
            if logger is not None:
                logger.log_metrics(
                    {f"epoch/val/{k}": v for k, v in val_metrics.items()},
                    step=epoch,
                )
            if exp:
                exp.log_metrics(
                    {f"epoch/val/{k}": v for k, v in val_metrics.items()},
                    step=epoch,
                )

            new_lr = scheduler.step(val_loss_sum, get_lr(state))
            if new_lr != get_lr(state):
                print(f"Plateau: reducing lr to {new_lr:.3e}")
                state = set_lr(state, new_lr)

            if epoch_callback is not None:
                try:
                    epoch_callback(epoch, val_metrics)
                except BaseException:
                    # a pruned trial must not leave async checkpoint writes
                    # dangling
                    from vision_mtl_tpu.train.checkpoint import wait_for_saves

                    wait_for_saves()
                    raise

        # ---------------- checkpoint ----------------
        # multi-process: EVERY process must call save (orbax checkpointing
        # is a collective under jax.distributed — a lone-writer would
        # deadlock the barrier); orbax itself elects process 0 to write
        # the single coherent artifact for replicated (dp/sp) state
        epoch_saved = (
            epoch + 1
        ) % args.save_epoch_freq == 0 or epoch == num_epochs - 1
        if epoch_saved and logger is not None:
            # async: the write overlaps the next epoch; finalized below
            save_ckpt(
                state,
                scheduler,
                epoch,
                save_dir=logger.log_dir,
                exp=exp,
                block=False,
            )
            keep_k = getattr(args, "keep_ckpt_last_k", 0)
            if keep_k > 0:
                # disk housekeeping (opt-in; waits out the async save, so
                # it trades the save/compute overlap for bounded disk)
                from vision_mtl_tpu.train.checkpoint import prune_old_ckpts

                prune_old_ckpts(logger.log_dir, keep_k)

        # epoch-end tail poll: a notice during the epoch-metric host syncs,
        # benchmark plotting, or callback would otherwise only be honored
        # after the NEXT epoch's first train step. The epoch (incl. its
        # scheduler step) is COMPLETE here, so the exact resume point is a
        # regular end-of-epoch checkpoint (resume at epoch+1), not a
        # mid-epoch artifact (which would re-run val and re-step the
        # scheduler).
        if preempt_guard is not None and preempt_guard.requested(
            global_step
        ):
            if logger is not None and not epoch_saved:
                save_ckpt(
                    state, scheduler, epoch, save_dir=logger.log_dir, exp=exp
                )
            from vision_mtl_tpu.train.checkpoint import wait_for_saves

            wait_for_saves()
            print(
                f"Preempted after epoch {epoch + 1}; resume with "
                "--resume_dir."
            )
            raise SystemExit(143)

    from vision_mtl_tpu.train.checkpoint import wait_for_saves

    wait_for_saves()
    return state, epoch_metrics
