"""Training CLI — the reference's primary entry (training_lit.py:219-274):
parse args -> configs -> components -> optional hyperparameter sweep ->
train (run_pipe) -> predict sweep -> persist predictions + final metrics.

Run:  python -m vision_mtl_tpu.training --dataset_name cityscapes \
          --model_name mtan --num_epochs 20 --batch_size 8 --lr 5e-4
"""

from __future__ import annotations

import os

import jax

from vision_mtl_tpu.cfg import cfg, fetch_data_cfg
from vision_mtl_tpu.parallel.mesh import create_mesh
from vision_mtl_tpu.pipeline import create_main_components, create_tools
from vision_mtl_tpu.predict import predict, save_preds
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.utils.args import parse_args, select_backend, update_args


def _setup_compile_cache() -> None:
    """Persistent compilation cache — TPU compiles are expensive (tens of
    seconds per program through remote compile)."""
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> None:
    # argparse first (it is jax-free, so --help / flag typos exit cleanly
    # WITHOUT joining the pod rendezvous), then multi-process launchers
    # (TPU pods / COORDINATOR_ADDRESS env) join the jax.distributed process
    # group BEFORE any other jax use — the init refuses to run once any jax
    # API has initialized the backend, and without it every process would
    # silently train as an independent single-process job
    # (parallel/multihost.py)
    args = parse_args(argv)
    from vision_mtl_tpu.parallel.multihost import (
        maybe_initialize_distributed,
        shutdown_distributed,
    )

    maybe_initialize_distributed()
    try:
        _main(args)
    except SystemExit:
        # process-uniform exits (the preemption guard's exit 143, arg
        # validation) must ALSO leave the coordination service together —
        # otherwise the leader's interpreter teardown fatals a
        # still-connected peer and a relaunch loop keyed on exit 143 sees a
        # random abort instead. Non-uniform failures (one process crashing)
        # deliberately skip this: a barrier no peer will reach only delays
        # the inevitable collective failure.
        shutdown_distributed()
        raise
    # multi-process: leave the coordination service together — letting
    # interpreter teardown race it can fatal a still-connected peer after
    # a fully successful run (parallel/multihost.py)
    shutdown_distributed()


def _main(args) -> None:
    cfg.update_fields_with_args(args)
    select_backend(args.device)
    _setup_compile_cache()

    data_cfg = fetch_data_cfg(args.dataset_name)
    if getattr(args, "data_dir", None):
        data_cfg.data_dir = args.data_dir

    if getattr(args, "auto_resume", False) and not getattr(
        args, "resume_dir", None
    ):
        # relaunch-loop resume: same command line finds its own interrupted
        # run (deterministic scan of the shared run-dir root, so every
        # jax.distributed process resolves the same answer)
        from vision_mtl_tpu.train.checkpoint import find_latest_resumable_run

        base = os.path.join(
            str(cfg.log_root_dir), f"training-{args.model_name}"
        )
        if args.run_name:
            base = os.path.join(base, args.run_name)
        found = find_latest_resumable_run(base)
        if found:
            args.resume_dir = found
            print(f"--auto_resume: resuming {found}")
        else:
            print("--auto_resume: no resumable run found; starting fresh")

    mesh = create_mesh(args.mesh_shape) if len(jax.devices()) > 1 else None
    if mesh is not None:
        print(f"Mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
        data_shards = mesh.shape.get("data", 1)
        if args.batch_size % data_shards:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by the "
                f"mesh data axis ({data_shards}); pick a multiple or adjust "
                f"--mesh_shape."
            )

    if args.do_optimize:
        from vision_mtl_tpu.tuning import run_study

        optimal_params = run_study(args, data_cfg, mesh=mesh)
        update_args(args, optimal_params)
        args.exp_tags = list(args.exp_tags) + ["best_trial"]

    # registry key from the USER's args — create_tools may overwrite
    # run_name with the comet experiment name (pipeline.py), and the
    # registry should keep stable model-derived keys ("basic_tuned"), like
    # the reference's table (comet_utils.py:9-30)
    from vision_mtl_tpu.tracking.artifacts import run_registry_key

    registry_key = run_registry_key(args)

    tools = create_tools(args)
    exp = tools["exp"]
    logger = tools["logger"]

    components = create_main_components(args, data_cfg)
    datamodule = components["datamodule"]
    model = components["model"]
    state = components["state"]

    scheduler = None
    start_epoch = 0
    start_batch = 0
    initial_train_mstate = None
    start_val_step = 0
    if getattr(args, "resume_dir", None):
        from vision_mtl_tpu.train.checkpoint import (
            resolve_resume,
            restore_preempt,
            restore_session,
        )
        from vision_mtl_tpu.train.plateau import ReduceLROnPlateau

        scheduler = ReduceLROnPlateau(patience=2, factor=0.9)
        if resolve_resume(args.resume_dir) == "preempt":
            # a mid-epoch preemption checkpoint is the latest state: resume
            # INSIDE the interrupted epoch (train/preempt.py)
            (
                state,
                scheduler,
                start_epoch,
                start_batch,
                initial_train_mstate,
                start_val_step,
            ) = restore_preempt(
                state, scheduler, args.resume_dir, data_cfg.num_classes
            )
            print(
                f"Resumed preempted run {args.resume_dir} at epoch "
                f"{start_epoch} batch {start_batch}"
            )
        else:
            state, scheduler, start_epoch = restore_session(
                state, scheduler, args.resume_dir
            )
            print(f"Resumed from {args.resume_dir} at epoch {start_epoch}")

    preempt_guard = None
    if getattr(args, "preempt_save", False):
        from vision_mtl_tpu.train.preempt import PreemptionGuard

        preempt_guard = PreemptionGuard()

    state, _ = run_pipe(
        args,
        model,
        state,
        datamodule,
        num_epochs=args.num_epochs,
        num_classes=data_cfg.num_classes,
        mesh=mesh,
        exp=exp,
        logger=logger,
        log_param_histograms_every=getattr(
            args, "log_param_histograms_every", 0
        ),
        scheduler=scheduler,
        start_epoch=start_epoch,
        preempt_guard=preempt_guard,
        start_batch=start_batch,
        initial_train_mstate=initial_train_mstate,
        start_val_step=start_val_step,
    )

    preds, predict_metrics = predict(
        datamodule.predict_dataloader(),
        model,
        state,
        num_classes=data_cfg.num_classes,
        mesh=mesh,
        do_plot_preds=args.do_plot_preds,
        exp=exp,
        do_show_preds=args.do_show_preds,
        loss_segm_weight=args.loss_segm_weight,
        loss_depth_weight=args.loss_depth_weight,
    )
    if jax.process_index() == 0:
        # every process runs the (collective) predict sweep; one writes
        save_preds(preds, os.path.join(logger.log_dir, "preds.npz"))

    print(
        "predict: "
        + " ".join(f"{k}: {v:.3f}" for k, v in predict_metrics.items())
    )
    logger.log_metrics(predict_metrics, step=args.num_epochs)
    if jax.process_index() == 0:
        # publish the finished run in the local trained-run registry (the
        # reference's comet_utils.py:9-30 table, auto-populated) so
        # `eval_harness --from_registry` finds it without hand-typed paths.
        # Only when THIS run dir holds model checkpoints: a relaunch of an
        # already-completed run (--auto_resume restart loop) trains zero
        # epochs into a fresh version dir and must not clobber the good
        # entry with a checkpoint-less one.
        from vision_mtl_tpu.tracking.artifacts import register_run
        from vision_mtl_tpu.train.checkpoint import _epochs

        # real model_{N} Orbax artifacts only — a stray "model_*"-prefixed
        # file must not count as a checkpoint
        has_ckpt = bool(_epochs(logger.log_dir, "model"))
        if has_ckpt:
            reg = register_run(
                args.model_name,
                args.dataset_name,
                logger.log_dir,
                key=registry_key,
            )
            print(f"Registered run {registry_key!r} in {reg}")
        else:
            print(
                f"Not registering {logger.log_dir}: no model checkpoints "
                f"written by this launch (already-completed run?)"
            )
    if exp:
        exp.log_metrics(
            {f"epoch/{k}": v for k, v in predict_metrics.items()},
            step=args.num_epochs,
        )
        exp.end()
    logger.close()


if __name__ == "__main__":
    main()
