"""Pipeline factory helpers — the reference's ``utils/pipeline_utils``
component constructors (init_model/create_tools/create_main_components,
pipeline_utils.py:22-77) adapted to the functional train-state world.
"""

from __future__ import annotations

import argparse
import typing as t

import jax
import jax.numpy as jnp

from vision_mtl_tpu.cfg import DataConfig, cfg, fetch_data_cfg  # noqa: F401
from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.models import build_model
from vision_mtl_tpu.tracking import MetricsLogger, create_tracking_exp, log_params_to_exp
from vision_mtl_tpu.train.checkpoint import log_args, restore_state
from vision_mtl_tpu.train.state import TrainState, create_train_state


def compute_dtype(args: argparse.Namespace) -> t.Any:
    return jnp.bfloat16 if getattr(args, "precision", "bf16") == "bf16" else jnp.float32


def init_model(
    args: argparse.Namespace, data_cfg: DataConfig
) -> t.Tuple[t.Any, TrainState]:
    """Build model + train state; warm-start from --ckpt_dir if given
    (reference init_model, pipeline_utils.py:22-30)."""
    model = build_model(args, data_cfg, dtype=compute_dtype(args))
    height = data_cfg.train_transform.height if data_cfg.train_transform else data_cfg.height
    width = data_cfg.train_transform.width if data_cfg.train_transform else data_cfg.width
    sample_img = jnp.zeros((args.batch_size, height, width, 3), jnp.float32)
    state = create_train_state(
        model,
        jax.random.key(getattr(args, "seed", cfg.seed)),
        sample_img,
        lr=args.lr,
    )
    if getattr(args, "backbone_weights", None) == "imagenet":
        from vision_mtl_tpu.utils.torch_port import apply_imagenet_backbone

        params, batch_stats, _ = apply_imagenet_backbone(
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            args.model_name,
        )
        state = state.replace(params=params, batch_stats=batch_stats)
    if getattr(args, "ckpt_dir", None):
        state = restore_state(state, args.ckpt_dir)
    return model, state


def create_main_components(
    args: argparse.Namespace, data_cfg: DataConfig
) -> t.Dict[str, t.Any]:
    """Datamodule + model + state (reference create_main_components,
    pipeline_utils.py:59-77)."""
    datamodule = MTLDataModule(
        dataset_name=args.dataset_name,
        batch_size=args.batch_size,
        do_overfit=args.do_overfit,
        num_workers=args.num_workers,
        train_transform=data_cfg.train_transform,
        test_transform=data_cfg.test_transform,
        seed=getattr(args, "seed", cfg.seed),
        wire_format=getattr(args, "wire_format", None),
    )
    datamodule.setup()
    model, state = init_model(args, data_cfg)
    return {"datamodule": datamodule, "model": model, "state": state}


def create_tools(
    args: argparse.Namespace, rendezvous_tag: str = "main"
) -> t.Dict[str, t.Any]:
    """Experiment tracker + metrics logger (reference create_tools,
    pipeline_utils.py:33-56).

    Multi-process: only process 0 owns the comet experiment and writes
    train_args.yaml; MetricsLogger itself resolves ONE shared run dir across
    processes (tracking/tb.py) so the collective Orbax checkpoint path
    agrees everywhere. ``rendezvous_tag`` must be unique per construction
    site within a run (tuning passes the trial tag) — it is the
    ordinal-desync guard for that cross-process run-dir rendezvous."""
    from vision_mtl_tpu.parallel.multihost import process_info

    proc0 = process_info()[0] == 0
    try:
        # EVERYTHING before the MetricsLogger construction below is guarded:
        # peers may already be blocking in the run-dir rendezvous, so a
        # process-0 death here (comet experiment creation, remote
        # log_parameters/add_tags calls) must unblock them loudly instead of
        # letting them sit out the 10-minute KV timeout with no reason
        exp = create_tracking_exp(args) if proc0 else None
        if not args.exp_disabled and exp:
            args.run_name = exp.name
        log_params_to_exp(exp, vars(args), "args")
        if exp:
            exp.add_tags(
                [args.model_name, args.dataset_name] + args.exp_tags
            )
    except Exception as e:
        from vision_mtl_tpu.tracking.tb import publish_logger_failure

        publish_logger_failure(
            f"tracking setup raised on process 0 before the logger "
            f"rendezvous ({rendezvous_tag}): {type(e).__name__}: {e}"
        )
        raise

    log_subdir_name = f"training-{args.model_name}"
    if args.run_name:
        log_subdir_name += f"/{args.run_name}"
    logger = MetricsLogger(
        str(cfg.log_root_dir), log_subdir_name, rendezvous_tag=rendezvous_tag
    )
    if proc0:
        log_args(args, f"{logger.log_dir}/train_args.yaml", exp=exp)
    return {"exp": exp, "logger": logger}
