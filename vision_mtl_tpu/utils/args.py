"""CLI argument surface — flag-for-flag parity with the reference parser
(reference: vision_mtl/utils/utils.py:8-49), plus TPU-specific additions kept
in their own group so the reference surface stays a strict subset.
"""

from __future__ import annotations

import argparse
import typing as t


def parse_args(argv: t.Optional[t.Sequence[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()

    pipe_args = parser.add_argument_group("pipe")
    pipe_args.add_argument("--do_overfit", action="store_true")
    pipe_args.add_argument("--do_optimize", action="store_true")
    pipe_args.add_argument("--do_plot_preds", action="store_true")
    pipe_args.add_argument("--do_show_preds", action="store_true")
    pipe_args.add_argument("--exp_disabled", action="store_true")
    pipe_args.add_argument("--ckpt_dir")
    pipe_args.add_argument(
        "--resume_dir",
        help="Exact-resume a run: restore params, optimizer, lr, plateau "
        "scheduler and epoch from this run dir and continue training.",
    )
    pipe_args.add_argument(
        "--auto_resume",
        action="store_true",
        help="Resume the newest resumable run dir for this model/run_name "
        "(spot-VM relaunch loops re-run the same command); starts fresh "
        "when none exists. Ignored when --resume_dir is given.",
    )
    pipe_args.add_argument("--run_name")
    pipe_args.add_argument(
        "--device",
        default="tpu",
        help="'tpu' (default backend) or 'cpu[:N]' to force the host "
        "backend with N virtual devices (reference utils.py:19 equivalent).",
    )
    pipe_args.add_argument("--exp_tags", nargs="*", default=[])

    model_args = parser.add_argument_group("model")
    model_args.add_argument(
        "--model_name", choices=["basic", "mtan", "csnet"], default="basic"
    )
    model_args.add_argument("--backbone_weights", choices=["imagenet"])
    model_args.add_argument("--channel_wise_stitching", action="store_true")

    data_args = parser.add_argument_group("data")
    data_args.add_argument(
        "--dataset_name",
        choices=["cityscapes", "nyuv2", "synthetic"],
        default="cityscapes",
    )
    data_args.add_argument("--batch_size", type=int, default=1)
    data_args.add_argument("--num_workers", type=int, default=0)
    data_args.add_argument(
        "--data_dir",
        default=None,
        help="Override the dataset's data directory (default: the config "
        "singleton's path under vision_mtl_tpu/data/).",
    )

    optuna_args = parser.add_argument_group("opt")
    optuna_args.add_argument("--n_trials", type=int, default=7)
    optuna_args.add_argument("--n_jobs", type=int, default=2)

    trainer_args = parser.add_argument_group("trainer")
    trainer_args.add_argument("--lr", type=float, default=5e-3)
    trainer_args.add_argument("--loss_segm_weight", type=float, default=1.0)
    trainer_args.add_argument("--loss_depth_weight", type=float, default=1.0)
    trainer_args.add_argument("--num_epochs", type=int, default=10)
    trainer_args.add_argument("--val_epoch_freq", type=int, default=1)
    trainer_args.add_argument("--save_epoch_freq", type=int, default=10)

    tpu_args = parser.add_argument_group("tpu")
    tpu_args.add_argument(
        "--mesh_shape",
        type=str,
        default="data:-1",
        help="Device mesh as 'axis:size,axis:size'; -1 = all remaining devices. "
        "Axes: data (batch), spatial (H sharding for large images), "
        "model (tensor parallelism: large conv kernels sharded on "
        "out-channels). E.g. 'data:2,model:2'. Unknown axes are rejected.",
    )
    tpu_args.add_argument("--seed", type=int, default=11)
    tpu_args.add_argument(
        "--precision",
        choices=["bf16", "f32"],
        default="bf16",
        help="Compute precision (params always f32).",
    )
    tpu_args.add_argument(
        "--log_param_histograms_every",
        type=int,
        default=0,
        help="Log parameter histograms to TensorBoard every N steps "
        "(reference logs every 25; 0 disables — host fetches are costly).",
    )
    tpu_args.add_argument(
        "--wire_format",
        choices=["f32", "compact"],
        default=None,
        help="Host->device batch encoding; default per dataset config.",
    )
    tpu_args.add_argument(
        "--fold_tail",
        action="store_true",
        help="Space-to-depth folded decoder tail (basic model; exact "
        "transform, ops/fold.py). Measured slower on v5e — off by default",
    )
    tpu_args.add_argument(
        "--remat_tail",
        type=int,
        default=0,
        help="Rematerialize the final N decoder blocks (basic model) to "
        "save activation memory. Measured slower on v5e — for configs "
        "that would otherwise OOM.",
    )
    tpu_args.add_argument(
        "--remat_encoder",
        action="store_true",
        help="Rematerialize every encoder block (basic and csnet models): "
        "only block boundaries stay live for backward. The high-resolution "
        "memory opt-in — unlocks larger batch dims, which set the pixel "
        "rate (docs/BENCH_NOTES.md round-3).",
    )
    tpu_args.add_argument(
        "--remat_attention",
        action="store_true",
        help="Rematerialize MTAN's per-task attention modules in backward "
        "(memory opt-in; measured slower at 128x256 bs128 but lets "
        "activation-capped configs compile — docs/BENCH_NOTES.md).",
    )
    tpu_args.add_argument(
        "--remat_shared",
        action="store_true",
        help="Rematerialize MTAN's shared mini-Unet DoubleConvs (the other "
        "half of its activation memory — high-resolution opt-in).",
    )
    tpu_args.add_argument(
        "--keep_ckpt_last_k",
        type=int,
        default=0,
        help="Keep only the newest K epoch checkpoint pairs (0 = keep all, "
        "the reference behavior). Preemption artifacts are never pruned.",
    )
    tpu_args.add_argument(
        "--preempt_save",
        action="store_true",
        help="Preemption-safe training: on SIGTERM (spot/preemptible TPU "
        "eviction notice) write a mid-epoch checkpoint at the next step "
        "boundary and exit; --resume_dir continues the interrupted epoch "
        "exactly (train/preempt.py).",
    )
    tpu_args.add_argument(
        "--fold_tasks",
        action="store_true",
        help="MTAN: run the T per-task attention streams as one vmapped "
        "call per level (params stacked on a leading task axis; "
        "fold_task_variables converts unfolded checkpoints). Perf "
        "experiment — see docs/BENCH_NOTES.md for measurements.",
    )
    tpu_args.add_argument(
        "--torch_bn_var",
        action="store_true",
        help="BatchNorm running-var updates use torch's unbiased (N/(N-1)) "
        "estimator instead of flax's biased one — exact-torch eval-mode "
        "activations (docs/QUIRKS.md #11). Checkpoints are compatible "
        "either way.",
    )
    tpu_args.add_argument(
        "--grad_accum_steps",
        type=int,
        default=1,
        help="Microbatches per optimizer step (in-step lax.scan; batch_size "
        "must be divisible). Ghost-BN semantics per microbatch.",
    )

    args, _ = parser.parse_known_args(argv)
    return args


def update_args(
    args: argparse.Namespace, kv_map: t.Dict[str, t.Any]
) -> argparse.Namespace:
    """Update existing keys in args with new values
    (reference utils/utils.py:70-77)."""
    for k, v in kv_map.items():
        assert hasattr(args, k), k
        setattr(args, k, v)
    return args


def select_backend(device: str) -> None:
    """Honor a ``--device`` flag (reference utils/utils.py:19 selects
    cuda/cpu; here it selects the jax platform). ``cpu[:N]`` forces the host
    backend with N virtual devices (default 1) — needed because a site hook
    may pin a remote-TPU platform at startup, so env vars alone are ignored.
    Anything else keeps the default backend (tpu when attached).

    Shared by the training CLI and the eval harness. jax is imported lazily
    so this module stays import-time jax-free (training.main must parse args
    before the pod rendezvous touches the backend)."""
    if not device or not device.startswith("cpu"):
        return  # default backend (tpu if attached)
    n = 1
    if ":" in device:
        spec = device.split(":", 1)[1]
        if not spec.isdigit() or int(spec) < 1:
            raise SystemExit(
                f"--device {device!r}: expected 'cpu' or 'cpu:N' with N >= 1"
            )
        n = int(spec)
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_platforms", "cpu")
