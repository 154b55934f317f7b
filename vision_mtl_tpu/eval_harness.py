"""Model evaluation harness — replaces the reference's
``notebooks/get_model_metrics.ipynb`` (the producer of the README results
tables): load trained checkpoints for any set of models, run the predict
sweep over the holdout loader, and emit a rounded metrics table (CSV +
stdout).

Usage:
    python -m vision_mtl_tpu.eval_harness --dataset_name cityscapes \
        --runs basic=/path/to/ckpt_dir mtan=/path/to/ckpt_dir2 \
        [--out metrics.csv]
    python -m vision_mtl_tpu.eval_harness --dataset_name cityscapes \
        --from_registry   # every run training.main auto-registered

Each ``--runs`` entry is ``{model_name}[:tag]={ckpt_dir}``; the ckpt_dir is
the run directory containing ``model_{epoch}`` artifacts (latest epoch is
selected, like the reference's regex pick, pipeline_utils.py:217-238).
``--from_registry`` instead iterates the local trained-run registry that
every finished training run publishes to (tracking/artifacts.py — the
reference notebook's hardcoded run table, comet_utils.py:9-30), exactly
how get_model_metrics.ipynb sweeps its 5 models per dataset.
``--device cpu[:N]`` forces the host backend with N virtual devices, same
as the training CLI (utils/args.select_backend).
"""

from __future__ import annotations

import argparse
import typing as t

import pandas as pd

from vision_mtl_tpu.cfg import fetch_data_cfg
from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.pipeline import init_model
from vision_mtl_tpu.predict import predict
from vision_mtl_tpu.train.checkpoint import restore_state

METRIC_ORDER = ["loss", "accuracy", "jaccard_index", "fbeta_score", "mae"]


def _load_run_args(ckpt_dir: str) -> t.Dict[str, t.Any]:
    import os

    from vision_mtl_tpu.train.checkpoint import load_args

    path = os.path.join(ckpt_dir, "train_args.yaml")
    if not os.path.exists(path):
        return {}
    return vars(load_args(path))


def load_run_model(
    model_name: str,
    ckpt_dir: str,
    dataset_name: str,
    batch_size: int = 8,
    channel_wise_stitching: bool = False,
    precision: t.Optional[str] = None,
) -> t.Tuple[t.Any, t.Any, t.Any, t.Dict[str, t.Any]]:
    """Reconstruct the architecture a run dir was trained with and restore
    its latest checkpoint. Returns ``(model, state, data_cfg, run_args)``.

    Defaults mirror the training CLI's (channel_wise_stitching is a
    store_true flag -> False; precision bf16) so a checkpoint dir without
    train_args.yaml still reconstructs the CLI-default architecture."""
    data_cfg = fetch_data_cfg(dataset_name)
    # model-config flags come from the run's own train_args.yaml when
    # present (the reference round-trips args the same way,
    # pipeline_utils.py:182-204) so a checkpoint always reloads into the
    # architecture — and compute precision — that produced it
    run_args = _load_run_args(ckpt_dir)
    if not run_args and model_name == "csnet":
        # round-2 flipped this default True->False to match the training
        # CLI; a legacy/hand-made run dir without train_args.yaml that was
        # trained channel-wise would mis-restore silently (docs/QUIRKS.md)
        print(
            f"WARNING: {ckpt_dir} has no train_args.yaml; assuming "
            f"channel_wise_stitching={channel_wise_stitching}. Pass the "
            f"flag explicitly if the checkpoint was trained otherwise."
        )
    channel_wise_stitching = run_args.get(
        "channel_wise_stitching", channel_wise_stitching
    )
    precision = precision or run_args.get("precision", "bf16")
    args = argparse.Namespace(
        model_name=model_name,
        dataset_name=dataset_name,
        batch_size=batch_size,
        lr=1e-3,
        ckpt_dir=None,
        channel_wise_stitching=channel_wise_stitching,
        fold_tail=run_args.get("fold_tail", False),
        remat_tail=run_args.get("remat_tail", 0),
        # param-tree-shaping flag: a --fold_tasks run stacks attention
        # params under *_folded, so restoring unfolded would fail
        fold_tasks=run_args.get("fold_tasks", False),
        # inert in eval mode but keeps build_model's process-global BN
        # switch deterministic per run (models/registry.py)
        torch_bn_var=run_args.get("torch_bn_var", False),
        remat_encoder=run_args.get("remat_encoder", False),
        remat_attention=run_args.get("remat_attention", False),
        remat_shared=run_args.get("remat_shared", False),
        precision=precision,
        seed=11,
    )
    model, state = init_model(args, data_cfg)
    state = restore_state(state, ckpt_dir)
    return model, state, data_cfg, run_args


def evaluate_run(
    model_name: str,
    ckpt_dir: str,
    dataset_name: str,
    batch_size: int = 8,
    loss_segm_weight: float = 1.0,
    loss_depth_weight: float = 1.0,
    channel_wise_stitching: bool = False,
    precision: t.Optional[str] = None,
) -> t.Dict[str, float]:
    model, state, data_cfg, run_args = load_run_model(
        model_name,
        ckpt_dir,
        dataset_name,
        batch_size=batch_size,
        channel_wise_stitching=channel_wise_stitching,
        precision=precision,
    )
    loss_segm_weight = run_args.get("loss_segm_weight", loss_segm_weight)
    loss_depth_weight = run_args.get("loss_depth_weight", loss_depth_weight)
    dm = MTLDataModule(
        dataset_name,
        batch_size=batch_size,
        num_workers=data_cfg.num_workers,
        train_transform=data_cfg.train_transform,
        test_transform=data_cfg.test_transform,
    )
    dm.setup(stage="predict")
    _, metrics = predict(
        dm.predict_dataloader(),
        model,
        state,
        num_classes=data_cfg.num_classes,
        loss_segm_weight=loss_segm_weight,
        loss_depth_weight=loss_depth_weight,
    )
    return {k.replace("predict/", ""): v for k, v in metrics.items()}


def build_table(results: t.Dict[str, t.Dict[str, float]]) -> pd.DataFrame:
    """Rows = metrics, columns = model tags (reference notebook's table
    orientation, rounded to 3 decimals)."""
    df = pd.DataFrame(results)
    df = df.reindex(METRIC_ORDER)
    return df.round(3)


#: The reference's published validation tables — the quality north star
#: (reference README.md:249-255 / :270-276; produced by its
#: get_model_metrics.ipynb). Keys: (dataset, baseline column).
REFERENCE_BASELINES: t.Dict[str, t.Dict[str, t.Dict[str, float]]] = {
    "cityscapes": {
        "HS": {"loss": 4.537, "accuracy": 0.805, "jaccard_index": 0.279,
               "fbeta_score": 0.795, "mae": 0.043},
        "HS (P)": {"loss": 3.395, "accuracy": 0.856, "jaccard_index": 0.358,
                   "fbeta_score": 0.851, "mae": 0.045},
        "HS tuned": {"loss": 4.455, "accuracy": 0.783, "jaccard_index": 0.248,
                     "fbeta_score": 0.770, "mae": 0.041},
        "CSNet": {"loss": 5.912, "accuracy": 0.753, "jaccard_index": 0.222,
                  "fbeta_score": 0.731, "mae": 0.057},
        "MTAN": {"loss": 3.633, "accuracy": 0.860, "jaccard_index": 0.385,
                 "fbeta_score": 0.856, "mae": 0.060},
    },
    "nyuv2": {
        "HS": {"loss": 4.893, "accuracy": 0.511, "jaccard_index": 0.226,
               "fbeta_score": 0.501, "mae": 0.049},
        "HS (P)": {"loss": 4.904, "accuracy": 0.508, "jaccard_index": 0.222,
                   "fbeta_score": 0.496, "mae": 0.050},
        "HS tuned": {"loss": 6.048, "accuracy": 0.329, "jaccard_index": 0.109,
                     "fbeta_score": 0.307, "mae": 0.079},
        "CSNet": {"loss": 5.978, "accuracy": 0.411, "jaccard_index": 0.136,
                  "fbeta_score": 0.366, "mae": 0.083},
        "MTAN": {"loss": 5.759, "accuracy": 0.501, "jaccard_index": 0.223,
                 "fbeta_score": 0.483, "mae": 0.073},
    },
}

#: model_name -> reference baseline column; tags containing "P"/"tuned"
#: refine basic to the matching HS variant (see _baseline_column)
_MODEL_TO_BASELINE = {"basic": "HS", "csnet": "CSNet", "mtan": "MTAN"}


def _baseline_column(model_name: str, tag: str) -> t.Optional[str]:
    col = _MODEL_TO_BASELINE.get(model_name)
    if col == "HS":
        low = tag.lower()
        if "tuned" in low or "best_trial" in low:
            return "HS tuned"
        if "(p)" in low or low.endswith("_p") or "pretrained" in low:
            return "HS (P)"
    return col


def compare_to_baseline(
    df: pd.DataFrame,
    dataset_name: str,
    tag_to_model: t.Dict[str, str],
) -> t.Optional[pd.DataFrame]:
    """Delta table vs the reference README numbers: ours - reference per
    metric (negative loss/mae deltas and positive accuracy/jaccard/fbeta
    deltas are improvements). Returns None when the dataset has no
    published table."""
    base = REFERENCE_BASELINES.get(dataset_name)
    if not base:
        return None
    deltas: t.Dict[str, t.Dict[str, float]] = {}
    for tag in df.columns:
        col = _baseline_column(tag_to_model.get(tag, tag), tag)
        if col is None or col not in base:
            continue
        deltas[f"{tag} vs {col}"] = {
            m: float(df.loc[m, tag]) - ref
            for m, ref in base[col].items()
            if m in df.index and pd.notna(df.loc[m, tag])
        }
    if not deltas:
        return None
    out = pd.DataFrame(deltas).reindex(METRIC_ORDER)
    return out.round(3)


def main(argv: t.Optional[t.Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", default="cityscapes")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument(
        "--device",
        default="tpu",
        help="'tpu' (default backend) or 'cpu[:N]' to force the host "
        "backend with N virtual devices — same flag as the training CLI.",
    )
    p.add_argument(
        "--runs",
        nargs="+",
        default=None,
        help="entries like model_name[:tag]=ckpt_dir",
    )
    p.add_argument(
        "--from_registry",
        action="store_true",
        help="evaluate every registered run for --dataset_name (the local "
        "registry training runs publish to; tracking/artifacts.py)",
    )
    p.add_argument(
        "--registry",
        default=None,
        help="registry file override (default: {log_root}/run_registry.json)",
    )
    p.add_argument("--out", default=None, help="CSV output path")
    p.add_argument(
        "--compare_baseline",
        action="store_true",
        help="also print deltas vs the reference README validation tables "
        "(README.md:249-255/:270-276) — meaningful only when evaluating "
        "on the REAL Cityscapes/NYUv2 data, not synthetic trees",
    )
    args = p.parse_args(argv)
    if bool(args.runs) == bool(args.from_registry):
        raise SystemExit("pass exactly one of --runs / --from_registry")
    from vision_mtl_tpu.utils.args import select_backend

    select_backend(args.device)

    todo: t.List[t.Tuple[str, str, str]] = []  # (tag, model_name, ckpt_dir)
    if args.from_registry:
        from vision_mtl_tpu.tracking.artifacts import registered_runs

        entries = registered_runs(args.dataset_name, path=args.registry)
        if not entries:
            raise SystemExit(
                f"no registered runs for dataset {args.dataset_name!r} — "
                f"train something first (training.main registers runs on "
                f"completion) or pass --runs explicitly."
            )
        todo = [
            (tag, e["model_name"], e["run_dir"])
            for tag, e in entries.items()
        ]
    else:
        for entry in args.runs:
            spec, _, ckpt_dir = entry.partition("=")
            model_name, _, tag = spec.partition(":")
            todo.append((tag or model_name, model_name, ckpt_dir))

    results: t.Dict[str, t.Dict[str, float]] = {}
    for tag, model_name, ckpt_dir in todo:
        if tag in results:
            raise SystemExit(
                f"duplicate tag {tag!r} in --runs — give each run a unique "
                f"tag (model_name:tag=dir), or the first result is lost."
            )
        print(f"Evaluating {tag} ({model_name}) from {ckpt_dir} ...")
        results[tag] = evaluate_run(
            model_name, ckpt_dir, args.dataset_name, args.batch_size
        )

    df = build_table(results)
    print(df.to_string())
    if args.compare_baseline:
        cmp = compare_to_baseline(
            df, args.dataset_name, {tag: m for tag, m, _ in todo}
        )
        if cmp is None:
            print("(no reference baseline table for this dataset)")
        else:
            print(
                "\ndelta vs reference README (ours - reference; loss/mae "
                "negative = better, others positive = better):"
            )
            print(cmp.to_string())
    if args.out:
        df.to_csv(args.out)
        print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
