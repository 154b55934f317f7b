"""Comet artifact download side — trained-run registry + checkpoint/args
retrieval (reference utils/comet_utils.py:9-130). Used by the eval harness
to pull trained models by run name. Requires comet_ml + credentials; every
entry point raises a clear error otherwise (zero-egress container).

The run-name registry maps our framework's trained runs; it starts empty and
is filled as runs are published (the reference ships its 10 torch run names,
which are not loadable into this framework).
"""

from __future__ import annotations

import os
import re
import typing as t

from vision_mtl_tpu.cfg import cfg

# model key -> dataset -> comet experiment name (reference
# comet_utils.py:9-30; empty until runs of THIS framework are published)
model_to_exp_name: t.Dict[str, t.Dict[str, str]] = {}


def _api():
    try:
        from comet_ml.api import API
    except ImportError as e:
        raise RuntimeError(
            "comet_ml is not installed; artifact download unavailable"
        ) from e
    if cfg.logger.api_key is None:
        raise RuntimeError("comet credentials missing (.env)")
    return API(api_key=cfg.logger.api_key)


def get_latest_ckpt_epoch(
    exp_name: str,
    model_name_regex: str = r"model_(\d+)",
    project_name: t.Optional[str] = None,
    api: t.Any = None,
) -> int:
    """Latest checkpoint epoch advertised by an experiment's assets
    (reference comet_utils.py:33-47)."""
    api = api or _api()
    project_name = project_name or cfg.logger.project_name
    exp_api = api.get(f"{cfg.logger.username}/{project_name}/{exp_name}")
    epochs = [
        int(m.group(1))
        for x in exp_api.get_asset_list(asset_type="all")
        if (m := re.match(model_name_regex, x["fileName"]))
    ]
    if not epochs:
        raise ValueError(f"No checkpoints found in {exp_name}")
    return max(epochs)


def load_artifacts_from_comet(
    exp_name: str,
    local_artifacts_dir: str,
    model_artifact_name: str = "model",
    args_name_no_ext: str = "train_args",
    session_artifact_name: t.Optional[str] = None,
    project_name: t.Optional[str] = None,
    api: t.Any = None,
    epoch: t.Optional[int] = None,
) -> t.Dict[str, t.Optional[str]]:
    """Download model/args/session artifacts for an experiment into
    local_artifacts_dir (reference comet_utils.py:50-130). Returns local
    paths {"checkpoint_path", "args_path"[, "session_path"]}."""
    api = api or _api()
    project_name = project_name or cfg.logger.project_name
    exp_api = api.get(f"{cfg.logger.username}/{project_name}/{exp_name}")
    os.makedirs(local_artifacts_dir, exist_ok=True)
    assets = exp_api.get_asset_list(asset_type="all")

    def fetch(match: str, dst: str) -> t.Optional[str]:
        if os.path.exists(dst):
            return dst
        hits = [x for x in assets if match in x["fileName"]]
        if not hits:
            print(f"No asset found matching {match}")
            return None
        api.download_experiment_asset(exp_api.id, hits[0]["assetId"], dst)
        return dst

    def fetch_ckpt_dir(prefix: str, dst_dir: str) -> t.Optional[str]:
        """Download a multi-file Orbax checkpoint directory. Assets were
        logged per file as ``{prefix}/<relpath>``; the match is anchored at
        a path boundary so e.g. ``model_5`` never hits ``model_50/...``,
        and every file lands at its original relative path (a flat
        single-file download would not be restorable)."""
        if os.path.exists(dst_dir):
            return dst_dir
        pat = re.compile(rf"{re.escape(prefix)}(/|$)")
        hits = [x for x in assets if pat.match(x["fileName"])]
        if not hits:
            print(f"No asset found matching {prefix}")
            return None
        multi = any(x["fileName"] != prefix for x in hits)
        for x in hits:
            rel = x["fileName"]
            rel = rel[len(prefix) :].lstrip("/")
            if not rel and multi:
                # an asset named exactly like the prefix ALONGSIDE
                # prefix/<file> siblings: writing a FILE at dst_dir would
                # shadow the directory those siblings populate
                print(f"Skipping asset {x['fileName']!r}: names the "
                      f"checkpoint dir itself, not a file within it")
                continue
            # asset names are remote-controlled: refuse '..' traversal out
            # of dst_dir (absolute paths are already neutralized — the
            # lstrip('/') above makes every rel relative)
            if rel and os.path.normpath(rel).split(os.sep)[0] == "..":
                print(f"Skipping asset {x['fileName']!r}: path escapes "
                      f"the artifacts dir")
                continue
            # rel=='' with no siblings = a legacy flat single-file
            # checkpoint; it downloads to dst_dir itself
            dst = os.path.join(dst_dir, rel) if rel else dst_dir
            # dst's parent must exist ('.' covers a bare relative dst_dir
            # in the legacy flat single-file case, where dst == dst_dir)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            api.download_experiment_asset(exp_api.id, x["assetId"], dst)
        return dst_dir

    args_path = fetch(
        args_name_no_ext,
        os.path.join(local_artifacts_dir, f"{args_name_no_ext}.yaml"),
    )
    if epoch is None:
        epoch = get_latest_ckpt_epoch(
            exp_name, project_name=project_name, api=api
        )
    ckpt_path = fetch_ckpt_dir(
        f"{model_artifact_name}_{epoch}",
        os.path.join(local_artifacts_dir, f"{model_artifact_name}_{epoch}"),
    )
    results: t.Dict[str, t.Optional[str]] = {
        "checkpoint_path": ckpt_path,
        "args_path": args_path,
    }
    if session_artifact_name is not None:
        results["session_path"] = fetch_ckpt_dir(
            session_artifact_name,
            os.path.join(local_artifacts_dir, session_artifact_name),
        )
    return results


# ---------------------------------------------------------------------------
# Local trained-run registry
#
# The reference ships a hardcoded table of its 10 published comet runs
# (comet_utils.py:9-30) that get_model_metrics.ipynb iterates to build the
# README results tables. This framework's runs live on the local/shared
# filesystem, so the equivalent registry is a JSON file under the run-dir
# root, POPULATED AUTOMATICALLY at the end of every successful training run
# (training.main) and consumed by the eval harness
# (``python -m vision_mtl_tpu.eval_harness --from_registry``). Newest run
# per (key, dataset) wins, exactly like the reference updating its table by
# hand after a better run.
# ---------------------------------------------------------------------------


def registry_path() -> str:
    """Default registry location: ``{log_root}/run_registry.json`` — the
    shared run-dir root, so every jax.distributed process (and any later
    eval job on the same filesystem) resolves the same file."""
    return os.path.join(str(cfg.log_root_dir), "run_registry.json")


def run_registry_key(args: t.Any) -> str:
    """Registry key for a finished training run. ``--run_name`` wins when
    given; otherwise the model name plus the same qualifiers the reference's
    table distinguishes (comet_utils.py:9-30: ``basic_non_pretrained`` /
    ``basic`` (imagenet) / ``basic_tuned``): ``_pretrained`` for imagenet
    backbone weights, ``_tuned`` after a ``--do_optimize`` sweep."""
    if getattr(args, "run_name", None):
        return str(args.run_name)
    key = str(args.model_name)
    if getattr(args, "backbone_weights", None):
        key += "_pretrained"
    if getattr(args, "do_optimize", False):
        key += "_tuned"
    return key


def load_registry(path: t.Optional[str] = None) -> t.Dict[str, t.Any]:
    """{key: {dataset: {"model_name": ..., "run_dir": ...}}}; {} when the
    registry does not exist yet (no runs published)."""
    import json

    path = path or registry_path()
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a JSON object at top level")
    return data


def register_run(
    model_name: str,
    dataset_name: str,
    run_dir: str,
    key: t.Optional[str] = None,
    path: t.Optional[str] = None,
) -> str:
    """Record a trained run under ``key`` (default: the model name) for
    ``dataset_name``. The read-modify-write is serialized via an ``flock``
    on a ``.lock`` sibling (independent trainings sharing a log_root — the
    README-table workflow — may finish simultaneously; without the lock
    the loser's entry would silently vanish) and the write itself is
    atomic via tempfile + ``os.replace`` so a concurrent reader never
    sees a torn file. Returns the registry path.

    Call on ONE process only under jax.distributed (training.main gates on
    process 0)."""
    from vision_mtl_tpu.utils.io import atomic_write_json, file_lock

    path = path or registry_path()
    key = key or model_name
    with file_lock(path + ".lock"):
        data = load_registry(path)
        data.setdefault(key, {})[dataset_name] = {
            "model_name": model_name,
            "run_dir": os.path.abspath(run_dir),
        }
        atomic_write_json(path, data, indent=2, sort_keys=True)
    return path


def registered_runs(
    dataset_name: str, path: t.Optional[str] = None
) -> t.Dict[str, t.Dict[str, str]]:
    """{key: {"model_name", "run_dir"}} for one dataset, skipping (with a
    note) entries whose run dir has since been deleted."""
    out: t.Dict[str, t.Dict[str, str]] = {}
    for key, per_ds in sorted(load_registry(path).items()):
        entry = per_ds.get(dataset_name)
        if entry is None:
            continue
        if not os.path.isdir(entry["run_dir"]):
            print(
                f"registry: skipping {key!r} — run dir no longer exists: "
                f"{entry['run_dir']}"
            )
            continue
        out[key] = entry
    return out
