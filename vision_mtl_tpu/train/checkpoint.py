"""Checkpoint / resume — Orbax-backed, reference-compatible naming.

Reproduces the reference's dual-artifact scheme (utils/pipeline_utils.py:
139-167, 207-244): per save epoch a ``model_{epoch}`` artifact (params +
batch_stats) and a ``session_{epoch}`` artifact (optimizer state + lr +
scheduler + epoch); latest-epoch selection by regex on restore; CLI args
round-tripped through ``train_args.yaml`` so any checkpoint is reproducible
(reference :182-204). Artifacts are Orbax directories rather than ``.pt``
files (async-save capable, multi-host safe).
"""

from __future__ import annotations

import argparse
import os
import re
import typing as t

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml

from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
from vision_mtl_tpu.train.state import TrainState, get_lr


_shared_checkpointer: t.Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    # shared instance so async saves can be awaited across calls
    global _shared_checkpointer
    if _shared_checkpointer is None:
        _shared_checkpointer = ocp.StandardCheckpointer()
    return _shared_checkpointer


def wait_for_saves() -> None:
    """Block until in-flight async checkpoint writes land."""
    if _shared_checkpointer is not None:
        _shared_checkpointer.wait_until_finished()


def to_host(tree: t.Any) -> t.Any:
    """``jax.device_get`` that also handles PROCESS-SPANNING shardings.
    Under ANY multi-process mesh even fully-replicated state reports
    ``is_fully_addressable=False`` (the sharding names remote devices), so
    the common dp/replicated leaves take a local-copy fast path — this
    process already holds a complete shard; one jitted allgather per leaf
    per save would be pure dispatch overhead (~740 leaves for the trained
    configs). Only genuinely partitioned state (multi-process tensor
    parallelism) pays the tiled ``process_allgather`` — a collective,
    every process must call."""

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree.map(get, tree)


def _model_tree(state: TrainState) -> t.Dict[str, t.Any]:
    return {
        "params": to_host(state.params),
        "batch_stats": to_host(state.batch_stats),
    }


def _session_tree(
    state: TrainState, scheduler: ReduceLROnPlateau, epoch: int
) -> t.Dict[str, t.Any]:
    return {
        "opt_state": to_host(state.opt_state),
        "lr": np.float32(get_lr(state)),
        "scheduler": scheduler.state_dict(),
        "epoch": epoch,
        "step": int(state.step),
    }


def _cast_into(target: t.Any, restored: t.Any, what: str) -> t.Any:
    """Map restored leaves onto ``target``'s dtypes, shape-checked."""

    def cast(tgt, src):
        src = np.asarray(src)
        if tgt.shape != src.shape:
            raise ValueError(
                f"{what} shape mismatch: {src.shape} vs {tgt.shape} — "
                f"wrong model config or dataset for this checkpoint?"
            )
        return src.astype(tgt.dtype)

    return jax.tree.map(cast, target, restored)


def save_ckpt(
    state: TrainState,
    scheduler: ReduceLROnPlateau,
    epoch: int,
    save_dir: str,
    exp: t.Any = None,
    block: bool = True,
) -> t.Tuple[str, str]:
    """Write model_{epoch} and session_{epoch} artifacts; log to exp if
    given (reference save_ckpt, pipeline_utils.py:139-167).

    ``block=False`` lets Orbax write in the background (training overlaps
    the save); callers must ``wait_for_saves()`` before reading the
    artifacts or exiting."""
    os.makedirs(save_dir, exist_ok=True)
    model_path = os.path.abspath(os.path.join(save_dir, f"model_{epoch}"))
    session_path = os.path.abspath(os.path.join(save_dir, f"session_{epoch}"))
    ckptr = _checkpointer()
    model_tree = _model_tree(state)
    session_tree = _session_tree(state, scheduler, epoch)
    ckptr.save(model_path, model_tree, force=True)
    ckptr.save(session_path, session_tree, force=True)
    if block or exp:
        # an async Orbax save finalizes (renames the tmp dir) in a
        # background thread — the upload must not race it, so a Comet
        # upload forces the wait even when the caller asked for async
        ckptr.wait_until_finished()
    if exp:
        from vision_mtl_tpu.tracking.comet import log_ckpt_to_exp

        log_ckpt_to_exp(exp, model_path)
        log_ckpt_to_exp(exp, session_path)
    print(f"Saved model to {model_path}")
    return model_path, session_path


def _epochs(ckpt_dir: str, prefix: str) -> t.List[int]:
    pattern = re.compile(rf"{prefix}_(\d+)$")
    return [
        int(m.group(1))
        for f in os.listdir(ckpt_dir)
        if (m := pattern.match(f))
    ]


def _latest_epoch(ckpt_dir: str, prefix: str) -> int:
    epochs = _epochs(ckpt_dir, prefix)
    if not epochs:
        raise ValueError(f"No {prefix} ckpt found in {ckpt_dir}")
    return max(epochs)


def _latest_common_epoch(ckpt_dir: str) -> int:
    """Latest epoch for which BOTH model and session artifacts exist — a
    crash between the two async saves can leave model_N without session_N;
    resuming from mismatched epochs would silently pair epoch-N weights
    with older optimizer/scheduler state."""
    common = set(_epochs(ckpt_dir, "model")) & set(_epochs(ckpt_dir, "session"))
    if not common:
        raise ValueError(
            f"No epoch with both model_* and session_* artifacts in "
            f"{ckpt_dir} — cannot exact-resume (use --ckpt_dir for a "
            f"weights-only warm start)."
        )
    return max(common)


def load_ckpt_model(
    ckpt_dir: str, epoch: t.Optional[int] = None
) -> t.Dict[str, t.Any]:
    """Load the (latest-epoch by default) model artifact
    (reference load_ckpt_model, pipeline_utils.py:217-238)."""
    wait_for_saves()
    if epoch is None:
        epoch = _latest_epoch(ckpt_dir, "model")
    path = os.path.abspath(os.path.join(ckpt_dir, f"model_{epoch}"))
    print(f"Loading model from {path}")
    return _checkpointer().restore(path)


def load_ckpt(
    ckpt_dir: str, epoch: t.Optional[int] = None
) -> t.Tuple[t.Dict[str, t.Any], t.Dict[str, t.Any]]:
    """(session, model) checkpoint pair (reference load_ckpt,
    pipeline_utils.py:207-214)."""
    return load_ckpt_session(ckpt_dir, epoch), load_ckpt_model(ckpt_dir, epoch)


def load_ckpt_session(
    ckpt_dir: str, epoch: t.Optional[int] = None, target: t.Any = None
) -> t.Dict[str, t.Any]:
    """Load a session artifact; ``target`` (an abstract pytree) restores
    structured leaves like the optimizer-state namedtuples exactly."""
    wait_for_saves()
    if epoch is None:
        epoch = _latest_epoch(ckpt_dir, "session")
    path = os.path.abspath(os.path.join(ckpt_dir, f"session_{epoch}"))
    if target is None:
        return _checkpointer().restore(path)
    return _checkpointer().restore(path, target)


def _maybe_reference_torch_ckpt(
    ckpt_dir: str, epoch: t.Optional[int]
) -> t.Optional[str]:
    """Path to a reference-format torch ``model_{e}.pt`` when ``ckpt_dir``
    holds one (and no Orbax artifacts, which always win), else None. Accepts
    a direct ``*.pt`` file path too — so ``--ckpt_dir`` and the eval harness
    consume reference-trained run dirs as-is (docs/MIGRATION.md)."""
    from vision_mtl_tpu.utils.ckpt_import import find_reference_checkpoint

    if os.path.isfile(ckpt_dir) and ckpt_dir.endswith(".pt"):
        return ckpt_dir
    if not os.path.isdir(ckpt_dir) or _epochs(ckpt_dir, "model"):
        return None
    if epoch is not None:
        path = os.path.join(ckpt_dir, f"model_{epoch}.pt")
        return path if os.path.isfile(path) else None
    return find_reference_checkpoint(ckpt_dir)


def restore_state(
    state: TrainState, ckpt_dir: str, epoch: t.Optional[int] = None
) -> TrainState:
    """Warm-start params/batch_stats into an existing state
    (reference init_model --ckpt_dir path, pipeline_utils.py:28-29).

    Also accepts the REFERENCE's own torch checkpoints (``model_{e}.pt``
    state_dicts): when the dir holds those instead of Orbax artifacts, the
    full-checkpoint importer (utils/ckpt_import.py) converts them exactly —
    a reference user's trained runs stay usable after migrating."""
    ref_pt = _maybe_reference_torch_ckpt(ckpt_dir, epoch)
    if ref_pt is not None:
        from vision_mtl_tpu.utils.ckpt_import import import_into_state
        from vision_mtl_tpu.utils.torch_port import load_state_dict_file

        print(f"Importing reference torch checkpoint {ref_pt}")
        return import_into_state(state, load_state_dict_file(ref_pt))
    restored = load_ckpt_model(ckpt_dir, epoch)
    params = _cast_into(
        jax.device_get(state.params), restored["params"], "checkpoint/model"
    )
    batch_stats = _cast_into(
        jax.device_get(state.batch_stats),
        restored["batch_stats"],
        "checkpoint/model",
    )
    return state.replace(params=params, batch_stats=batch_stats)


def restore_session(
    state: TrainState,
    scheduler: ReduceLROnPlateau,
    ckpt_dir: str,
    epoch: t.Optional[int] = None,
) -> t.Tuple[TrainState, ReduceLROnPlateau, int]:
    """Full resume: params/batch_stats + optimizer moments + lr + plateau
    scheduler + epoch counter. Returns (state, scheduler, start_epoch).

    The reference only warm-starts model weights (pipeline_utils.py:28-29);
    exact-resume is a production addition (dual artifacts already carry the
    session, reference save_ckpt:156-163).

    Also resumes from the REFERENCE's torch artifact pair
    (``model_{e}.pt`` + ``session_{e}.pt``): weights, Adam moments, lr,
    plateau state and epoch all import exactly (utils/ckpt_import.py), so a
    reference-trained run continues here mid-training."""
    ref_pt = _maybe_reference_torch_ckpt(ckpt_dir, epoch)
    if ref_pt is not None:
        from vision_mtl_tpu.utils.ckpt_import import (
            import_into_state,
            import_reference_session,
            load_reference_session,
        )
        from vision_mtl_tpu.utils.torch_port import load_state_dict_file

        base = os.path.basename(ref_pt)
        if not base.startswith("model_"):
            raise ValueError(
                f"{ref_pt} is a torch checkpoint, but a session sibling can "
                "only be inferred from the reference's model_{e}.pt naming — "
                "for a weights-only warm start use --ckpt_dir instead of "
                "--resume_dir."
            )
        sess_pt = os.path.join(
            os.path.dirname(ref_pt), base.replace("model_", "session_", 1)
        )
        if not os.path.isfile(sess_pt):
            raise ValueError(
                f"found reference torch checkpoint {ref_pt} but no matching "
                f"{os.path.basename(sess_pt)} — a full resume needs the "
                "session artifact (optimizer/scheduler/epoch). For a "
                "weights-only warm start use --ckpt_dir instead."
            )
        sd = load_state_dict_file(ref_pt)  # loaded ONCE for both steps
        state = import_into_state(state, sd)
        print(
            f"Imported reference torch checkpoint {ref_pt}; "
            f"importing session {sess_pt}"
        )
        return import_reference_session(
            sd, load_reference_session(sess_pt), state, scheduler
        )
    if epoch is None:
        wait_for_saves()
        epoch = _latest_common_epoch(ckpt_dir)
    state = restore_state(state, ckpt_dir, epoch)
    target = {
        "opt_state": jax.device_get(state.opt_state),
        "lr": np.zeros((), np.float32),
        "scheduler": scheduler.state_dict(),
        "epoch": 0,
        "step": 0,
    }
    session = load_ckpt_session(ckpt_dir, epoch, target=target)
    state = state.replace(
        opt_state=session["opt_state"], step=int(session.get("step", 0))
    )
    from vision_mtl_tpu.train.state import set_lr

    state = set_lr(state, float(session["lr"]))
    scheduler.load_state_dict(session["scheduler"])
    return state, scheduler, int(session["epoch"]) + 1


PREEMPT_MODEL = "preempt_model"
PREEMPT_SESSION = "preempt_session"
PREEMPT_META = "preempt_meta.json"


def save_preempt_ckpt(
    state: TrainState,
    scheduler: ReduceLROnPlateau,
    epoch: int,
    batch_in_epoch: int,
    train_mstate: t.Any,
    val_step: int,
    save_dir: str,
) -> t.Tuple[str, str]:
    """Mid-epoch checkpoint written on a preemption notice
    (train/preempt.py): the regular dual artifacts PLUS the in-progress
    epoch's position and metric accumulators, so ``--resume_dir`` continues
    the interrupted epoch exactly (same shuffle order, already-trained
    batches skipped, epoch-end train metrics identical). Collective under
    jax.distributed, like save_ckpt. Always blocks — the process is about
    to die, an async write would be lost."""
    from flax.serialization import to_state_dict

    os.makedirs(save_dir, exist_ok=True)
    model_path = os.path.abspath(os.path.join(save_dir, PREEMPT_MODEL))
    session_path = os.path.abspath(os.path.join(save_dir, PREEMPT_SESSION))
    ckptr = _checkpointer()
    # a prior preemption's artifact may exist; orbax force=True overwrites,
    # but wait for in-flight async epoch saves first so the directory state
    # is quiescent
    ckptr.wait_until_finished()
    ckptr.save(model_path, _model_tree(state), force=True)
    session_tree = _session_tree(state, scheduler, epoch)
    session_tree.update(
        batch_in_epoch=batch_in_epoch,
        val_step=int(val_step),
        train_metrics=to_state_dict(to_host(train_mstate)),
    )
    ckptr.save(session_path, session_tree, force=True)
    ckptr.wait_until_finished()
    # position sidecar: lets resolve_resume compare recency without a full
    # Orbax restore (orbax has no partial scalar reads without the tree)
    from vision_mtl_tpu.parallel.multihost import process_info_no_backend

    if process_info_no_backend()[0] == 0:
        from vision_mtl_tpu.utils.io import atomic_write_json

        # atomic + fsync'd: this runs inside the eviction grace window — a
        # SIGKILL (or power loss) between a truncating open and the flush
        # would leave a corrupt sidecar that poisons every subsequent
        # --auto_resume relaunch
        atomic_write_json(
            os.path.join(save_dir, PREEMPT_META),
            {"epoch": epoch, "batch_in_epoch": batch_in_epoch},
            fsync=True,
        )
    print(
        f"Preemption checkpoint saved to {model_path} "
        f"(epoch {epoch}, batch {batch_in_epoch})"
    )
    return model_path, session_path


def _has_preempt_ckpt(ckpt_dir: str) -> bool:
    return (
        os.path.isdir(os.path.join(ckpt_dir, PREEMPT_MODEL))
        and os.path.isdir(os.path.join(ckpt_dir, PREEMPT_SESSION))
        and os.path.exists(os.path.join(ckpt_dir, PREEMPT_META))
    )


def resolve_resume(ckpt_dir: str) -> str:
    """``"preempt"`` when the mid-epoch preemption artifact represents the
    LATEST training state in ``ckpt_dir``, else ``"epoch"``. A stale
    preemption artifact (superseded by later epoch saves after a successful
    resume) loses the (epoch, batch) lexicographic comparison."""
    import json

    wait_for_saves()
    if not _has_preempt_ckpt(ckpt_dir):
        return "epoch"
    try:
        with open(os.path.join(ckpt_dir, PREEMPT_META)) as f:
            meta = json.load(f)
        preempt_pos = (int(meta["epoch"]), int(meta["batch_in_epoch"]))
    except (ValueError, KeyError, TypeError, OSError) as e:
        # the sidecar is only a recency-comparison cache — the true resume
        # position lives in the Orbax session artifact. A truncated/corrupt
        # sidecar (pre-atomic-write build, tampering) must not turn every
        # relaunch into a crash loop: without epoch saves the preemption
        # artifact is the only state (restore_preempt reads its position
        # from Orbax, so it stays exact); with epoch saves fall back to
        # them (recency is undecidable — at worst the interrupted epoch's
        # mid-epoch progress is retrained from its boundary).
        try:
            _latest_common_epoch(ckpt_dir)
        except ValueError:
            choice = "preempt"
        else:
            choice = "epoch"
        print(
            f"WARNING: unreadable {PREEMPT_META} in {ckpt_dir} "
            f"({type(e).__name__}: {e}); resuming from the "
            f"{'preemption artifact' if choice == 'preempt' else 'epoch checkpoints'}."
        )
        return choice
    try:
        epoch_pos = (_latest_common_epoch(ckpt_dir) + 1, 0)
    except ValueError:
        return "preempt"
    return "preempt" if preempt_pos > epoch_pos else "epoch"


def restore_preempt(
    state: TrainState,
    scheduler: ReduceLROnPlateau,
    ckpt_dir: str,
    num_classes: int,
) -> t.Tuple[TrainState, ReduceLROnPlateau, int, int, t.Any, int]:
    """Restore a preemption checkpoint. Returns
    ``(state, scheduler, epoch, batch_in_epoch, train_mstate, val_step)``
    where ``epoch`` is the INTERRUPTED epoch to continue (not +1) and
    ``batch_in_epoch`` the number of its batches already trained."""
    from flax.serialization import from_state_dict, to_state_dict

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.train.state import set_lr

    wait_for_saves()
    model = _checkpointer().restore(
        os.path.abspath(os.path.join(ckpt_dir, PREEMPT_MODEL))
    )
    mstate0 = init_metrics(num_classes)
    target = {
        "opt_state": jax.device_get(state.opt_state),
        "lr": np.zeros((), np.float32),
        "scheduler": scheduler.state_dict(),
        "epoch": 0,
        "batch_in_epoch": 0,
        "step": 0,
        "val_step": 0,
        "train_metrics": to_state_dict(jax.device_get(mstate0)),
    }
    session = _checkpointer().restore(
        os.path.abspath(os.path.join(ckpt_dir, PREEMPT_SESSION)), target
    )

    state = state.replace(
        params=_cast_into(
            jax.device_get(state.params), model["params"], "preempt/model"
        ),
        batch_stats=_cast_into(
            jax.device_get(state.batch_stats),
            model["batch_stats"],
            "preempt/model",
        ),
        opt_state=session["opt_state"],
        step=int(session["step"]),
    )
    state = set_lr(state, float(session["lr"]))
    scheduler.load_state_dict(session["scheduler"])
    mstate = from_state_dict(mstate0, session["train_metrics"])
    return (
        state,
        scheduler,
        int(session["epoch"]),
        int(session["batch_in_epoch"]),
        mstate,
        int(session["val_step"]),
    )


def _is_resumable(d: str) -> bool:
    if _has_preempt_ckpt(d):
        return True
    try:
        _latest_common_epoch(d)
        return True
    except (ValueError, OSError):
        return False


def prune_old_ckpts(save_dir: str, keep_last_k: int) -> t.List[int]:
    """Delete all but the newest ``keep_last_k`` epoch checkpoint PAIRS
    (both ``model_{e}`` and ``session_{e}`` go together — never leave a
    mismatched pair for `_latest_common_epoch` to trip on). Returns the
    pruned epochs. Disk housekeeping for long runs (reference keeps every
    epoch; ``keep_last_k <= 0`` preserves that behavior). Preemption
    artifacts are never touched. Multi-process: only process 0 deletes
    (orbax wrote through process 0 on the shared filesystem); the call is
    NOT collective. An in-flight async save is always the newest epoch and
    therefore always kept."""
    if keep_last_k <= 0:
        return []
    from vision_mtl_tpu.parallel.multihost import process_info_no_backend

    if process_info_no_backend()[0] != 0:
        return []
    # never rmtree a directory orbax is still writing: with short epochs
    # two async saves can be in flight at once
    wait_for_saves()
    import shutil

    epochs = sorted(
        set(_epochs(save_dir, "model")) | set(_epochs(save_dir, "session"))
    )
    pruned = epochs[:-keep_last_k] if len(epochs) > keep_last_k else []
    for e in pruned:
        for prefix in ("model", "session"):
            path = os.path.join(save_dir, f"{prefix}_{e}")
            shutil.rmtree(path, ignore_errors=True)
    return pruned


def find_latest_resumable_run(base_dir: str) -> t.Optional[str]:
    """Most recently written run dir under ``base_dir`` holding a resumable
    checkpoint (a preemption artifact or a complete model/session epoch
    pair); None when there is nothing to resume. Backs ``--auto_resume``:
    spot-VM relaunch loops re-run the SAME command line, so the CLI must
    find the interrupted run itself (training.py).

    Scans ``base_dir/version_*`` AND one level deeper
    (``base_dir/{run_name}/version_*``) — with comet tracking enabled,
    create_tools nests run dirs under the per-run experiment name, which a
    relaunch cannot reconstruct. Recency is directory mtime (checkpoint
    writes update it), identical on every process of a shared-filesystem
    pod."""
    if not os.path.isdir(base_dir):
        return None
    pattern = re.compile(r"version_(\d+)$")
    candidates: t.List[str] = []
    for name in os.listdir(base_dir):
        d = os.path.join(base_dir, name)
        if not os.path.isdir(d):
            continue
        if pattern.match(name):
            candidates.append(d)
        else:  # run-name level (e.g. a comet experiment name)
            candidates.extend(
                os.path.join(d, sub)
                for sub in os.listdir(d)
                if pattern.match(sub)
                and os.path.isdir(os.path.join(d, sub))
            )
    resumable = [d for d in candidates if _is_resumable(d)]
    if not resumable:
        return None
    return max(resumable, key=os.path.getmtime)


def log_args(
    args: argparse.Namespace, save_path: str, exp: t.Any = None
) -> None:
    """Serialize CLI args to yaml (reference log_args,
    pipeline_utils.py:182-198)."""
    args_map = vars(args) if isinstance(args, argparse.Namespace) else args
    with open(save_path, "w") as f:
        yaml.dump({"args": args_map}, f, default_flow_style=False)
    if exp:
        exp.log_asset(save_path)


def load_args(load_path: str) -> argparse.Namespace:
    with open(load_path, "r") as f:
        args = yaml.load(f, Loader=yaml.FullLoader)["args"]
    return argparse.Namespace(**args)
