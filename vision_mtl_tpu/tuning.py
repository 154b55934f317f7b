"""Hyperparameter search over the two loss weights.

Mirrors the reference optuna study (hyperparam_tuning.py:20-86): maximize
mean validation accuracy over ``loss_segm_weight``/``loss_depth_weight`` in
[0,1], 3-epoch trials, median pruning (optuna's MedianPruner — like the
reference, it is configured but never fed intermediate reports, so trials
run to completion). Without optuna, a built-in seeded uniform-random sweep
(every trial runs all epochs) keeps the capability in zero-dep environments.
"""

from __future__ import annotations

import argparse
import copy
import typing as t

import numpy as np

from vision_mtl_tpu.cfg import DataConfig
from vision_mtl_tpu.pipeline import create_main_components, create_tools
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.utils.args import update_args

PARAM_KEYS = ("loss_segm_weight", "loss_depth_weight")


def _effective_n_jobs(args: argparse.Namespace) -> int:
    """Thread-parallel trial count (reference hyperparam_tuning.py:64). On a
    TPU backend trials are serialized regardless of the flag: they share one
    device queue, so concurrency only pollutes step timings and HBM
    (CLAUDE.md); on CPU backends n_jobs runs real threads."""
    n_jobs = getattr(args, "n_jobs", 1) or 1
    import jax

    if jax.default_backend() != "cpu" and n_jobs != 1:
        print(
            f"n_jobs={n_jobs} ignored on {jax.default_backend()}: "
            "trials share one device queue; running serially"
        )
        return 1
    return n_jobs


def _run_trial(
    args: argparse.Namespace,
    data_cfg: DataConfig,
    loss_weights: t.Dict[str, float],
    mesh: t.Any,
    tag: str,
) -> float:
    """One training trial; returns mean val accuracy
    (reference optuna_objective, hyperparam_tuning.py:20-51)."""
    args = copy.deepcopy(args)
    args = update_args(args, dict(loss_weights))
    components = create_main_components(args, data_cfg)
    tools = create_tools(args)
    exp, logger = tools["exp"], tools["logger"]
    if exp:
        exp.add_tags([tag])
    _, fit_metrics = run_pipe(
        args,
        components["model"],
        components["state"],
        components["datamodule"],
        num_epochs=args.num_epochs,
        num_classes=data_cfg.num_classes,
        mesh=mesh,
        exp=exp,
        logger=logger,
    )
    if exp:
        exp.end()
    logger.close()
    vals = fit_metrics["val"].get("val/accuracy", [0.0])
    return float(np.mean(vals))


def run_study(
    args: argparse.Namespace,
    data_cfg: DataConfig,
    mesh: t.Any = None,
    trial_epochs: int = 3,
) -> t.Dict[str, float]:
    """Returns the best {loss_segm_weight, loss_depth_weight}
    (reference run_study, hyperparam_tuning.py:54-86)."""
    args = copy.deepcopy(args)
    args.num_epochs = trial_epochs

    # the ImportError guard covers ONLY the import — an ImportError raised
    # inside a trial (e.g. a missing optional dep in the model path) must
    # propagate, not silently discard completed optuna trials and rerun
    # everything through the fallback
    try:
        import optuna
    except ImportError:
        optuna = None

    if optuna is not None:
        pruner = optuna.pruners.MedianPruner()
        study = optuna.create_study(direction="maximize", pruner=pruner)

        def objective(trial: "optuna.Trial") -> float:
            weights = {
                k: trial.suggest_float(k, 0.0, 1.0) for k in PARAM_KEYS
            }
            return _run_trial(
                args, data_cfg, weights, mesh, f"trial_{trial.number}"
            )

        # thread-parallel trials (reference hyperparam_tuning.py:64)
        study.optimize(
            objective, n_trials=args.n_trials, n_jobs=_effective_n_jobs(args)
        )
        print("Best trial:", study.best_trial.value, study.best_trial.params)
        return dict(study.best_trial.params)

    # built-in fallback: seeded uniform-random sweep. Honors --n_jobs with
    # a thread pool on CPU (same semantics as optuna's n_jobs, reference
    # hyperparam_tuning.py:64); serialized on TPU — shared device queue
    # (CLAUDE.md).
    rng = np.random.default_rng(getattr(args, "seed", 11))
    all_weights = [
        {k: float(rng.uniform(0.0, 1.0)) for k in PARAM_KEYS}
        for _ in range(args.n_trials)
    ]
    n_jobs = _effective_n_jobs(args)

    def trial(i: int) -> t.Tuple[float, t.Dict[str, float]]:
        score = _run_trial(args, data_cfg, all_weights[i], mesh, f"trial_{i}")
        print(f"trial {i}: {all_weights[i]} -> {score:.4f}")
        return score, all_weights[i]

    if n_jobs > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            results = list(pool.map(trial, range(args.n_trials)))
    else:
        results = [trial(i) for i in range(args.n_trials)]
    best_score, best_weights = max(results, key=lambda r: r[0])
    print(f"Best trial: {best_score:.4f} {best_weights}")
    return best_weights
