"""Hyperparameter search over the two loss weights.

Mirrors the reference optuna study (hyperparam_tuning.py:20-86): maximize
mean validation accuracy over ``loss_segm_weight``/``loss_depth_weight`` in
[0,1], 3-epoch trials, median pruning. Deliberate divergence from the
reference: its MedianPruner was configured but never fed intermediate
reports (hyperparam_tuning.py:57-64), so it never pruned — here trials
report per-epoch val accuracy through run_pipe's ``epoch_callback`` and a
below-median trial is stopped early (docs/QUIRKS.md #15). Without optuna,
a built-in seeded uniform-random sweep with the same median-pruning
semantics keeps the capability in zero-dep environments.
"""

from __future__ import annotations

import argparse
import copy
import threading
import typing as t

import numpy as np

from vision_mtl_tpu.cfg import DataConfig
from vision_mtl_tpu.pipeline import create_main_components, create_tools
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.utils.args import update_args

PARAM_KEYS = ("loss_segm_weight", "loss_depth_weight")


class TrialPruned(Exception):
    """Raised by a pruning epoch_callback to stop a trial early."""


class MedianPruner:
    """Median pruning for the zero-dep fallback sweep (optuna-equivalent
    semantics: a trial is pruned at its k-th validation report when its val
    accuracy is worse than the median of COMPLETED trials' k-th reports;
    pruning starts only after ``n_startup_trials`` trials completed and
    ``n_warmup_steps`` reports elapsed). Positions are REPORT ordinals, not
    absolute epochs — with --val_epoch_freq N the callback fires every N
    epochs, and ordinals keep completed histories and live reports aligned
    (all trials share one val_epoch_freq). Thread-safe — the sweep may run
    trials concurrently (--n_jobs)."""

    def __init__(self, n_startup_trials: int = 2, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps
        self._completed: t.List[t.List[float]] = []
        self._lock = threading.Lock()

    def report(self, ordinal: int, value: float) -> None:
        """Record the ``ordinal``-th intermediate value of a trial; raises
        TrialPruned when the trial should stop."""
        with self._lock:
            if (
                len(self._completed) < self.n_startup_trials
                or ordinal < self.n_warmup_steps
            ):
                return
            prior = [h[ordinal] for h in self._completed if len(h) > ordinal]
        if prior and value < float(np.median(prior)):
            raise TrialPruned(
                f"report {ordinal}: {value:.4f} < median "
                f"{float(np.median(prior)):.4f}"
            )

    def complete(self, history: t.Sequence[float]) -> None:
        with self._lock:
            self._completed.append(list(history))


def _effective_n_jobs(args: argparse.Namespace) -> int:
    """Thread-parallel trial count (reference hyperparam_tuning.py:64). On a
    TPU backend trials are serialized regardless of the flag: they share one
    device queue, so concurrency only pollutes step timings and HBM
    (CLAUDE.md); on CPU backends n_jobs runs real threads."""
    n_jobs = getattr(args, "n_jobs", 1) or 1
    import jax

    if jax.process_count() > 1 and n_jobs != 1:
        # SPMD requires every process to run identical device programs in
        # identical order; thread-parallel trials would also misalign the
        # cross-process MetricsLogger run-dir rendezvous (tracking/tb.py)
        print(
            f"n_jobs={n_jobs} ignored under jax.distributed "
            f"({jax.process_count()} processes): trials must run in "
            "lockstep; running serially"
        )
        return 1
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
    epoch_callback: t.Optional[t.Callable[[int, t.Dict[str, float]], None]] = None,
) -> float:
    """One training trial; returns mean val accuracy
    (reference optuna_objective, hyperparam_tuning.py:20-51).
    ``epoch_callback`` is threaded into run_pipe — a pruning callback raises
    to stop the trial; the exception propagates after teardown."""
    args = copy.deepcopy(args)
    args = update_args(args, dict(loss_weights))
    components = create_main_components(args, data_cfg)
    tools = create_tools(args, rendezvous_tag=tag)
    exp, logger = tools["exp"], tools["logger"]
    if exp:
        exp.add_tags([tag])
    try:
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
            epoch_callback=epoch_callback,
        )
    finally:
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
        # seeded sampler (the reference's study is unseeded): identical
        # suggestions are REQUIRED under jax.distributed — per-process
        # divergent loss weights would diverge the SPMD trajectories and
        # desynchronize pruning (collective-count mismatch = hang); it also
        # makes single-process sweeps reproducible, matching the seeded
        # fallback sweep below
        study = optuna.create_study(
            direction="maximize",
            pruner=pruner,
            sampler=optuna.samplers.TPESampler(
                seed=getattr(args, "seed", 11)
            ),
        )

        def objective(trial: "optuna.Trial") -> float:
            weights = {
                k: trial.suggest_float(k, 0.0, 1.0) for k in PARAM_KEYS
            }

            def cb(epoch: int, val_metrics: t.Dict[str, float]) -> None:
                # live pruning (deliberate fix of the reference's dead
                # pruner — module docstring / docs/QUIRKS.md #15)
                trial.report(float(val_metrics.get("accuracy", 0.0)), epoch)
                if trial.should_prune():
                    raise optuna.TrialPruned()

            return _run_trial(
                args,
                data_cfg,
                weights,
                mesh,
                f"trial_{trial.number}",
                epoch_callback=cb,
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
    pruner = MedianPruner()

    def trial(i: int) -> t.Tuple[float, t.Dict[str, float]]:
        history: t.List[float] = []

        def cb(epoch: int, val_metrics: t.Dict[str, float]) -> None:
            acc = float(val_metrics.get("accuracy", 0.0))
            history.append(acc)
            # report by ORDINAL (len-1), not absolute epoch: with
            # val_epoch_freq>1 the epoch index would never line up with the
            # positions completed histories store, silently disabling pruning
            pruner.report(len(history) - 1, acc)

        try:
            score = _run_trial(
                args, data_cfg, all_weights[i], mesh, f"trial_{i}",
                epoch_callback=cb,
            )
        except TrialPruned as e:
            # optuna semantics: best_trial only considers COMPLETE trials,
            # so a pruned trial can never win (n_startup_trials guarantees
            # at least that many completions exist)
            print(f"trial {i}: {all_weights[i]} pruned ({e})")
            return float("-inf"), all_weights[i]
        pruner.complete(history)
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
