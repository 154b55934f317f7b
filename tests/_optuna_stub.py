"""Faithful minimal optuna implementing exactly the surface tuning.py's
REAL optuna branch consumes (round-4 verdict: optuna is not installed in
this image, so that branch — TPESampler seeding, trial.report/should_prune
live pruning, study.optimize n_jobs — had never been interpreted).

Tests install this module into ``sys.modules["optuna"]`` so
``import optuna`` inside ``run_study`` succeeds and the real branch runs,
including a pruning-fires case (tests/test_optuna_branch.py).

Semantics mirror optuna 3.x for the consumed subset (optuna's own docs;
reference hyperparam_tuning.py:20-86 uses the same API):

* ``create_study(direction=..., pruner=..., sampler=...)``
* ``TPESampler(seed=N)`` — optuna's TPE falls back to seeded independent
  uniform sampling for its first ``n_startup_trials`` (default 10) trials;
  sweeps here are smaller than that, so seeded uniform IS the faithful
  behavior for this subset, not a simplification.
* ``trial.suggest_float(name, low, high)``, ``trial.number``
* ``trial.report(value, step)`` + ``trial.should_prune()`` with
  ``MedianPruner(n_startup_trials=5, n_warmup_steps=0)`` defaults: prune
  at step k iff >= n_startup_trials trials COMPLETED and the trial's value
  at k is strictly worse than the median of completed trials' step-k
  intermediate values (direction-aware).
* ``study.optimize(objective, n_trials=, n_jobs=)`` — thread-parallel
  trials; ``TrialPruned`` marks the trial PRUNED, any other exception
  fails the study (optuna's ``catch=()`` default).
* ``study.best_trial`` — best COMPLETE trial only (pruned/failed trials
  can never win); ValueError when none completed.
"""

from __future__ import annotations

import threading
import typing as t

import numpy as np


class TrialPruned(Exception):
    pass


class _TrialState:
    RUNNING = "RUNNING"
    COMPLETE = "COMPLETE"
    PRUNED = "PRUNED"
    FAIL = "FAIL"


class Trial:
    def __init__(self, study: "Study", number: int):
        self._study = study
        self.number = number
        self.params: t.Dict[str, float] = {}
        self.intermediate_values: t.Dict[int, float] = {}
        self.state = _TrialState.RUNNING
        self.value: t.Optional[float] = None

    def suggest_float(self, name: str, low: float, high: float) -> float:
        v = self._study.sampler._suggest(low, high)
        self.params[name] = v
        return v

    def report(self, value: float, step: int) -> None:
        self.intermediate_values[step] = float(value)

    def should_prune(self) -> bool:
        return self._study.pruner._prune(self._study, self)


class TPESampler:
    """Seeded independent uniform sampling (optuna TPE's exact behavior
    below its n_startup_trials threshold — the regime these sweeps run in)."""

    def __init__(self, seed: t.Optional[int] = None):
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        self._lock = threading.Lock()

    def _suggest(self, low: float, high: float) -> float:
        with self._lock:
            return float(self._rng.uniform(low, high))


class MedianPruner:
    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def _prune(self, study: "Study", trial: Trial) -> bool:
        if not trial.intermediate_values:
            return False
        step = max(trial.intermediate_values)
        if step < self.n_warmup_steps:
            return False
        with study._lock:
            completed = [
                tr for tr in study.trials if tr.state == _TrialState.COMPLETE
            ]
            if len(completed) < self.n_startup_trials:
                return False
            prior = [
                tr.intermediate_values[step]
                for tr in completed
                if step in tr.intermediate_values
            ]
        if not prior:
            return False
        median = float(np.median(prior))
        value = trial.intermediate_values[step]
        if study.direction == "maximize":
            return value < median
        return value > median


class Study:
    def __init__(self, direction: str, pruner: t.Any, sampler: t.Any):
        self.direction = direction
        self.pruner = pruner if pruner is not None else MedianPruner()
        self.sampler = sampler if sampler is not None else TPESampler()
        self.trials: t.List[Trial] = []
        self._lock = threading.Lock()

    def _run_one(self, objective: t.Callable[[Trial], float]) -> None:
        with self._lock:
            trial = Trial(self, len(self.trials))
            self.trials.append(trial)
        try:
            value = objective(trial)
        except TrialPruned:
            trial.state = _TrialState.PRUNED
            return
        except BaseException:
            trial.state = _TrialState.FAIL
            raise
        trial.value = float(value)
        trial.state = _TrialState.COMPLETE

    def optimize(
        self,
        objective: t.Callable[[Trial], float],
        n_trials: int,
        n_jobs: int = 1,
    ) -> None:
        if n_jobs == 1:
            for _ in range(n_trials):
                self._run_one(objective)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            futs = [
                pool.submit(self._run_one, objective) for _ in range(n_trials)
            ]
            for f in futs:
                f.result()  # re-raise non-TrialPruned failures

    @property
    def best_trial(self) -> Trial:
        completed = [
            tr for tr in self.trials if tr.state == _TrialState.COMPLETE
        ]
        if not completed:
            raise ValueError("No trials are completed yet.")
        key = (lambda tr: tr.value) if self.direction == "maximize" else (
            lambda tr: -tr.value
        )
        return max(completed, key=key)


def create_study(
    direction: str = "minimize",
    pruner: t.Any = None,
    sampler: t.Any = None,
) -> Study:
    return Study(direction, pruner, sampler)


class _NS:
    pass


pruners = _NS()
pruners.MedianPruner = MedianPruner
samplers = _NS()
samplers.TPESampler = TPESampler
