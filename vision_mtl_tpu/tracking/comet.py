"""Comet ML experiment tracking — same public surface as the reference
(utils/pipeline_utils.py:247-285, utils/comet_utils.py), auto-disabling
gracefully when comet_ml or credentials are absent (reference cfg.py:34).

In this zero-egress build comet_ml is not installed, so ``NullExperiment``
absorbs every call while keeping the call sites identical; with comet_ml
installed and ``.env`` credentials present, a real Experiment is created
(including ``resume_exp`` via ExistingExperiment).
"""

from __future__ import annotations

import argparse
import glob
import typing as t

from vision_mtl_tpu.cfg import cfg


class NullExperiment:
    """No-op Comet experiment stand-in (truthy=False so reference-style
    ``if exp:`` guards skip logging)."""

    name = "disabled"

    def __bool__(self) -> bool:
        return False

    def _noop(self, *args: t.Any, **kwargs: t.Any) -> None:
        return None

    def __getattr__(self, item: str) -> t.Callable[..., None]:
        return self._noop


# failed imports are NOT cached by Python, and comet_enabled is called
# every validation epoch — probe once per process (installation state
# cannot change mid-run)
_comet_importable: t.Optional[bool] = None


def comet_enabled(args: argparse.Namespace) -> bool:
    """Pure predicate: would :func:`create_tracking_exp` return a REAL
    experiment? Derived only from args / config / installed deps, so every
    jax.distributed process computes the same answer (hosts must share the
    environment) — used for process-consistent gating of code that both
    depends on the experiment and executes collective programs
    (train/loop.py benchmark predictions)."""
    if getattr(args, "exp_disabled", True) or cfg.logger.disabled:
        return False
    global _comet_importable
    if _comet_importable is None:
        try:
            import comet_ml  # noqa: F401

            _comet_importable = True
        except ImportError:
            _comet_importable = False
    return _comet_importable


def create_tracking_exp(
    args: argparse.Namespace,
    exp_disabled: bool = True,
    force_disabled: t.Optional[bool] = None,
    project_name: t.Optional[str] = None,
) -> t.Any:
    if force_disabled is None:
        force_disabled = cfg.logger.disabled
    if project_name is None:
        project_name = cfg.logger.project_name
    disabled = getattr(args, "exp_disabled", exp_disabled) or force_disabled
    if disabled:
        # a comet_ml.Experiment(disabled=True) is truthy, which would flip
        # every reference-style ``if exp:`` guard (benchmark plotting,
        # checkpoint upload waits) to the enabled path — NullExperiment
        # keeps the falsy contract regardless of comet_ml being installed
        return NullExperiment()

    try:
        import comet_ml  # noqa: F401
    except ImportError:
        return NullExperiment()

    exp_init_args = dict(
        api_key=cfg.logger.api_key,
        auto_output_logging="simple",
        auto_metric_logging=True,
        auto_param_logging=True,
        log_env_details=True,
        log_env_host=False,
        log_env_gpu=True,
        log_env_cpu=True,
        log_code=False,
        disabled=disabled,
    )
    if getattr(args, "resume_exp", False):
        from comet_ml.api import API

        api = API(api_key=cfg.logger.api_key)
        exp_api = api.get(
            f"{cfg.logger.username}/{project_name}/{args.exp_name}"
        )
        experiment = comet_ml.ExistingExperiment(
            **exp_init_args, experiment_key=exp_api.id
        )
    else:
        experiment = comet_ml.Experiment(
            **exp_init_args, project_name=project_name
        )
    for code_file in glob.glob("./*.py"):
        experiment.log_code(code_file)
    return experiment


def log_params_to_exp(experiment: t.Any, params: dict, prefix: str) -> None:
    if experiment:
        experiment.log_parameters(
            {f"{prefix}/{str(k)}": v for k, v in params.items()}
        )


def log_ckpt_to_exp(
    experiment: t.Any, ckpt_path: str, model_name: str = "ckpt"
) -> None:
    if experiment:
        experiment.log_model(model_name, ckpt_path, overwrite=False)
