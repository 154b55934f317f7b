"""Metrics sinks: TensorBoard events + append-only JSONL.

Replaces Lightning's TensorBoardLogger (reference create_tools,
utils/pipeline_utils.py:33-56): run dirs are
``{log_root}/training-{model}/{run_name}/version_{n}`` and the metric-name
surface matches the reference exactly (``step/{stage}/{k}``,
``epoch/{stage}/{k}`` — training_lit.py:91,105-113).

The JSONL sink (metrics.jsonl) is the machine-readable record used by the
eval harness and tests; TensorBoard (via tensorboardX) is best-effort.
"""

from __future__ import annotations

import itertools
import json
import os
import typing as t

# per-process logger construction counter: under jax.distributed every
# process constructs its loggers in the same (SPMD) order, so the ordinal
# forms a cross-process rendezvous key for agreeing on the shared run dir
_logger_seq = itertools.count()


def _process_info() -> t.Tuple[int, int]:
    from vision_mtl_tpu.parallel.multihost import process_info

    return process_info()


_FAIL_SENTINEL = "__FAILED__"


def publish_logger_failure(reason: str) -> None:
    """Process 0, about to die BEFORE constructing its next MetricsLogger:
    unblock the peer processes already waiting in the run-dir rendezvous
    with a loud error instead of a 10-minute blocking_key_value_get timeout
    (e.g. create_tracking_exp raising on a bad comet key — pipeline.py).
    No-op on single-process runs and on non-zero processes."""
    pi, pc = _process_info()
    if pc <= 1 or pi != 0:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    key = f"vmtl_metrics_logger:{next(_logger_seq)}"
    client.key_value_set(key, f"{_FAIL_SENTINEL}\n{reason}")


class MetricsLogger:
    """Multi-process safe: under ``jax.distributed`` all processes resolve
    the SAME run dir (process 0 claims it and publishes through the
    coordination-service KV store — pure gRPC, no device collective) and
    only process 0 opens the metric sinks. One shared dir is load-bearing:
    ``run_pipe`` derives the Orbax checkpoint path from ``log_dir``, and an
    Orbax save is collective — per-process dirs would deadlock the save
    barrier (docs: CLAUDE.md multi-process gotchas)."""

    def __init__(self, root_dir: str, name: str, rendezvous_tag: str = "main"):
        base = os.path.join(root_dir, name)
        pi, pc = _process_info()
        self._writer = pi == 0
        if pi == 0:
            os.makedirs(base, exist_ok=True)
            # claim a version dir atomically (makedirs WITHOUT exist_ok):
            # concurrent loggers — e.g. thread-parallel tuning trials — must
            # not pick the same version and interleave metrics/checkpoints
            version = 0
            while True:
                self.log_dir = os.path.join(base, f"version_{version}")
                try:
                    os.makedirs(self.log_dir)
                    break
                except FileExistsError:
                    version += 1
        if pc > 1:
            from jax._src import distributed

            client = distributed.global_state.client
            key = f"vmtl_metrics_logger:{next(_logger_seq)}"
            if pi == 0:
                # the caller-supplied tag travels with the dir as an
                # ordinal-desync guard (names can't distinguish loggers:
                # every tuning trial uses the same training-{model} name)
                client.key_value_set(key, f"{self.log_dir}\n{rendezvous_tag}")
            else:
                value = client.blocking_key_value_get(key, 600_000)
                self.log_dir, remote_tag = value.split("\n", 1)
                if self.log_dir == _FAIL_SENTINEL:
                    raise RuntimeError(
                        "MetricsLogger rendezvous: process 0 failed before "
                        f"constructing logger {key!r}: {remote_tag}"
                    )
                # a mismatched tag means the construction ordinals desynced
                # across processes — adopting the dir would cross-wire two
                # different runs' metrics and (collective!) Orbax
                # checkpoints, so fail loudly instead
                if remote_tag != rendezvous_tag:
                    raise RuntimeError(
                        "MetricsLogger rendezvous desync: process 0 "
                        f"published tag {remote_tag!r} for key {key!r} but "
                        f"this process is constructing {rendezvous_tag!r}. "
                        "Loggers must be constructed in the same order on "
                        "every process (SPMD lockstep)."
                    )
        self._jsonl = (
            open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
            if self._writer
            else None
        )
        self._tb: t.Optional[t.Any] = None
        if self._writer:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(self.log_dir)
            except Exception:
                self._tb = None

    def log_metrics(self, metrics: t.Dict[str, float], step: int) -> None:
        if self._jsonl is not None:
            record = {"step": step}
            record.update({k: float(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def log_figure(self, tag: str, figure: t.Any, step: int = 0) -> None:
        if self._tb is not None:
            try:
                self._tb.add_figure(tag, figure, step)
            except Exception:
                pass

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
