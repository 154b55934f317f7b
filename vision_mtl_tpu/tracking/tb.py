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

import json
import os
import typing as t


class MetricsLogger:
    def __init__(self, root_dir: str, name: str):
        base = os.path.join(root_dir, name)
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
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb: t.Optional[t.Any] = SummaryWriter(self.log_dir)
        except Exception:
            self._tb = None

    def log_metrics(self, metrics: t.Dict[str, float], step: int) -> None:
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
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
