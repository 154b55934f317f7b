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


class MetricsLogger:
    """Multi-process safe: under ``jax.distributed`` all processes resolve
    the SAME run dir (process 0 claims it and publishes through the
    coordination-service KV store — pure gRPC, no device collective) and
    only process 0 opens the metric sinks. One shared dir is load-bearing:
    ``run_pipe`` derives the Orbax checkpoint path from ``log_dir``, and an
    Orbax save is collective — per-process dirs would deadlock the save
    barrier (docs: CLAUDE.md multi-process gotchas)."""

    def __init__(self, root_dir: str, name: str):
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
                # the name travels with the dir as an ordinal-desync guard
                client.key_value_set(key, f"{self.log_dir}\n{name}")
            else:
                value = client.blocking_key_value_get(key, 600_000)
                self.log_dir, remote_name = value.split("\n", 1)
                # names may legitimately differ only by the comet run_name
                # suffix (created on process 0 alone); a mismatched LEADING
                # component means the construction ordinals desynced —
                # adopting the dir would cross-wire two different runs'
                # metrics and checkpoints, so fail loudly instead
                if remote_name.split("/")[0] != name.split("/")[0]:
                    raise RuntimeError(
                        "MetricsLogger rendezvous desync: process 0 "
                        f"published {remote_name!r} for key {key!r} but "
                        f"this process is constructing {name!r}. Loggers "
                        "must be constructed in the same order on every "
                        "process (SPMD lockstep)."
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
