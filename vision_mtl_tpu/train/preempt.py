"""Preemption-safe training — failure detection/recovery (SURVEY.md §5.3).

Spot/preemptible TPU VMs get a SIGTERM with a short grace window before the
machine disappears. ``PreemptionGuard`` turns that signal into a request
honored at the next *step boundary*, where ``run_pipe`` writes a mid-epoch
checkpoint (``preempt_model``/``preempt_session`` — params, optimizer,
plateau scheduler, the in-progress epoch's metric accumulators, and the
position ``(epoch, batch_in_epoch)``) and exits. ``--resume_dir`` then
continues EXACTLY where training stopped: the loader replays the same
seeded shuffle order and skips the already-trained batches without decoding
them, so the resumed trajectory is identical to an uninterrupted run
(tests/test_preempt.py asserts this end to end).

The reference has no recovery machinery at all (SURVEY §5.3: "absent");
this is a TPU-native addition — preemption is the *normal* failure mode of
large TPU fleets, not an edge case.

Multi-process notes
-------------------
Under ``jax.distributed`` the runtime installs its own SIGTERM notifier
(the signal never reaches user handlers — a timed-out worker keeps running,
see CLAUDE.md), and the checkpoint write is a COLLECTIVE Orbax save, so the
save decision must be process-uniform. The guard therefore ignores its
local flag under multi-process and consults
``jax.experimental.multihost_utils.reached_preemption_sync_point`` — the
coordination-service channel jax's notifier feeds — which returns True on
EVERY process at the same step once any host was notified.

Scope: the guard protects ``run_pipe`` — the main training run, resumed
runs, and the post-sweep best-trial retrain. Hyperparameter-sweep TRIALS
(tuning.py) are not preemption-guarded: a mid-trial eviction restarts the
sweep on relaunch (trials are 3 epochs; cross-relaunch optuna storage is
out of scope, as in the reference).

Fault injection
---------------
``VMTL_PREEMPT_AT_STEP=<k>`` (or ``inject_at_step=k``) deterministically
triggers the guard once the global step counter reaches ``k`` — the test
hook, and a fault-injection knob for drills. It is process-uniform by
construction (same env everywhere), so it also exercises the collective
path.
"""

from __future__ import annotations

import os
import signal
import typing as t


class PreemptionGuard:
    """Polled preemption request. Construct once (after
    ``jax.distributed`` init, so process topology is known), then call
    :meth:`requested` at every step boundary."""

    def __init__(
        self,
        signals: t.Sequence[int] = (signal.SIGTERM,),
        inject_at_step: t.Optional[int] = None,
    ):
        self._flag = False
        if inject_at_step is None:
            env = os.environ.get("VMTL_PREEMPT_AT_STEP")
            inject_at_step = int(env) if env else None
        self._inject_at = inject_at_step
        self._polls = 0
        self._warned_sync = False
        self._multiprocess = self._process_count() > 1
        if not self._multiprocess:
            # multi-process: jax's distributed runtime already owns SIGTERM
            # (its preemption notifier) — replacing its handler would break
            # the cross-host sync point this guard relies on there
            for s in signals:
                try:
                    signal.signal(s, self._handle)
                except ValueError:
                    # not the main thread (e.g. a test runner worker):
                    # injection still works, OS signals cannot
                    pass

    @staticmethod
    def _process_count() -> int:
        from vision_mtl_tpu.parallel.multihost import process_info_no_backend

        return process_info_no_backend()[1]

    def _handle(self, signum, frame) -> None:  # pragma: no cover - signal
        self._flag = True

    def requested(self, global_step: int) -> bool:
        """True once a preemption notice (signal, cross-host sync point, or
        injected fault) is pending. Process-uniform under multi-process:
        every process sees True at the same poll (all processes poll in
        SPMD lockstep, so the internal monotonic poll ordinal — not
        ``global_step``, which the val loop holds constant — keys the
        cross-host sync point)."""
        if self._inject_at is not None and global_step >= self._inject_at:
            return True
        if self._multiprocess:
            self._polls += 1
            try:
                from jax.experimental import multihost_utils

                return bool(
                    multihost_utils.reached_preemption_sync_point(
                        self._polls
                    )
                )
            except Exception as e:
                # returning False forever would silently disable the ONE
                # mechanism --preempt_save exists for (jax's notifier also
                # swallows the raw SIGTERM here) — say so, once
                if not self._warned_sync:
                    self._warned_sync = True
                    print(
                        "WARNING: preemption sync point unavailable under "
                        f"jax.distributed ({type(e).__name__}: {e}) — "
                        "--preempt_save will NOT react to eviction notices "
                        "on this run."
                    )
                return False
        return self._flag
