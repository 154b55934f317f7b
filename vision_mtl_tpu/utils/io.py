"""Small filesystem primitives shared by the persistence paths.

The reference persists state with bare ``torch.save``/``json.dump`` calls
(utils/pipeline_utils.py:139-204) — safe single-process, single-writer.
This framework's runs are preemptible (train/preempt.py) and multi-process
(parallel/multihost.py), so every JSON sidecar/registry write goes through
these two primitives instead:

* ``atomic_write_json`` — publish-by-rename so a reader (or a SIGKILL mid
  write) never sees a torn file; optional fsync for writes that race a
  power-loss/eviction window.
* ``file_lock`` — an ``flock`` critical section for read-modify-write
  cycles shared between independent processes (run registry, cache build).
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
import typing as t


def atomic_write_json(
    path: str, obj: t.Any, *, fsync: bool = False, **dump_kwargs: t.Any
) -> None:
    """Write ``obj`` as JSON to ``path`` atomically (tempfile in the same
    directory + ``os.replace``). With ``fsync`` the data — and the rename
    itself, via the directory fd — are forced to disk before returning, for
    writes inside a kill window (the preemption sidecar)."""
    dirname = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, **dump_kwargs)
            if fsync:
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, path)
        if fsync:
            dfd = os.open(dirname, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


@contextlib.contextmanager
def file_lock(path: str) -> t.Iterator[None]:
    """Exclusive ``flock`` on ``path`` (created if absent) for the duration
    of the ``with`` block. Blocks until acquired; reentrant across processes
    only in the usual flock sense (per open file description)."""
    import fcntl

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
