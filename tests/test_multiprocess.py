"""TRUE multi-process data parallelism: two OS processes, each owning 2
virtual CPU devices, joined via jax.distributed — exercises
parallel/multihost.py's host-sharded loading + global-batch assembly the
way a TPU pod runtime would (SURVEY.md §5.8), beyond the single-process
tests in test_multihost.py."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_batch(tmp_path):
    # the communicate(timeout=280) below bounds the runtime; no plugin needed
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port), str(out)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(worker)),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=280)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    for out in outs:
        with open(out) as f:
            r = json.load(f)
        # the jitted global reduction saw BOTH hosts' data
        assert r["total"] == pytest.approx(r["expected_total"], rel=1e-6)
        np.testing.assert_allclose(
            r["mean_per_sample"], r["expected_mean_per_sample"], rtol=1e-5
        )
