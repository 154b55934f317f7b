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


def _communicate_all(procs, timeout):
    """communicate() every proc, SIGKILLing all of them on timeout — jax's
    preemption notifier swallows SIGTERM, so an orphaned worker would keep
    burning the (single) CPU core and poison later test runs."""
    logs = []
    try:
        for p in procs:
            logs.append(p.communicate(timeout=timeout)[0].decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise
    return logs


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
    logs = _communicate_all(procs, 280)
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


def test_two_process_full_pipeline(tmp_path):
    """run_pipe end to end under jax.distributed (2 procs x 1 device):
    host-sharded loaders, coherent process-0 Orbax checkpoint, exact resume
    matching an uninterrupted run — the full-pod code path (VERDICT r2 #4)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_pipeline_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"pipe_{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port),
                 str(tmp_path), str(out)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(worker)),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    # the preemption leg (run C) grew this worker to ~8 min standalone on
    # the 1-core host; in-suite overhead needs real headroom
    logs = _communicate_all(procs, 1100)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    results = []
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    r0, r1 = results

    # the predict sweep returned the FULL prediction set on every host
    # (sharded outputs all-gathered before fetch) with identical metrics
    for r in (r0, r1):
        assert r["n_pred"] == r["n_predict_ds"], (r["n_pred"], r["n_predict_ds"])
    np.testing.assert_allclose(r0["predict_acc"], r1["predict_acc"], rtol=0)
    assert r0["predict_acc"] >= 0.0

    # both processes observed IDENTICAL metric streams (true SPMD)
    for k in ("a_train_loss", "a_val_loss", "a_val_acc", "b1_train_loss",
              "resumed_train_loss", "resumed_val_loss", "resumed_val_acc"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=0, atol=0, err_msg=k)

    # the interrupted+resumed run reproduces the uninterrupted run's tail
    assert len(r0["a_train_loss"]) == 3 and len(r0["resumed_train_loss"]) == 1
    np.testing.assert_allclose(
        r0["resumed_train_loss"][0], r0["a_train_loss"][2], rtol=1e-5
    )
    np.testing.assert_allclose(
        r0["resumed_val_loss"][0], r0["a_val_loss"][2], rtol=1e-5
    )
    # and the first two epochs matched before the interruption
    np.testing.assert_allclose(
        r0["b1_train_loss"], r0["a_train_loss"][:2], rtol=1e-6
    )

    # preemption under jax.distributed: both processes exited 143 from the
    # COLLECTIVE preempt save at the same (uniform) step, the artifact won
    # resolve_resume, and the resumed run reproduced run A's tail exactly
    for r in (r0, r1):
        assert r["preempt_code"] == 143
        assert r["preempt_resume_mode"] == "preempt"
        assert r["preempt_pos"] == [1, 1]  # epoch 1, its single batch done
    np.testing.assert_allclose(
        r0["c_train_loss"], r0["a_train_loss"][1:], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        r0["c_val_loss"], r0["a_val_loss"][1:], rtol=0, atol=0
    )
    np.testing.assert_allclose(r0["c_train_loss"], r1["c_train_loss"], rtol=0)


def test_two_process_spatial_mesh(tmp_path):
    """A data:1,spatial:2 mesh whose SPATIAL axis crosses the process
    boundary: row-sliced loading is rejected, the datamodule auto-switches
    to full-batch mode, assembly + a halo-exchanging conv are correct
    (the configuration the loader review found would mis-assemble)."""
    port = _free_port()
    worker = os.path.join(
        os.path.dirname(__file__), "_mp_spatial_worker.py"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"spatial_{pid}.json"
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
    logs = _communicate_all(procs, 420)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    results = []
    for out in outs:
        with open(out) as f:
            r = json.load(f)
        assert r["sum"] == pytest.approx(r["expected_sum"], rel=1e-6)
        assert r["conv_max_abs_err"] < 1e-4, r["conv_max_abs_err"]
        results.append(r)

    # all_processes_agree over the real KV store: uniform flags pass,
    # divergent flags AND-reduce to False on every process
    assert results[0]["agree"] == [True, False]
    assert results[1]["agree"] == [True, False]

    # to_host fetched a process-spanning (non-addressable) array exactly on
    # BOTH hosts — the multi-process TP checkpoint path
    assert results[0]["to_host_exact"] and results[1]["to_host_exact"]

    # MetricsLogger agreed on ONE run dir per construction across processes
    # (checkpoint-path coherence), and only process 0 wrote the sink
    assert results[0]["log_dirs"] == results[1]["log_dirs"]
    assert len(set(results[0]["log_dirs"])) == 2  # two distinct loggers
    for d in results[0]["log_dirs"]:
        with open(os.path.join(d, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert [r["x"] for r in recs] == [0.0]  # process 0's write only
