"""Multi-host helpers in a single-process, 8-virtual-device setting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.parallel.mesh import create_mesh, put_batch
from vision_mtl_tpu.parallel.multihost import (
    global_batch_from_local,
    process_index_range,
)


def test_process_index_range_partitions():
    # equal per-host lengths are load-bearing (SPMD step-count agreement);
    # the remainder (103 - 4*25 = 3 samples) is dropped
    ranges = [process_index_range(103, pi, 4) for pi in range(4)]
    assert all(len(r) == 25 for r in ranges)
    all_idx = [i for r in ranges for i in r]
    assert all_idx == list(range(100))
    assert len(set(all_idx)) == 100  # disjoint coverage


def test_global_batch_single_process_matches_put_batch(rng):
    mesh = create_mesh("data:8")
    batch = {
        "img": rng.uniform(size=(8, 4, 4, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, size=(8, 4, 4)).astype(np.int32),
    }
    g = global_batch_from_local(batch, mesh)
    ref = put_batch(batch, mesh)
    for k in batch:
        assert g[k].shape == batch[k].shape
        assert g[k].sharding == ref[k].sharding
        np.testing.assert_array_equal(np.asarray(g[k]), batch[k])
    # a computation over the assembled batch works
    s = jax.jit(lambda b: jnp.sum(b["img"]))(g)
    np.testing.assert_allclose(
        float(s), float(np.sum(batch["img"])), rtol=1e-6
    )


def test_param_shardings_tp_axis(rng):
    from vision_mtl_tpu.parallel.mesh import param_shardings

    mesh = create_mesh("data:2,model:4")
    params = {
        "big_kernel": np.zeros((3, 3, 256, 512), np.float32),
        "odd_out": np.zeros((3, 3, 256, 509), np.float32),  # not divisible
        "small_bias": np.zeros((512,), np.float32),
    }
    s = param_shardings(mesh, params)
    assert s["big_kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    assert s["odd_out"].spec == jax.sharding.PartitionSpec()
    assert s["small_bias"].spec == jax.sharding.PartitionSpec()
    # data-only mesh -> everything replicated
    s2 = param_shardings(create_mesh("data:8"), params)
    assert s2["big_kernel"].spec == jax.sharding.PartitionSpec()


class _FakeDev:
    def __init__(self, process_index):
        self.process_index = process_index


def _fake_mesh(shape, axis_names, pids):
    """Duck-typed mesh: .devices ndarray of objects w/ process_index,
    .axis_names — all process_spanning_axes reads."""
    import types

    devs = np.array([_FakeDev(p) for p in pids], object).reshape(shape)
    return types.SimpleNamespace(devices=devs, axis_names=axis_names)


def test_process_spanning_axes():
    from vision_mtl_tpu.parallel.mesh import process_spanning_axes

    # 2 processes over the data axis of data:4,spatial:2 (row-major mesh:
    # process boundary between data coords 1|2) -> only 'data' spans
    m = _fake_mesh((4, 2), ("data", "spatial"), [0, 0, 0, 0, 1, 1, 1, 1])
    assert process_spanning_axes(m) == ("data",)

    # 2 processes over the SPATIAL axis (each data coord split across
    # processes) -> 'spatial' spans; row-sliced loading would mis-assemble
    m = _fake_mesh((4, 2), ("data", "spatial"), [0, 1, 0, 1, 0, 1, 0, 1])
    assert process_spanning_axes(m) == ("spatial",)

    # single process -> nothing spans
    m = _fake_mesh((4, 2), ("data", "spatial"), [0] * 8)
    assert process_spanning_axes(m) == ()

    # real single-process mesh object works too
    assert process_spanning_axes(create_mesh("data:4,spatial:2")) == ()


def test_loader_full_batch_mode(monkeypatch, rng):
    """shard_rows=False must decode the FULL global batch on every 'host'
    (identical across processes — required for process-spanning
    spatial/model meshes), vs the default 1/process_count row slice."""
    from vision_mtl_tpu.data.loader import DataLoader
    from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset

    ds = SyntheticMTLDataset(stage="train")
    ds.length = 8
    shards = []
    for pid in (0, 1):
        monkeypatch.setattr(
            DataLoader, "_process_shard", staticmethod(lambda p=pid: (p, 2))
        )
        row = next(iter(DataLoader(ds, batch_size=4, drop_last=True)))
        full = next(
            iter(
                DataLoader(ds, batch_size=4, drop_last=True, shard_rows=False)
            )
        )
        assert row["img"].shape[0] == 2  # this host's row slice
        assert full["img"].shape[0] == 4  # the whole global batch
        shards.append((row, full))
    (row0, full0), (row1, full1) = shards
    # full-batch mode: bitwise identical on every host
    np.testing.assert_array_equal(full0["img"], full1["img"])
    # row mode: disjoint halves of the same global batch
    np.testing.assert_array_equal(
        np.concatenate([row0["img"], row1["img"]]), full0["img"]
    )


def test_maybe_initialize_distributed_env_contract(monkeypatch):
    """The CLI launch shim must (a) no-op without launch markers — incl. a
    SINGLE-host TPU_WORKER_HOSTNAMES like dev boxes have, (b) forward the
    legacy COORDINATOR_ADDRESS spelling plus explicit count/id to
    jax.distributed.initialize, (c) auto-fire on multi-worker pod env, and
    (d) RAISE (not silently fall back) when a detected launch cannot
    resolve the process group."""
    from vision_mtl_tpu.parallel import multihost

    calls = []

    def fake_init(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    for var in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(var, raising=False)

    # (a) bare env -> no-op; single-host TPU env -> still no-op
    multihost.maybe_initialize_distributed()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    multihost.maybe_initialize_distributed()
    assert calls == []

    # (b) the documented explicit recipe, legacy spelling
    monkeypatch.setenv("COORDINATOR_ADDRESS", "h0:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    multihost.maybe_initialize_distributed()
    assert calls == [
        {"coordinator_address": "h0:1234", "num_processes": 4,
         "process_id": 3}
    ]

    # (c) multi-worker pod env -> auto-fire with jax's own detection
    calls.clear()
    for var in ("COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    multihost.maybe_initialize_distributed()
    assert calls == [{}]

    # (d) a detected launch that cannot resolve RAISES with guidance
    def broken_init(**kwargs):
        raise ValueError("coordinator_address should be defined.")

    monkeypatch.setattr(jax.distributed, "initialize", broken_init)
    with pytest.raises(RuntimeError, match="JAX_NUM_PROCESSES"):
        multihost.maybe_initialize_distributed()

    # (e) count/id WITHOUT any coordinator address is still a detected
    # launch (two-of-three launcher env) — must raise, not fall back to N
    # independent single-process runs
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    with pytest.raises(RuntimeError, match="no coordinator address"):
        multihost.maybe_initialize_distributed()


def test_maybe_initialize_malformed_count_env(monkeypatch):
    """Malformed JAX_NUM_PROCESSES/JAX_PROCESS_ID (launcher templating bugs)
    must surface the launch-guidance RuntimeError, not a bare int() error."""
    from vision_mtl_tpu.parallel import multihost

    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: (_ for _ in ()).throw(
            AssertionError("initialize must not be reached")
        )
    )
    monkeypatch.setenv("COORDINATOR_ADDRESS", "h0:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2n")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="not integers"):
        multihost.maybe_initialize_distributed()


class _FakeKV:
    """Coordination-service KV store double: blocking get with a real wait
    so two simulated processes (threads) can rendezvous."""

    def __init__(self):
        import threading

        self._d = {}
        self._cv = threading.Condition()

    def key_value_set(self, k, v):
        with self._cv:
            self._d[k] = v
            self._cv.notify_all()

    def blocking_key_value_get(self, k, timeout_ms):
        with self._cv:
            if not self._cv.wait_for(
                lambda: k in self._d, timeout=min(timeout_ms / 1000.0, 5.0)
            ):
                raise TimeoutError(f"kv timeout waiting for {k!r}")
            return self._d[k]


def test_all_processes_agree(monkeypatch):
    """AND-reduction over the (faked) coordination service: the guard that
    keeps collective programs off strict process subsets."""
    import threading

    from jax._src import distributed

    from vision_mtl_tpu.parallel import multihost

    # single-process passthrough needs no client
    monkeypatch.setattr(multihost, "process_info", lambda: (0, 1))
    assert multihost.all_processes_agree(True, "x") is True
    assert multihost.all_processes_agree(False, "x") is False

    # two simulated processes = two threads; per-"process" call counters
    # (the real counter is per-process module state)
    tls = threading.local()

    class _TLCount:
        def __next__(self):
            v = getattr(tls, "seq", 0)
            tls.seq = v + 1
            return v

    monkeypatch.setattr(multihost, "_agree_seq", _TLCount())
    monkeypatch.setattr(
        multihost, "process_info", lambda: (tls.pid, 2)
    )
    monkeypatch.setattr(distributed.global_state, "client", _FakeKV())

    results = {}

    def worker(pid, flags):
        tls.pid, tls.seq = pid, 0
        results[pid] = [
            multihost.all_processes_agree(f, "bench") for f in flags
        ]

    # round 1: both True -> True; round 2: one False -> False everywhere
    ts = [
        threading.Thread(target=worker, args=(0, [True, True])),
        threading.Thread(target=worker, args=(1, [True, False])),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=30)
    assert results == {0: [True, False], 1: [True, False]}


def test_metrics_logger_rendezvous(monkeypatch, tmp_path):
    """Cross-process run-dir rendezvous: worker adopts process 0's dir, a
    tag mismatch (construction-ordinal desync) fails loudly, and a
    process-0 failure sentinel unblocks waiting workers with the reason."""
    import itertools

    from jax._src import distributed

    from vision_mtl_tpu.tracking import tb

    kv = _FakeKV()
    monkeypatch.setattr(distributed.global_state, "client", kv)

    def as_process(pi):
        monkeypatch.setattr(tb, "_process_info", lambda: (pi, 2))
        monkeypatch.setattr(tb, "_logger_seq", itertools.count())

    # happy path: worker adopts the published dir and opens no sinks
    as_process(0)
    lg0 = tb.MetricsLogger(str(tmp_path), "run", rendezvous_tag="main")
    as_process(1)
    lg1 = tb.MetricsLogger(str(tmp_path), "run", rendezvous_tag="main")
    assert lg1.log_dir == lg0.log_dir
    assert lg1._jsonl is None and lg0._jsonl is not None
    lg1.log_metrics({"a": 1.0}, 0)  # no-op, must not crash
    lg0.close(), lg1.close()

    # tag desync: ordinal k paired with a different construction site
    as_process(0)
    tb.MetricsLogger(str(tmp_path), "run", rendezvous_tag="trial_0").close()
    as_process(1)
    with pytest.raises(RuntimeError, match="desync"):
        tb.MetricsLogger(str(tmp_path), "run", rendezvous_tag="trial_1")

    # failure sentinel: process 0 dies pre-construction, worker gets the
    # reason instead of a 10-minute KV timeout
    as_process(0)
    tb.publish_logger_failure("create_tracking_exp raised on process 0")
    as_process(1)
    with pytest.raises(RuntimeError, match="create_tracking_exp"):
        tb.MetricsLogger(str(tmp_path), "run", rendezvous_tag="main")


def test_training_help_skips_pod_rendezvous(tmp_path):
    """`--help` under a pod-launcher environment (COORDINATOR_ADDRESS set)
    must print usage and exit 0 WITHOUT joining the jax.distributed
    rendezvous — argparse runs before maybe_initialize_distributed in
    training.main. If the order regressed, process 0 would host the
    coordinator and block waiting for the (nonexistent) second process."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = "0"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vision_mtl_tpu.training", "--help"],
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        out = proc.communicate(timeout=240)[0].decode()
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError(
            "--help hung: training.main joined the pod rendezvous before "
            "parsing args"
        )
    assert proc.returncode == 0, out
    assert "--model_name" in out
