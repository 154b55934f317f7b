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
