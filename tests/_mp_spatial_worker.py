"""Worker for the 2-process SPATIAL-spanning-mesh test (test_multiprocess.py).

Each of 2 processes owns 1 virtual CPU device; the mesh is
``data:1,spatial:2`` — the image-H axis, not the batch axis, crosses the
process boundary. This is exactly the configuration row-sliced host-sharded
loading cannot express (a host's shards are H-slices of EVERY row), so the
worker proves the full-batch mode end to end:

  * ``process_spanning_axes`` reports ``("spatial",)``;
  * row-sliced ``global_batch_from_local`` is REJECTED (ValueError), not
    mis-assembled;
  * ``configure_host_sharded_loading`` flips the datamodule to
    ``shard_rows=False`` and ``prefetch_to_device`` assembles correct global
    arrays from the full per-host batches (jitted global sum matches);
  * a jitted 3x3 SAME conv over the H-sharded batch — whose shard boundary
    halo exchange is a true cross-process collective — matches the
    single-device result.

Usage: python tests/_mp_spatial_worker.py <pid> <port> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    # 1 device/process: two processes of concurrent XLA compute on this
    # 1-core host starve gloo past its hard 30s rendezvous (CLAUDE.md)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # join via the CLI's documented env recipe (README "Multi-host") —
    # this worker deliberately exercises maybe_initialize_distributed's
    # legacy-spelling mapping + explicit process count/id forwarding
    # instead of calling jax.distributed.initialize directly
    os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    from vision_mtl_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vision_mtl_tpu.cfg import ResizeSpec
    from vision_mtl_tpu.data.datamodule import (
        MTLDataModule,
        configure_host_sharded_loading,
    )
    from vision_mtl_tpu.data.loader import prefetch_to_device
    from vision_mtl_tpu.parallel.mesh import create_mesh, process_spanning_axes
    from vision_mtl_tpu.parallel.multihost import global_batch_from_local

    mesh = create_mesh("data:1,spatial:2")
    assert process_spanning_axes(mesh) == ("spatial",), process_spanning_axes(
        mesh
    )

    # ---- row-sliced assembly must be rejected, not mis-assembled ----
    full = np.arange(4 * 8 * 6 * 3, dtype=np.float32).reshape(4, 8, 6, 3)
    rejected = False
    try:
        global_batch_from_local({"img": full[pid * 2 : (pid + 1) * 2]}, mesh)
    except ValueError:
        rejected = True
    assert rejected, "row-sliced local data on a spatial mesh must raise"

    # ---- the loader flips to full-batch mode automatically ----
    spec = ResizeSpec(8, 8)
    dm = MTLDataModule(
        "synthetic", batch_size=4, do_overfit=True,
        train_transform=spec, test_transform=spec,
    )
    configure_host_sharded_loading(dm, mesh)
    assert dm.shard_rows is False
    dm.setup()
    loader = dm.train_dataloader()
    host_batch = next(iter(loader))
    assert host_batch["img"].shape[0] == 4  # the FULL global batch

    # ---- assemble global arrays (local-only: make_array_from_process_
    # local_data runs no collectives), AOT-compile the collective programs,
    # THEN align (survival kit: gloo's 30s rendezvous vs 1-core compile
    # skew — CLAUDE.md) ----
    repl = NamedSharding(mesh, P())
    gimg = global_batch_from_local({"img": full}, mesh, full_local=True)[
        "img"
    ]
    gbatch = next(iter(prefetch_to_device(loader, mesh, size=1)))
    # global shape == the full host batch (synthetic generates at its
    # config size; H must divide the spatial axis)
    assert gbatch["img"].shape == host_batch["img"].shape, gbatch["img"].shape
    assert host_batch["img"].shape[1] % 2 == 0

    # cast inside the program: the wire format may carry uint8 images
    sum_fn = jax.jit(
        lambda x: jnp.sum(x.astype(jnp.float32)), out_shardings=repl
    )
    kernel = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 3, 3, 2)).astype(np.float32)
    )
    conv_fn = jax.jit(
        lambda x: jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        out_shardings=repl,
    )
    sum_fn.lower(gbatch["img"]).compile()
    conv_fn.lower(gimg).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        "precompiled", timeout_in_ms=600_000
    )
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo_warmup")

    # ---- execute: global sum over the prefetch-assembled loader batch ----
    got_sum = float(jax.device_get(sum_fn(gbatch["img"])))
    want_sum = float(host_batch["img"].astype(np.float32).sum())

    # ---- execute: conv halo exchange across the process boundary ----
    got_conv = np.asarray(jax.device_get(conv_fn(gimg)))
    # single-device reference: same program, no mesh
    want_conv = np.asarray(
        jax.jit(
            lambda x: jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )(jnp.asarray(full))
    )

    # ---- to_host under a PROCESS-SPANNING sharding (the multi-process
    # tensor-parallel checkpoint path): gimg's spatial shards live on
    # different hosts, so plain device_get cannot fetch it — to_host
    # allgathers (a collective: both processes call) and EVERY host gets
    # the full value ----
    from vision_mtl_tpu.train.checkpoint import to_host

    assert not gimg.is_fully_addressable
    hosted = to_host({"img": gimg})["img"]
    to_host_exact = bool(np.array_equal(np.asarray(hosted), full))

    # ---- MetricsLogger: ONE shared run dir across processes (KV-store
    # rendezvous), sinks opened by process 0 only — the property the
    # collective Orbax checkpoint path depends on ----
    from vision_mtl_tpu.tracking.tb import MetricsLogger

    tmpdir = os.path.dirname(os.path.abspath(out_path))
    log_dirs = []
    for i in range(2):  # sequence counter must stay aligned across loggers
        lg = MetricsLogger(tmpdir, "mlog", rendezvous_tag=f"mlog_{i}")
        lg.log_metrics({"x": float(pid)}, step=i)
        log_dirs.append(lg.log_dir)
        lg.close()

    # ---- all_processes_agree over the REAL coordination-service KV store
    # (the threaded double in test_multihost.py covers the semantics; this
    # covers the actual client API): uniform True -> True everywhere,
    # divergent per-host flags -> False everywhere ----
    from vision_mtl_tpu.parallel.multihost import all_processes_agree

    agree = [
        all_processes_agree(True, "bench"),
        all_processes_agree(pid == 0, "bench"),
    ]

    result = {
        "process_id": pid,
        "sum": got_sum,
        "expected_sum": want_sum,
        "conv_max_abs_err": float(np.abs(got_conv - want_conv).max()),
        "log_dirs": log_dirs,
        "agree": agree,
        "to_host_exact": to_host_exact,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
