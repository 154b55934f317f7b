"""Multi-host (multi-process) data parallelism.

The reference is single-process/single-device; this is the TPU-native scaling
path (SURVEY.md §5.8): ``jax.distributed`` process groups over a pod, each
host decoding only its shard of the dataset and publishing it into the global
sharded batch with ``jax.make_array_from_process_local_data``. The jitted
train step is unchanged — GSPMD sees one global array regardless of process
count. DCN-spanning meshes are out of scope (single-pod ICI target).
"""

from __future__ import annotations

import itertools
import typing as t

import jax
import numpy as np

from vision_mtl_tpu.parallel.mesh import batch_sharding, process_spanning_axes


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when running under a multi-process
    launcher; safe no-op for single-process runs.

    Recognized launch signals (checked in order):
      * explicit env — ``JAX_COORDINATOR_ADDRESS`` (jax's native spelling)
        or ``COORDINATOR_ADDRESS``, optionally with
        ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` (jax 0.9 reads only the
        coordinator address from env; process count/id must be passed as
        arguments, so this shim forwards them);
      * multislice TPU — ``MEGASCALE_COORDINATOR_ADDRESS`` (jax's megascale
        cluster detector resolves the rest);
      * single-slice TPU pod — ``TPU_WORKER_HOSTNAMES`` listing MULTIPLE
        workers (the TPU cluster detector resolves the rest; a single-host
        value, e.g. ``localhost`` on dev boxes, must NOT trigger
        distributed init).

    A detected launch that fails to initialize RAISES — falling back
    silently would let every process train as an independent
    single-process job, corrupting the run without any error.

    ORDER MATTERS: the launcher check must be a pure ``os.environ`` test —
    any jax API call (even ``jax.process_count()``) initializes the XLA
    backend, after which ``jax.distributed.initialize()`` refuses to run.
    Call this before anything else touches jax."""
    import os

    env = os.environ
    coord = env.get("JAX_COORDINATOR_ADDRESS") or env.get(
        "COORDINATOR_ADDRESS"
    )
    tpu_workers = env.get("TPU_WORKER_HOSTNAMES", "")
    auto = "MEGASCALE_COORDINATOR_ADDRESS" in env or "," in tpu_workers
    if coord is None and not auto:
        if env.get("JAX_NUM_PROCESSES") or env.get("JAX_PROCESS_ID"):
            # two-of-three launcher env IS a detected launch: falling back
            # silently would run N independent single-process trainings
            # (the corruption the docstring promises to raise on)
            raise RuntimeError(
                "multi-process launch detected (JAX_NUM_PROCESSES="
                f"{env.get('JAX_NUM_PROCESSES')!r} / JAX_PROCESS_ID="
                f"{env.get('JAX_PROCESS_ID')!r} set) but no coordinator "
                "address; set JAX_COORDINATOR_ADDRESS (or "
                "COORDINATOR_ADDRESS) in the launcher environment."
            )
        return
    kwargs: t.Dict[str, t.Any] = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
        try:
            if env.get("JAX_NUM_PROCESSES"):
                kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
            if env.get("JAX_PROCESS_ID"):
                kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
        except ValueError as e:
            raise RuntimeError(
                "multi-process launch detected but JAX_NUM_PROCESSES="
                f"{env.get('JAX_NUM_PROCESSES')!r} / JAX_PROCESS_ID="
                f"{env.get('JAX_PROCESS_ID')!r} are not integers; fix the "
                "launcher environment."
            ) from e
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # pragma: no cover - depends on launcher env
        if "already initialized" in str(e):
            return  # the runtime beat us to it — fine
        raise RuntimeError(
            "jax.distributed.initialize failed under a multi-process "
            "launcher; if the XLA backend was already initialized, call "
            "maybe_initialize_distributed() before any other jax API use. "
            f"Original error: {e}"
        ) from e
    except (ValueError, TypeError) as e:
        raise RuntimeError(
            "multi-process launch detected (coordinator/pod env set) but "
            "jax.distributed.initialize could not resolve the process "
            "group. Outside TPU/Slurm/Open MPI launchers set ALL of "
            "JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES and "
            f"JAX_PROCESS_ID. Original error: {e}"
        ) from e


def shutdown_distributed() -> None:
    """Coordinated disconnect at the end of a multi-process run. Leaving it
    to interpreter teardown races: the leader (process 0) hosts the
    coordination service, and if its teardown wins the race a
    still-connected peer polls a fatal 'leader died' error and aborts —
    an exit-code-failure ending to a SUCCESSFUL run (observed with
    scripts/launch_local_pod.sh). No-op when jax.distributed never
    initialized."""
    try:
        from jax._src import distributed

        if distributed.global_state.client is None:
            return
        # aligns all processes before any of them tears down: every process
        # must reach end-of-run for this to pass, which is exactly the SPMD
        # contract of the pipeline
        client = distributed.global_state.client
        client.wait_at_barrier("vmtl_shutdown", timeout_in_ms=600_000)
        jax.distributed.shutdown()
    except Exception as e:  # pragma: no cover - teardown best-effort
        print(f"jax.distributed shutdown: {type(e).__name__}: {e}")


def process_info() -> t.Tuple[int, int]:
    """(process_index, process_count); (0, 1) when jax is unavailable.
    Shared by the loader, logger, and pipeline — one fallback semantic.
    NOTE: touches the jax backend; never call before
    :func:`maybe_initialize_distributed`."""
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def process_info_no_backend() -> t.Tuple[int, int]:
    """Like :func:`process_info`, but read from the jax.distributed runtime
    state WITHOUT initializing a device backend. Multi-process jax exists
    only through ``jax.distributed.initialize`` (which populates this state
    before any backend is live), so the answer is identical — while a
    host-only caller (e.g. iterating a DataLoader in a loader benchmark)
    stays free of the expensive/remote backend bring-up that
    ``jax.process_index()`` would trigger."""
    try:
        from jax._src import distributed

        st = distributed.global_state
        if st.client is not None and st.num_processes:
            return int(st.process_id), int(st.num_processes)
    except Exception:
        pass
    return 0, 1


_agree_seq = itertools.count()


def all_processes_agree(flag: bool, what: str) -> bool:
    """True iff ``flag`` is True on EVERY jax.distributed process.

    Guards collective programs behind per-host state that may legitimately
    diverge (e.g. one host's benchmark-batch load failed): dispatching the
    collective on a strict subset of processes hangs the whole job at the
    rendezvous. Pure coordination-service KV traffic (gRPC) — no device
    program, so the gloo 30s first-collective limit doesn't apply.

    Itself collective: every process must call it the same number of times
    with the same ``what`` (SPMD lockstep); a per-process call counter
    namespaces repeat calls. Single-process: returns ``flag`` unchanged."""
    pi, pc = process_info()
    seq = next(_agree_seq)
    if pc <= 1:
        return flag
    from jax._src import distributed

    client = distributed.global_state.client
    tag = f"vmtl_agree:{what}:{seq}"
    client.key_value_set(f"{tag}:{pi}", "1" if flag else "0")
    return all(
        client.blocking_key_value_get(f"{tag}:{i}", 600_000) == "1"
        for i in range(pc)
    )


def process_index_range(
    dataset_len: int,
    process_index: t.Optional[int] = None,
    process_count: t.Optional[int] = None,
) -> range:
    """Contiguous per-host slice of dataset indices (host-sharded loading).

    Every host gets EXACTLY ``dataset_len // process_count`` samples — the
    remainder is dropped. Equal local lengths are load-bearing: hosts drive
    the SPMD step loop independently, and a host with one extra batch would
    dispatch a collective the others never join (distributed hang)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = dataset_len // pc
    start = pi * per
    return range(start, start + per)


def global_batch_from_local(
    local_batch: t.Dict[str, np.ndarray],
    mesh: jax.sharding.Mesh,
    full_local: bool = False,
) -> t.Dict[str, jax.Array]:
    """Assemble the global sharded batch from this process's local data.

    Default (``full_local=False``): ``local_batch`` leaves carry this host's
    ``global_batch/process_count`` row-slice; the result is a global
    jax.Array sharded over the mesh's data (and spatial) axes, with no
    cross-host gathering of array data. Row slicing is only consistent when
    processes span the mesh's ``data`` axis alone — any other spanning axis
    is rejected here rather than mis-assembled.

    ``full_local=True``: every host holds the FULL (bitwise-identical)
    global batch; jax slices each device's shard out of it
    (``global_shape == local_data.shape`` semantics). This is the required
    mode for process-spanning spatial/model meshes, where a host's shards
    are H-slices (or replicas) of every row. DataLoader(shard_rows=False)
    produces such batches.
    """
    shardings = batch_sharding(mesh, local_batch)
    if full_local:
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                s, np.asarray(x), np.asarray(x).shape
            ),
            local_batch,
            shardings,
        )
    span = set(process_spanning_axes(mesh))
    if span - {"data"}:
        raise ValueError(
            f"mesh axes {sorted(span - {'data'})} span process boundaries: "
            "host-sharded row-sliced loading cannot express their local "
            "shards. Construct loaders with shard_rows=False (datamodule "
            "attribute shard_rows) so every host decodes the full global "
            "batch, and pass full_local=True here (put_batch does both "
            "automatically via configure_host_sharded_loading)."
        )
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local_batch,
        shardings,
    )
