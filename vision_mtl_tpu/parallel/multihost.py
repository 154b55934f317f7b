"""Multi-host (multi-process) data parallelism.

The reference is single-process/single-device; this is the TPU-native scaling
path (SURVEY.md §5.8): ``jax.distributed`` process groups over a pod, each
host decoding only its shard of the dataset and publishing it into the global
sharded batch with ``jax.make_array_from_process_local_data``. The jitted
train step is unchanged — GSPMD sees one global array regardless of process
count. DCN-spanning meshes are out of scope (single-pod ICI target).
"""

from __future__ import annotations

import typing as t

import jax
import numpy as np

from vision_mtl_tpu.parallel.mesh import batch_sharding, process_spanning_axes


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when running under a multi-process launcher
    (TPU pod runtimes autodetect coordinator/process env); safe no-op for
    single-process runs.

    ORDER MATTERS: the launcher check must be a pure ``os.environ`` test —
    any jax API call (even ``jax.process_count()``) initializes the XLA
    backend, after which ``jax.distributed.initialize()`` refuses to run and
    every process would silently train as an independent single-process job.
    Call this before anything else touches jax."""
    import os

    if not (
        "COORDINATOR_ADDRESS" in os.environ
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    ):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:  # pragma: no cover - depends on launcher env
        if "already initialized" in str(e):
            return  # the runtime beat us to it — fine
        raise RuntimeError(
            "jax.distributed.initialize failed under a multi-process "
            "launcher; if the XLA backend was already initialized, call "
            "maybe_initialize_distributed() before any other jax API use. "
            f"Original error: {e}"
        ) from e


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
