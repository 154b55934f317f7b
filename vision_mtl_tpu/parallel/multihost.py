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

from vision_mtl_tpu.parallel.mesh import batch_sharding


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when running under a multi-process launcher
    (TPU pod runtimes autodetect coordinator/process env); safe no-op for
    single-process runs."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        import os

        if "COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception as e:  # pragma: no cover - depends on launcher env
        print(f"jax.distributed.initialize skipped: {e}")


def process_index_range(
    dataset_len: int,
    process_index: t.Optional[int] = None,
    process_count: t.Optional[int] = None,
) -> range:
    """Contiguous per-host slice of dataset indices (host-sharded loading)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = dataset_len // pc
    start = pi * per
    end = dataset_len if pi == pc - 1 else start + per
    return range(start, end)


def global_batch_from_local(
    local_batch: t.Dict[str, np.ndarray], mesh: jax.sharding.Mesh
) -> t.Dict[str, jax.Array]:
    """Assemble the global sharded batch from this process's local shard.

    ``local_batch`` leaves carry this host's ``global_batch/process_count``
    samples; the result is a global jax.Array sharded over the mesh's data
    (and spatial) axes, with no cross-host gathering of array data.
    """
    shardings = batch_sharding(mesh, local_batch)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local_batch,
        shardings,
    )
