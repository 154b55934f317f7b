"""Device mesh + sharding layout.

The reference is strictly single-device (SURVEY.md §2 component #22); scaling
is a first-class addition here, done the TPU way: a ``jax.sharding.Mesh`` over
ICI with jit/GSPMD shardings instead of NCCL-style collective calls.

Axes:
  * ``data``    — batch dimension (pure data parallelism). Gradients and
                  BatchNorm statistics become global automatically: the loss
                  mean over a sharded batch lowers to psum/pmean collectives
                  inserted by the SPMD partitioner.
  * ``spatial`` — optional sharding of the image H dimension for large
                  inputs (the dense-prediction analog of sequence
                  parallelism, SURVEY.md §5.7). XLA inserts halo exchanges
                  for the convolutions at shard boundaries.
  * ``model``   — tensor parallelism: large conv kernels' output-channel
                  dim is sharded (see :func:`param_shardings`); GSPMD
                  all-gathers activations where a consumer needs them.

Mesh spec strings: ``"data:-1"`` (all devices), ``"data:4,spatial:2"``,
``"data:2,model:2"``.
"""

from __future__ import annotations

import typing as t

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: the full vocabulary of mesh axes the framework understands
MESH_AXES = ("data", "spatial", "model")


def parse_mesh_shape(
    spec: str, num_devices: t.Optional[int] = None
) -> t.Dict[str, int]:
    """Parse "axis:size,axis:size" with at most one -1 wildcard."""
    if num_devices is None:
        num_devices = len(jax.devices())
    axes: t.Dict[str, int] = {}
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        if name not in MESH_AXES:
            raise ValueError(
                f"Unknown mesh axis {name!r} in {spec!r}; "
                f"valid axes: {', '.join(MESH_AXES)}"
            )
        if name in axes:
            raise ValueError(f"Duplicate mesh axis {name!r} in {spec!r}")
        axes[name] = int(size) if size else -1
    wild = [k for k, v in axes.items() if v == -1]
    if len(wild) > 1:
        raise ValueError(f"At most one -1 in mesh spec, got {spec!r}")
    fixed = int(np.prod([v for v in axes.values() if v != -1]))
    if wild:
        if num_devices % fixed:
            raise ValueError(
                f"Mesh spec {spec!r} does not divide {num_devices} devices"
            )
        axes[wild[0]] = num_devices // fixed
    total = int(np.prod(list(axes.values())))
    if total != num_devices:
        raise ValueError(
            f"Mesh spec {spec!r} uses {total} devices, have {num_devices}"
        )
    return axes


def create_mesh(
    spec: str = "data:-1", devices: t.Optional[t.Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(spec, len(devices))
    dev_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_spanning_axes(mesh: t.Any) -> t.Tuple[str, ...]:
    """Mesh axes whose shards live on more than one process: walking along
    the axis (with every other axis held fixed) crosses a process boundary.

    Host-sharded row-sliced loading (data/loader.py) is only consistent when
    this is a subset of ``{"data"}`` — for spatial/model process-spanning
    meshes each host's local slice is NOT a row range of the batch."""
    devs = mesh.devices
    pids = np.vectorize(lambda d: getattr(d, "process_index", 0))(devs)
    out: t.List[str] = []
    for i, name in enumerate(mesh.axis_names):
        moved = np.moveaxis(pids, i, 0).reshape(pids.shape[i], -1)
        if (moved != moved[0]).any():
            out.append(name)
    return tuple(out)


def _leaf_spec(ndim: int, mesh: Mesh) -> P:
    """Batch leaves: dim0 on 'data'; dim1 (H) on 'spatial' when present."""
    parts: t.List[t.Any] = []
    if ndim >= 1:
        parts.append("data" if "data" in mesh.axis_names else None)
    if ndim >= 2:
        parts.append(
            "spatial"
            if ("spatial" in mesh.axis_names and mesh.shape["spatial"] > 1 and ndim >= 3)
            else None
        )
    while len(parts) < ndim:
        parts.append(None)
    return P(*parts)


def batch_sharding(mesh: Mesh, batch: t.Any) -> t.Any:
    """A pytree of NamedShardings matching ``batch``'s structure."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _leaf_spec(np.ndim(x), mesh)), batch
    )


def param_shardings(mesh: Mesh, params: t.Any, min_size: int = 2**16) -> t.Any:
    """Tensor-parallel param layout: shard large conv kernels' output-channel
    (last) dim over the mesh's ``model`` axis; everything else replicated.

    For conv nets this is the natural tp axis — each shard computes a slice
    of the output feature maps and GSPMD all-gathers activations where a
    following op needs them. Only kernels whose size exceeds ``min_size`` and
    whose out-channels divide the axis are sharded (tiny tensors cost more in
    collectives than they save in memory/FLOPs).
    """
    model_size = dict(mesh.shape).get("model", 1)

    def spec(x: t.Any) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if (
            model_size > 1
            and len(shape) >= 2
            and int(np.prod(shape)) >= min_size
            and shape[-1] % model_size == 0
        ):
            parts: t.List[t.Any] = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_state(state: t.Any, mesh: Mesh, min_size: int = 2**16) -> t.Any:
    """Place a TrainState onto ``mesh``: params and their Adam moments get
    the tensor-parallel layout from :func:`param_shardings` (sharded only
    when the mesh has a ``model`` axis), everything else (batch stats, step
    counter, lr hyperparams) is replicated.

    This is the single entry point that makes ``--mesh_shape …,model:K``
    real in the training path — without it a model axis would exist in the
    mesh but shard nothing.
    """
    if jax.process_count() > 1:
        # multi-process: device_put onto a process-spanning sharding runs a
        # cross-host consistency allgather whose gloo rendezvous times out
        # (30s) under compile skew; make_array_from_callback builds the
        # global array purely from local data — every host already holds
        # the full (identically-initialized) value
        def put(x: t.Any, s: NamedSharding) -> jax.Array:
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, s, lambda idx: host[idx]
            )

    else:
        put = jax.device_put

    def put_tree(tree: t.Any, shardings: t.Any) -> t.Any:
        return jax.tree.map(put, tree, shardings)

    repl = NamedSharding(mesh, P())
    new = state.replace(
        params=put_tree(
            state.params, param_shardings(mesh, state.params, min_size)
        ),
        opt_state=put_tree(
            state.opt_state, param_shardings(mesh, state.opt_state, min_size)
        ),
    )
    if getattr(state, "batch_stats", None) is not None:
        new = new.replace(
            batch_stats=put_tree(
                state.batch_stats,
                jax.tree.map(lambda _: repl, state.batch_stats),
            )
        )
    if getattr(state, "step", None) is not None:
        new = new.replace(step=put(state.step, repl))
    return new


def put_replicated(tree: t.Any, mesh: Mesh) -> t.Any:
    """Fully-replicated placement of host data on the global mesh.

    Multi-process: every host must hold IDENTICAL data (e.g. the fixed
    benchmark batch); assembly goes through
    ``make_array_from_process_local_data`` because ``jax.device_put`` onto
    a process-spanning sharding runs a cross-host consistency allgather
    that times out under compile skew (CLAUDE.md gotchas)."""
    rep = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x), np.asarray(x).shape
            ),
            tree,
        )
    return jax.device_put(tree, rep)


def replicate_gather(mesh: Mesh) -> t.Callable[[t.Any], t.Any]:
    """Jitted identity with replicated out_shardings — the compiled
    all-gather that makes a process-spanning sharded tree locally
    fetchable (``device_get``-able) on EVERY process. Collective: all
    processes must call it on the same arrays."""
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def put_batch(
    batch: t.Any, mesh: t.Optional[Mesh], full_local: bool = False
) -> t.Any:
    """Transfer a host batch to devices with the mesh layout (or plain
    device_put without a mesh). Under jax.distributed the host batch is
    this process's LOCAL shard (the loader decodes only its slice —
    data/loader.py host-sharded loading) and the result is the assembled
    GLOBAL sharded array; ``full_local=True`` says every host holds the
    FULL (identical) global batch instead — required when the mesh's
    process-spanning axes are not just ``data`` (see
    :func:`process_spanning_axes`)."""
    if mesh is None:
        return jax.tree.map(jax.device_put, batch)
    if jax.process_count() > 1:
        from vision_mtl_tpu.parallel.multihost import global_batch_from_local

        return global_batch_from_local(batch, mesh, full_local=full_local)
    return jax.device_put(batch, batch_sharding(mesh, batch))
