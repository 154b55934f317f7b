"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Each process owns 2 virtual CPU devices and its half of the global batch;
the test proves the multihost helpers assemble a correct GLOBAL sharded
array and that a jitted global reduction sees every host's data without any
explicit cross-host gathers in user code.

Usage: python tests/_mp_worker.py <process_id> <coordinator_port> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np

    from vision_mtl_tpu.parallel.mesh import create_mesh
    from vision_mtl_tpu.parallel.multihost import (
        global_batch_from_local,
        process_index_range,
    )

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    # host-sharded loading: this process's contiguous slice of a dataset
    idx = process_index_range(8)
    assert len(idx) == 4
    assert idx[0] == (0 if pid == 0 else 4)

    # the deterministic global batch, of which each host materializes half
    full = np.arange(4 * 8 * 6 * 3, dtype=np.float32).reshape(4, 8, 6, 3)
    local = full[pid * 2 : (pid + 1) * 2]

    mesh = create_mesh("data:4")
    gbatch = global_batch_from_local({"img": local}, mesh)
    img = gbatch["img"]
    assert img.shape == (4, 8, 6, 3), img.shape

    from jax.sharding import NamedSharding, PartitionSpec as P

    total = jax.jit(lambda x: jnp.sum(x))(img)
    # replicate the per-sample output inside the compiled program (an
    # all-gather over the data axis) so every process can fetch it — shards
    # of a process-spanning array are not addressable from one host
    mean_per_sample = jax.jit(
        lambda x: jnp.mean(x, axis=(1, 2, 3)),
        out_shardings=NamedSharding(mesh, P()),
    )(img)

    result = {
        "process_id": pid,
        "total": float(total),
        "expected_total": float(full.sum()),
        "mean_per_sample": np.asarray(
            jax.device_get(mean_per_sample)
        ).tolist(),
        "expected_mean_per_sample": full.mean(axis=(1, 2, 3)).tolist(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
