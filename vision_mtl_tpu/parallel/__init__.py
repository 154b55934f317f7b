from vision_mtl_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    parse_mesh_shape,
    replicated_sharding,
)
