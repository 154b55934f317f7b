from vision_mtl_tpu.ops.interpolate import (  # noqa: F401
    resize_bilinear_align_corners,
    upsample_nearest_2x,
    pad_to_match,
)
