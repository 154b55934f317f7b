from vision_mtl_tpu.data.datamodule import MTLDataModule  # noqa: F401
