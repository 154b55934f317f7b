"""vision_mtl_tpu — a TPU-native multi-task learning framework for dense scene
understanding (joint semantic segmentation + depth estimation).

Re-designed from scratch for TPU (JAX / XLA / Pallas / jit + sharding) with the
same capabilities as the PyTorch reference `vision_mtl`
(/root/reference/vision_mtl): three MTL paradigms (hard parameter sharing,
cross-stitch soft sharing, MTAN attention modulation) on Cityscapes and NYUv2,
plus the full pipeline around them (config/CLI, data, losses, metrics,
training/eval loops, checkpointing, tracking, hyperparameter search, vis).

Design stance (TPU-first, not a port):
  * NHWC tensor layout everywhere (TPU-native; the reference is NCHW).
  * Pure-functional core: models are Flax modules returning ``{"segm","depth"}``
    pytrees; the train step is a single jit-compiled function
    ``train_step(state, batch) -> (state, metrics)``.
  * Scaling via ``jax.sharding.Mesh`` + jit shardings (data parallelism over
    the batch axis, optional spatial sharding of H for large images); XLA
    inserts the collectives (grad psum, BN cross-replica stats, conv halo
    exchange) automatically.
  * bfloat16 compute / float32 params & batch-norm stats.
  * Host-side imperative shell (CLI, logging, plateau LR schedule, optuna-style
    sweeps) mirrors the reference's public surface flag-for-flag.
"""

__version__ = "0.1.0"

from vision_mtl_tpu.cfg import cfg, cityscapes_data_cfg, nyuv2_data_cfg  # noqa: F401
