"""Model zoo — mirrors the reference's ``build_model`` switch
(reference utils/pipeline_utils.py:80-136) with the same trained configs:

  * basic: decoder_first_channel=540, 5 decoder layers (~13.3M params)
  * mtan:  encoder_first_channel=32, 4 encoder levels, hidden=128
  * csnet: two per-task Unets (decoder_first_channel=256) + stitch units,
           channel-wise stitching by default
"""

from __future__ import annotations

import argparse
import typing as t

import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.cfg import DataConfig


def build_model(
    args: argparse.Namespace, data_cfg: DataConfig, dtype: t.Any = jnp.bfloat16
) -> nn.Module:
    # global trace-time switch (same param tree either way); set here so
    # every construction surface — CLI, eval harness reloading a run's
    # train_args.yaml, serving — applies the run's recorded BN semantics.
    # Always reset (attr if present, else the VMTL_TORCH_BN_VAR env
    # default) so a build whose args lack the attribute cannot silently
    # inherit a previous build's setting in the same process.
    import os

    from vision_mtl_tpu.models.blocks import set_torch_bn_running_var

    set_torch_bn_running_var(
        bool(
            getattr(
                args,
                "torch_bn_var",
                os.environ.get("VMTL_TORCH_BN_VAR", "0") == "1",
            )
        )
    )

    model_name = getattr(args, "model_name", "basic")
    if model_name == "basic":
        from vision_mtl_tpu.models.basic import BasicMTLModel

        return BasicMTLModel(
            segm_classes=data_cfg.num_classes,
            decoder_first_channel=540,
            num_decoder_layers=5,
            # space-to-depth folded tail (exact transform, ops/fold.py);
            # measured SLOWER on v5e (BENCH_NOTES round 2) — opt-in only
            fold_tail=getattr(args, "fold_tail", False),
            # memory-saving remat of the final N decoder blocks (measured
            # slower on v5e — BENCH_NOTES; for configs that would OOM)
            remat_tail=getattr(args, "remat_tail", 0),
            # per-block encoder remat: the memory opt-in that pays at high
            # resolution (unlocks larger batch dims — BENCH_NOTES round 3)
            remat_encoder=getattr(args, "remat_encoder", False),
            merge_heads=getattr(args, "merge_heads", True),
            dtype=dtype,
        )
    if model_name == "mtan":
        from vision_mtl_tpu.models.mtan import MTANMiniUnet

        return MTANMiniUnet(
            map_tasks_to_num_channels={
                "depth": 1,
                "segm": data_cfg.num_classes,
            },
            task_subnets_hidden_channels=128,
            encoder_first_channel=32,
            encoder_num_channels=4,
            # memory opt-ins: measured slower at bs128/128x256 (BENCH_NOTES)
            # but let activation-capped configs compile at all
            remat_attention=getattr(args, "remat_attention", False),
            remat_shared=getattr(args, "remat_shared", False),
            fold_tasks=getattr(args, "fold_tasks", False),
            dtype=dtype,
        )
    if model_name == "csnet":
        from vision_mtl_tpu.models.cross_stitch import CSNet

        return CSNet(
            task_channels={"depth": 1, "segm": data_cfg.num_classes},
            decoder_first_channel=256,
            num_decoder_layers=5,
            channel_wise_stitching=getattr(args, "channel_wise_stitching", True),
            # same high-resolution memory opt-ins as basic's (both task
            # encoders are MobileNetV3Encoders; remat_tail wraps the final
            # N blocks of each task decoder)
            remat_encoder=getattr(args, "remat_encoder", False),
            remat_tail=getattr(args, "remat_tail", 0),
            dtype=dtype,
        )
    raise NotImplementedError(f"Unknown model name: {model_name}")
