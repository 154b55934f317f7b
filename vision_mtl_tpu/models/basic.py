"""Hard-parameter-sharing MTL model ("basic").

One MobileNetV3-Large + Unet backbone shared by two 3x3-conv task heads
(segmentation logits, 1-channel depth logits) — reference
models/basic_model.py:10-60. Trained config uses decoder_first_channel=540
for ~13.3M params (reference utils/pipeline_utils.py:93-98, README.md:134).

Outputs NHWC: {"segm": (B,H,W,num_classes), "depth": (B,H,W,1)} — the NHWC
layout makes the reference's depth-permute quirk (lit_module.py:139) the
natural representation.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.models.mobilenetv3 import MobileNetV3Encoder
from vision_mtl_tpu.models.unet_decoder import (
    SegmentationHead,
    UnetDecoder,
    decoder_channels,
)


class Backbone(nn.Module):
    """Encoder + Unet decoder (reference utils/model_utils.py:10-43)."""

    decoder_first_channel: int = 256
    num_decoder_layers: int = 5
    fold_tail: bool = False
    remat_tail: int = 0
    remat_encoder: bool = False
    dtype: t.Any = jnp.bfloat16

    @property
    def decoder_channels(self) -> t.List[int]:
        return decoder_channels(self.decoder_first_channel, self.num_decoder_layers)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = MobileNetV3Encoder(
            dtype=self.dtype, remat=self.remat_encoder, name="encoder"
        )(x, train)
        return UnetDecoder(
            self.decoder_channels,
            fold_tail=self.fold_tail,
            remat_tail=self.remat_tail,
            dtype=self.dtype,
            name="decoder",
        )(feats, train)


class _ConvParamsWrap(nn.Module):
    """Mirrors the ``Conv`` wrapper's scope level (param-only)."""

    out_ch: int

    @nn.compact
    def __call__(self, in_ch: int):
        from vision_mtl_tpu.models.blocks import _ConvParams

        return _ConvParams(self.out_ch, (3, 3), in_ch, True, name="Conv_0")()


class _HeadParams(nn.Module):
    """SegmentationHead's parameters without applying the conv — lets the
    merged-heads fast path keep checkpoint-identical param placement
    (``{segm,depth}_head/Conv_0/Conv_0/{kernel,bias}``)."""

    out_ch: int

    @nn.compact
    def __call__(self, in_ch: int):
        return _ConvParamsWrap(self.out_ch, name="Conv_0")(in_ch)


class BasicMTLModel(nn.Module):
    segm_classes: int
    decoder_first_channel: int = 256
    num_decoder_layers: int = 5
    # run the full-resolution decoder tail + heads in space-to-depth folded
    # layout (ops/fold.py). EXACT transform but measured SLOWER on v5e
    # (docs/BENCH_NOTES.md round-2 notes) — kept as an opt-in for other
    # hardware generations. Param tree identical either way.
    fold_tail: bool = False
    # remat the final N decoder blocks (see UnetDecoder.remat_tail)
    remat_tail: int = 0
    # remat every encoder block (see MobileNetV3Encoder.remat) — the
    # memory opt-in that matters at high resolution
    remat_encoder: bool = False
    # fuse the two 3x3 heads into one conv (exact; measured faster)
    merge_heads: bool = True
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> t.Dict[str, jax.Array]:
        # the decoder only folds its last block when that block is skip-less
        # (UnetDecoder); mirror the condition here so the heads' layout
        # always matches the feature map they consume (4 encoder skips)
        fold_tail = self.fold_tail and self.num_decoder_layers > 4
        backbone = Backbone(
            decoder_first_channel=self.decoder_first_channel,
            num_decoder_layers=self.num_decoder_layers,
            fold_tail=fold_tail,
            remat_tail=self.remat_tail,
            remat_encoder=self.remat_encoder,
            dtype=self.dtype,
            name="backbone",
        )
        decoder_output = backbone(x, train)
        if self.merge_heads and not fold_tail:
            # one fused conv for both heads: the depth head's single output
            # channel otherwise pads to a full 128-lane MXU pass of its own
            # (measured 4.36 -> 3.79 ms fwd at bs128; docs/BENCH_NOTES.md).
            # Params stay at the reference paths — kernels/biases are
            # concatenated at trace time, so checkpoints are unchanged.
            in_ch = decoder_output.shape[-1]
            sk, sb = _HeadParams(self.segm_classes, name="segm_head")(in_ch)
            dk, db = _HeadParams(1, name="depth_head")(in_ch)
            merged = jax.lax.conv_general_dilated(
                decoder_output.astype(self.dtype),
                jnp.concatenate([sk, dk], axis=-1).astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.concatenate([sb, db]).astype(self.dtype)
            segm = merged[..., : self.segm_classes]
            depth = merged[..., self.segm_classes :]
            return {"segm": segm, "depth": depth}
        segm = SegmentationHead(
            self.segm_classes,
            folded=fold_tail,
            dtype=self.dtype,
            name="segm_head",
        )(decoder_output)
        depth = SegmentationHead(
            1, folded=fold_tail, dtype=self.dtype, name="depth_head"
        )(decoder_output)
        if fold_tail:
            from vision_mtl_tpu.ops.fold import depth_to_space

            segm = depth_to_space(segm)
            depth = depth_to_space(depth)
        # outputs stay in the compute dtype; losses/postprocess upcast
        # per-element (f32 storage here would double logit HBM traffic)
        return {"segm": segm, "depth": depth}
