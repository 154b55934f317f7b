"""Unet decoder + segmentation head (smp semantics, NHWC Flax).

Mirrors segmentation_models_pytorch's UnetDecoder as consumed by the
reference's ``Backbone`` (reference utils/model_utils.py:10-43): per block —
nearest x2 upsample, concat encoder skip (if any), then two conv3x3-BN-ReLU.
Decoder channel widths halve from ``decoder_first_channel`` over
``num_decoder_layers`` (reference utils/model_utils.py:21-23:
``[c, c//2, c//4, ...]`` via integer division by 2**i).

``SegmentationHead`` is a 3x3 conv with optional activation (smp's head used
at reference basic_model.py:30-41).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.models.blocks import (
    Conv,
    ConvBNAct,
    FoldedConv,
    FoldedConvBNAct,
)
from vision_mtl_tpu.ops.fold import tile_for_upsample
from vision_mtl_tpu.ops.interpolate import upsample_nearest_2x


def decoder_channels(
    decoder_first_channel: int = 256, num_decoder_layers: int = 5
) -> t.List[int]:
    """Reference utils/model_utils.py:21-23."""
    return [decoder_first_channel // (2**i) for i in range(num_decoder_layers)]


class DecoderBlock(nn.Module):
    out_ch: int
    # CSNet drives blocks without the in-block upsample/concat (it performs
    # its own pad-concat + stitch before the convs — see models/cross_stitch)
    upsample: bool = True
    # space-to-depth folded compute (ops/fold.py): takes the UNFOLDED
    # half-res input, folds via the upsample channel-tile, runs the convs in
    # folded layout and returns a FOLDED output. Exact transform; used for
    # the skip-less full-resolution tail where 128-lane channel padding
    # would otherwise inflate HBM traffic ~4x. Param paths identical to the
    # unfolded block.
    fold: bool = False
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        skip: t.Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if self.fold:
            assert self.upsample and skip is None, "fold supports the tail block"
            x = tile_for_upsample(x)
            x = FoldedConvBNAct(
                self.out_ch, (3, 3), act="relu", dtype=self.dtype,
                name="ConvBNAct_0",
            )(x, train)
            x = FoldedConvBNAct(
                self.out_ch, (3, 3), act="relu", dtype=self.dtype,
                name="ConvBNAct_1",
            )(x, train)
            return x
        if self.upsample:
            x = upsample_nearest_2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBNAct(self.out_ch, (3, 3), act="relu", dtype=self.dtype)(x, train)
        x = ConvBNAct(self.out_ch, (3, 3), act="relu", dtype=self.dtype)(x, train)
        return x


class UnetDecoder(nn.Module):
    """Consumes the encoder pyramid [x, f2, f4, f8, f16, f32] and returns a
    full-resolution feature map with ``channels[-1]`` channels.

    ``fold_tail``: run the final (skip-less, full-resolution) block in
    space-to-depth folded layout and return a FOLDED map — the caller's
    heads consume it folded and unfold only the logits (ops/fold.py)."""

    channels: t.Sequence[int]
    fold_tail: bool = False
    # remat the final N decoder blocks (jax.checkpoint): their full-res
    # activations are recomputed in the backward instead of round-tripping
    # HBM — an opt-in HBM-traffic experiment like fold_tail (param tree
    # identical; see docs/BENCH_NOTES.md for the measurement)
    remat_tail: int = 0
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, features: t.Sequence[jax.Array], train: bool = False
    ) -> jax.Array:
        # smp drops the stride-1 input feature and reverses the rest
        feats = list(features[1:])[::-1]
        head, skips = feats[0], feats[1:]
        x = head
        for i, out_ch in enumerate(self.channels):
            skip = skips[i] if i < len(skips) else None
            fold = self.fold_tail and i == len(self.channels) - 1 and skip is None
            block_cls = DecoderBlock
            if i >= len(self.channels) - self.remat_tail:
                # static_argnums: 0=self(module), 3=train
                block_cls = nn.remat(DecoderBlock, static_argnums=(3,))
            x = block_cls(
                out_ch, fold=fold, dtype=self.dtype, name=f"block_{i}"
            )(x, skip, train)
        return x


class SegmentationHead(nn.Module):
    out_ch: int
    kernel_size: int = 3
    # consume a FOLDED feature map and emit FOLDED logits (param paths and
    # shapes identical to the unfolded head)
    folded: bool = False
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.folded:
            return FoldedConv(
                self.out_ch,
                (self.kernel_size, self.kernel_size),
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        return Conv(
            self.out_ch,
            (self.kernel_size, self.kernel_size),
            dtype=self.dtype,
        )(x)
