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

from vision_mtl_tpu.models.blocks import Conv, ConvBNAct
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
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        skip: t.Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if self.upsample:
            x = upsample_nearest_2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBNAct(self.out_ch, (3, 3), act="relu", dtype=self.dtype)(x, train)
        x = ConvBNAct(self.out_ch, (3, 3), act="relu", dtype=self.dtype)(x, train)
        return x


class UnetDecoder(nn.Module):
    """Consumes the encoder pyramid [x, f2, f4, f8, f16, f32] and returns a
    full-resolution feature map with ``channels[-1]`` channels."""

    channels: t.Sequence[int]
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
            x = DecoderBlock(out_ch, dtype=self.dtype, name=f"block_{i}")(
                x, skip, train
            )
        return x


class SegmentationHead(nn.Module):
    out_ch: int
    kernel_size: int = 3
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv(
            self.out_ch,
            (self.kernel_size, self.kernel_size),
            dtype=self.dtype,
        )(x)
