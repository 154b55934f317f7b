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
    dtype: t.Any = jnp.bfloat16

    @property
    def decoder_channels(self) -> t.List[int]:
        return decoder_channels(self.decoder_first_channel, self.num_decoder_layers)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = MobileNetV3Encoder(dtype=self.dtype, name="encoder")(x, train)
        return UnetDecoder(
            self.decoder_channels, dtype=self.dtype, name="decoder"
        )(feats, train)


class BasicMTLModel(nn.Module):
    segm_classes: int
    decoder_first_channel: int = 256
    num_decoder_layers: int = 5
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> t.Dict[str, jax.Array]:
        backbone = Backbone(
            decoder_first_channel=self.decoder_first_channel,
            num_decoder_layers=self.num_decoder_layers,
            dtype=self.dtype,
            name="backbone",
        )
        decoder_output = backbone(x, train)
        head_ch = backbone.decoder_channels[-1]
        del head_ch  # head input channels are inferred from the feature map
        segm = SegmentationHead(
            self.segm_classes, dtype=self.dtype, name="segm_head"
        )(decoder_output)
        depth = SegmentationHead(1, dtype=self.dtype, name="depth_head")(
            decoder_output
        )
        # outputs stay in the compute dtype; losses/postprocess upcast
        # per-element (f32 storage here would double logit HBM traffic)
        return {"segm": segm, "depth": depth}
