"""MobileNetV3-Large encoder in Flax (NHWC), built from scratch for TPU.

The reference gets this backbone from segmentation_models_pytorch's
"timm-mobilenetv3_large_100" encoder (reference utils/model_utils.py:25-34);
neither timm nor smp exist in JAX, so the architecture is implemented here:
conv stem (16ch, /2, hardswish) followed by 6 stages of depthwise-separable /
inverted-residual blocks with optional squeeze-excite, then a 1x1 conv head to
960 channels (timm's blocks.6). Feature taps for the Unet decoder are the
standard 5-scale pyramid: (16@/2, 24@/4, 40@/8, 112@/16, 960@/32).

The encoder exposes granular ``run_stem`` / ``run_stage`` / ``run_head``
methods so CSNet can interleave cross-stitch units at stage boundaries
(reference cross_stitch_model.py stitches before timm blocks 1..6 == after
stages 0..5 here).

Weight-porting parity: torch-style explicit conv padding (see blocks.Conv)
means a converted torch/timm state_dict produces identical activations; see
utils/torch_port.py for the converter.
"""

from __future__ import annotations

import dataclasses
import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.models.blocks import (
    ACTIVATIONS,
    BatchNorm,
    Conv,
    SqueezeExcite,
    make_divisible,
)


@dataclasses.dataclass(frozen=True)
class IRSpec:
    """One inverted-residual (or depthwise-separable) block."""

    exp_ch: int
    out_ch: int
    kernel: int
    stride: int
    se: bool
    act: str
    ds: bool = False  # depthwise-separable (no expansion conv)


# mobilenetv3_large_100 stage table (width multiplier 1.0)
MOBILENETV3_LARGE_SPECS: t.Tuple[t.Tuple[IRSpec, ...], ...] = (
    (IRSpec(16, 16, 3, 1, False, "relu", ds=True),),
    (IRSpec(64, 24, 3, 2, False, "relu"), IRSpec(72, 24, 3, 1, False, "relu")),
    (
        IRSpec(72, 40, 5, 2, True, "relu"),
        IRSpec(120, 40, 5, 1, True, "relu"),
        IRSpec(120, 40, 5, 1, True, "relu"),
    ),
    (
        IRSpec(240, 80, 3, 2, False, "hardswish"),
        IRSpec(200, 80, 3, 1, False, "hardswish"),
        IRSpec(184, 80, 3, 1, False, "hardswish"),
        IRSpec(184, 80, 3, 1, False, "hardswish"),
    ),
    (
        IRSpec(480, 112, 3, 1, True, "hardswish"),
        IRSpec(672, 112, 3, 1, True, "hardswish"),
    ),
    (
        IRSpec(672, 160, 5, 2, True, "hardswish"),
        IRSpec(960, 160, 5, 1, True, "hardswish"),
        IRSpec(960, 160, 5, 1, True, "hardswish"),
    ),
)

CONV_HEAD_CH = 960
NUM_STAGES = len(MOBILENETV3_LARGE_SPECS)

# encoder feature channels at strides (1, 2, 4, 8, 16, 32) for depth-5 Unet
ENCODER_OUT_CHANNELS: t.Tuple[int, ...] = (3, 16, 24, 40, 112, 960)
# stage indices after which a pyramid tap is taken (timm feature_info:
# blocks.0 -> 16@/2, blocks.1 -> 24@/4, blocks.2 -> 40@/8, blocks.4 -> 112@/16;
# the 960@/32 tap is the conv head output)
FEATURE_TAP_AFTER_STAGE: t.Tuple[int, ...] = (0, 1, 2, 4)
# per-stage output channels (post-stage running feature)
STAGE_OUT_CHANNELS: t.Tuple[int, ...] = tuple(
    stage[-1].out_ch for stage in MOBILENETV3_LARGE_SPECS
)


class InvertedResidual(nn.Module):
    spec: IRSpec
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        s = self.spec
        act = ACTIVATIONS[s.act]
        shortcut = x
        h = x
        if not s.ds:
            h = Conv(s.exp_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = BatchNorm(use_running_average=not train)(h)
            h = act(h)
        # depthwise
        h = Conv(
            s.exp_ch,
            (s.kernel, s.kernel),
            strides=(s.stride, s.stride),
            feature_group_count=s.exp_ch if not s.ds else h.shape[-1],
            use_bias=False,
            dtype=self.dtype,
        )(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = act(h)
        if s.se:
            h = SqueezeExcite(
                make_divisible(s.exp_ch * 0.25), dtype=self.dtype
            )(h)
        # project
        h = Conv(s.out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        if s.stride == 1 and shortcut.shape[-1] == s.out_ch:
            h = h + shortcut
        return h


class MobileNetV3Encoder(nn.Module):
    """Encoder with 5-scale pyramid taps (plus the raw input as scale 0).

    ``__call__`` returns ``[x, f2, f4, f8, f16, f32]`` matching the smp
    encoder contract the Unet decoder consumes (reference
    utils/model_utils.py:36-43).
    """

    dtype: t.Any = jnp.bfloat16
    # rematerialize each inverted-residual block in the backward pass:
    # only block BOUNDARIES (<=160 ch) stay live for the gradient instead of
    # the expanded internals (up to 960 ch at /16 — the dominant activation
    # memory at high resolution). Cost: one extra forward per block during
    # backward. Measured win at high resolution where HBM capacity caps the
    # batch dim and the batch dim caps pixel throughput
    # (docs/BENCH_NOTES.md round-3 "the batch-dim pixel-rate law").
    # Param tree is identical either way (lifted transform; names come from
    # the setup attribute path).
    remat: bool = False

    def setup(self) -> None:
        self.conv_stem = Conv(
            16, (3, 3), strides=(2, 2), use_bias=False, dtype=self.dtype
        )
        block_cls: t.Any = InvertedResidual
        if self.remat:
            # static_argnums counts the module instance as arg 0; arg 2 is
            # the concrete `train` bool (BatchNorm branches on it)
            block_cls = nn.remat(InvertedResidual, static_argnums=(2,))
        self.stages = [
            [
                block_cls(spec, dtype=self.dtype)
                for spec in stage
            ]
            for stage in MOBILENETV3_LARGE_SPECS
        ]
        self.conv_head = Conv(
            CONV_HEAD_CH, (1, 1), use_bias=False, dtype=self.dtype
        )
        # bn_class: honors the torch-running-var switch (QUIRKS #11) with
        # the same param layout, so `_stem_bn`/`_head_bn` paths are stable
        from vision_mtl_tpu.models.blocks import bn_class

        self._stem_bn = bn_class()(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )
        self._head_bn = bn_class()(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )

    def run_stem(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = self.conv_stem(x)
        h = self._stem_bn(h, use_running_average=not train)
        return ACTIVATIONS["hardswish"](h)

    def run_stage(self, i: int, x: jax.Array, train: bool = False) -> jax.Array:
        for block in self.stages[i]:
            x = block(x, train)
        return x

    def run_head(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = self.conv_head(x)
        h = self._head_bn(h, use_running_average=not train)
        return ACTIVATIONS["hardswish"](h)

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> t.List[jax.Array]:
        feats: t.List[jax.Array] = [x]
        h = self.run_stem(x, train)
        for stage_idx in range(NUM_STAGES):
            h = self.run_stage(stage_idx, h, train)
            if stage_idx in FEATURE_TAP_AFTER_STAGE:
                feats.append(h)
        h = self.run_head(h, train)
        feats.append(h)
        return feats
