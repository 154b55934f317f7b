"""Cross-Stitch network (CSNet) — soft parameter sharing via stitch units.

TPU-first re-architecture of the reference CSNet (reference
models/cross_stitch_model.py:15-201). The reference discovers stitch points
at runtime by walking `named_modules` of two per-task torch Unets and
re-interpreting their forward pass layer-by-layer in Python — reflection that
cannot be traced/jitted. Here the per-task Unet forward is expressed
explicitly with stitch units as first-class modules at the SAME topological
positions, so the whole network is one static XLA graph:

  * encoder stitches: at entry of timm blocks 1..6 == after encoder stages
    0..5 here (reference regex `0.encoder.model.blocks.(\\d+)$`,
    cross_stitch_model.py:48, applied :143-156);
  * skip features cached at entry of blocks 1,2,3,5 == outputs of stages
    0,1,2,4 (16@/2, 24@/4, 40@/8, 112@/16), cached PRE-stitch
    (cross_stitch_model.py:111-120);
  * decoder stitches: at entry of each of the 5 decoder blocks, after the
    skip merge (cross_stitch_model.py:121-134).

Faithfully reproduced reference behaviors (docs/QUIRKS.md):

  * quirk #1 — the stitch einsum `"aa,abcij->abcij"` has a repeated subscript,
    so only W[t,t] scales task t's features: a per-task (per-channel) gate,
    not a cross-task mix. Reproduced by default; ``full_mix=True`` enables the
    true (T,T) mixing the README describes.
  * decoder skip merge ZERO-PADS the coarse features up to the skip's spatial
    size instead of upsampling (the reference's leaf-module walk loses smp's
    in-block `F.interpolate`, and `concat_slightly_diff_sized_tensors` pads
    across the 2x scale gap); the last decoder block gets a nearest x2
    upsample (cross_stitch_model.py:131-134). Reproduced by default;
    ``upsample_skips=True`` enables proper nearest-2x upsampling.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.models.mobilenetv3 import (
    CONV_HEAD_CH,
    FEATURE_TAP_AFTER_STAGE,
    MobileNetV3Encoder,
    NUM_STAGES,
    STAGE_OUT_CHANNELS,
)
from vision_mtl_tpu.models.unet_decoder import (
    DecoderBlock,
    SegmentationHead,
    decoder_channels,
)
from vision_mtl_tpu.ops.interpolate import pad_to_match, upsample_nearest_2x


def get_joint_layer_names(num_decoder_layers: int = 5) -> t.List[str]:
    """Names of the stitch-eligible positions in CSNet, in forward order —
    API-parity shim for the reference's unused
    ``model_utils.get_joint_layer_names`` (model_utils.py:83-97). The
    reference filtered torch ``named_modules`` strings (one encoder block /
    decoder block per level); here stitch positions are first-class modules
    (see the module docstring for the topology mapping), so the names
    enumerate them directly: one per encoder stage entry (timm blocks 1..6
    == post-stage 0..5) and one per decoder block entry."""
    enc = [f"encoder.stage{i}" for i in range(NUM_STAGES)]
    dec = [f"decoder.block{i}" for i in range(num_decoder_layers)]
    return enc + dec


class CrossStitchLayer(nn.Module):
    """Learnable (T,T) or (T,T,C) stitch unit, uniform[0,1) init (reference
    cross_stitch_model.py:15-37). Applied to a stacked (T, B, H, W, C) tensor.

    Default semantics match the reference einsum exactly: diagonal-only
    scaling (quirk #1). ``full_mix=True`` applies the intended full mix
    out[a] = sum_b W[a,b] * x[b].
    """

    num_tasks: int
    num_channels: t.Optional[int] = None  # channel-wise when set
    full_mix: bool = False

    @nn.compact
    def __call__(self, stacked: jax.Array) -> jax.Array:
        shape: t.Tuple[int, ...] = (self.num_tasks, self.num_tasks)
        if self.num_channels is not None:
            shape = shape + (self.num_channels,)
        w = self.param(
            "weights", nn.initializers.uniform(scale=1.0), shape, jnp.float32
        )
        x = stacked.astype(jnp.float32)
        if self.full_mix:
            if self.num_channels is not None:
                y = jnp.einsum("abc,bhwyc->ahwyc", w, x)
            else:
                y = jnp.einsum("ab,bhwyc->ahwyc", w, x)
        else:
            # diagonal: W[a,a,(c)] * x[a] — reference "aa(c),abcij->abcij"
            diag = jnp.diagonal(w, axis1=0, axis2=1)  # (T,) or (C,T)
            if self.num_channels is not None:
                diag = jnp.moveaxis(diag, -1, 0)  # (T, C)
                y = x * diag[:, None, None, None, :]
            else:
                y = x * diag[:, None, None, None, None]
        return y.astype(stacked.dtype)


class CSNet(nn.Module):
    """Two (or more) per-task MobileNetV3-Unet networks joined by stitch
    units. Task outputs keep the reference contract:
    {"depth": (B,H,W,1), "segm": (B,H,W,num_classes)}."""

    task_channels: t.Dict[str, int]
    decoder_first_channel: int = 256
    num_decoder_layers: int = 5
    channel_wise_stitching: bool = True
    full_mix: bool = False
    upsample_skips: bool = False
    # per-block remat of both task encoders (MobileNetV3Encoder.remat) —
    # the high-resolution memory opt-in; the stitched run_stem/run_stage
    # path uses the same wrapped blocks (docs/BENCH_NOTES.md round-3)
    remat_encoder: bool = False
    # remat the final N decoder blocks of EACH task decoder (the csnet
    # counterpart of UnetDecoder.remat_tail — full-res activations dominate)
    remat_tail: int = 0
    dtype: t.Any = jnp.bfloat16

    def setup(self) -> None:
        self.task_names = list(self.task_channels.keys())
        n = len(self.task_names)
        dch = decoder_channels(self.decoder_first_channel, self.num_decoder_layers)
        skip_ch = [16, 24, 40, 112]  # outputs of stages 0,1,2,4

        self.encoders = [
            MobileNetV3Encoder(dtype=self.dtype, remat=self.remat_encoder)
            for _ in self.task_names
        ]
        def dec_block_cls(d: int) -> t.Any:
            if d >= self.num_decoder_layers - self.remat_tail:
                # static_argnums: module instance is arg 0; arg 3 is the
                # concrete `train` bool
                return nn.remat(DecoderBlock, static_argnums=(3,))
            return DecoderBlock

        self.decoders = [
            [
                dec_block_cls(d)(out_ch, upsample=False, dtype=self.dtype)
                for d, out_ch in enumerate(dch)
            ]
            for _ in self.task_names
        ]
        self.heads = [
            SegmentationHead(self.task_channels[name], dtype=self.dtype)
            for name in self.task_names
        ]

        # stitch channel widths (reference get_stitch_channels,
        # cross_stitch_model.py:171-201): encoder points use the stage output
        # channels; decoder points add the concatenated skip channels.
        enc_stitch_ch = list(STAGE_OUT_CHANNELS)  # (16,24,40,80,112,160)
        dec_in_ch = [CONV_HEAD_CH] + list(dch[:-1])  # (960,256,128,64,32)
        dec_stitch_ch = [
            dec_in_ch[d] + (skip_ch[-d - 1] if d < len(skip_ch) else 0)
            for d in range(self.num_decoder_layers)
        ]

        def stitch(ch: int) -> CrossStitchLayer:
            return CrossStitchLayer(
                num_tasks=n,
                num_channels=ch if self.channel_wise_stitching else None,
                full_mix=self.full_mix,
            )

        self.enc_stitches = [stitch(c) for c in enc_stitch_ch]
        self.dec_stitches = [stitch(c) for c in dec_stitch_ch]

    def _apply_stitch(
        self, layer: CrossStitchLayer, feats: t.List[jax.Array]
    ) -> t.List[jax.Array]:
        stacked = jnp.stack(feats, axis=0)
        mixed = layer(stacked)
        return [mixed[i] for i in range(len(feats))]

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> t.Dict[str, jax.Array]:
        n = len(self.task_names)
        feats = [self.encoders[ti].run_stem(x, train) for ti in range(n)]
        skips: t.List[t.List[jax.Array]] = [[] for _ in range(n)]

        for s in range(NUM_STAGES):
            feats = [
                self.encoders[ti].run_stage(s, feats[ti], train)
                for ti in range(n)
            ]
            if s in FEATURE_TAP_AFTER_STAGE:
                for ti in range(n):
                    skips[ti].append(feats[ti])  # cached pre-stitch
            feats = self._apply_stitch(self.enc_stitches[s], feats)

        feats = [self.encoders[ti].run_head(feats[ti], train) for ti in range(n)]

        for d in range(self.num_decoder_layers):
            merged = []
            for ti in range(n):
                h = feats[ti]
                if d < len(skips[ti]):
                    skip = skips[ti][-d - 1]
                    if self.upsample_skips:
                        h = upsample_nearest_2x(h)
                        # non-/32 input sizes leave the 2x upsample a pixel
                        # off the skip (ceil-strided encoder): crop any
                        # excess, pad any deficit to the skip's exact H,W
                        h = h[:, : skip.shape[1], : skip.shape[2], :]
                        h = pad_to_match(h, skip)
                    else:
                        h = pad_to_match(h, skip)
                    h = jnp.concatenate([skip.astype(h.dtype), h], axis=-1)
                else:
                    h = upsample_nearest_2x(h)
                merged.append(h)
            merged = self._apply_stitch(self.dec_stitches[d], merged)
            feats = [
                self.decoders[ti][d](merged[ti], None, train) for ti in range(n)
            ]

        out: t.Dict[str, jax.Array] = {}
        for ti, name in enumerate(self.task_names):
            out[name] = self.heads[ti](feats[ti])
        return out
