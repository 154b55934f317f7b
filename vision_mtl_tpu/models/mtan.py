"""MTAN — Multi-Task Attention Network on a mini-Unet global net.

Re-implementation of the reference's custom MTAN (reference
models/mtan_model.py:12-404): a shared mini-Unet "global" network with
per-task attention sub-networks threaded alongside it. Per encoder level a
task stream computes a sigmoid gate from (shared input, previous task
features) and modulates the shared DoubleConv output; per decoder level the
gate is computed from the merged skip features and the upsampled task stream.
Task heads are 1x1 convs applied to the final per-task streams.

Fully static control flow (python loops over fixed level/task counts unroll at
trace time); all ops are conv/elementwise and fuse under XLA. The sigmoid-gate
modulation is elementwise and fuses into the surrounding convs (SURVEY.md §7.8
— measured to not need a Pallas kernel).

Trained config (reference utils/pipeline_utils.py:105-111):
encoder_first_channel=32, encoder_num_channels=4, hidden=128.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_mtl_tpu.models.blocks import (
    BatchNorm,
    Conv,
    DoubleConv,
    max_pool_2x,
    torch_conv_bias_init,
)
from vision_mtl_tpu.ops.interpolate import (
    pad_concat,
    resize_bilinear_align_corners,
)


class GateChain(nn.Module):
    """The attention-gate core shared by both module types:
    ``shared * sigmoid(BN2(conv1x1(relu(BN1(conv1x1(x))))))``.

    Implemented with explicit params so the eval path can fold the BNs and
    dispatch to the fused Pallas kernel (ops/pallas/fused_gate.py), which
    keeps the (N, hidden) intermediate in VMEM. Train mode (and non-TPU
    backends) use the standard jnp path with batch statistics and flax-style
    running-stat updates.
    """

    hidden: int
    gate_features: int
    dtype: t.Any = jnp.bfloat16
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, shared: jax.Array, train: bool = False
    ) -> jax.Array:
        cin = x.shape[-1]
        c2 = self.gate_features
        hid = self.hidden

        def conv_init(key, shape, dtype=jnp.float32):
            # torch kaiming_uniform(a=sqrt(5)) for a 1x1 conv
            from vision_mtl_tpu.models.blocks import torch_conv_kernel_init

            return torch_conv_kernel_init(key, shape, dtype)

        w1 = self.param("w1", conv_init, (cin, hid), jnp.float32)
        b1 = self.param(
            "b1", lambda k, s, d=jnp.float32: torch_conv_bias_init(k, s, d, cin),
            (hid,),
        )
        w2 = self.param("w2", conv_init, (hid, c2), jnp.float32)
        b2 = self.param(
            "b2", lambda k, s, d=jnp.float32: torch_conv_bias_init(k, s, d, hid),
            (c2,),
        )
        scale1 = self.param("scale1", nn.initializers.ones_init(), (hid,), jnp.float32)
        bias1 = self.param("bias1", nn.initializers.zeros_init(), (hid,), jnp.float32)
        scale2 = self.param("scale2", nn.initializers.ones_init(), (c2,), jnp.float32)
        bias2 = self.param("bias2", nn.initializers.zeros_init(), (c2,), jnp.float32)
        mean1 = self.variable("batch_stats", "mean1", jnp.zeros, (hid,), jnp.float32)
        var1 = self.variable("batch_stats", "var1", jnp.ones, (hid,), jnp.float32)
        mean2 = self.variable("batch_stats", "mean2", jnp.zeros, (c2,), jnp.float32)
        var2 = self.variable("batch_stats", "var2", jnp.ones, (c2,), jnp.float32)

        import os

        # The Pallas fused-gate kernel measured SLOWER than XLA's lowering
        # on v5e (814 vs 1524 img/s eval fwd, bs128: the Cin=3 contraction
        # starves the MXU and XLA pipelines the op chain better), so it is
        # opt-in; see docs/BENCH_NOTES.md.
        fused_ok = bool(os.environ.get("VMTL_ENABLE_FUSED_GATE"))
        if not train and fused_ok and jax.default_backend() == "tpu":
            from vision_mtl_tpu.ops.pallas.fused_gate import (
                fold_bn,
                fused_attention_gate,
            )

            s1, c1 = fold_bn(b1, scale1, bias1, mean1.value, var1.value, self.epsilon)
            s2, c2c = fold_bn(b2, scale2, bias2, mean2.value, var2.value, self.epsilon)
            return fused_attention_gate(
                x, shared, w1 * s1[None, :], c1, w2 * s2[None, :], c2c
            )

        # reference jnp path
        def bn(z, mean_v, var_v, scale, bias):
            zf = z.astype(jnp.float32)
            if train:
                m = jnp.mean(zf, axis=(0, 1, 2))
                v = jnp.var(zf, axis=(0, 1, 2))
                if not self.is_initializing():
                    v_upd = v
                    # --torch_bn_var: the reference's attention BNs are torch
                    # BatchNorm2d, whose running-var update is UNBIASED
                    # (QUIRKS #11) — mirror the TorchVarBatchNorm correction
                    # here so MTAN's GateChain honors the switch too.
                    # (fused_attention_gate_train returns RAW batch stats;
                    # any consumer owns this same correction.)
                    from vision_mtl_tpu.models.blocks import torch_bn_running_var

                    if torch_bn_running_var():
                        n = zf.size // zf.shape[-1]
                        v_upd = v * (n / max(n - 1, 1))
                    mean_v.value = self.momentum * mean_v.value + (1 - self.momentum) * m
                    var_v.value = self.momentum * var_v.value + (1 - self.momentum) * v_upd
            else:
                m, v = mean_v.value, var_v.value
            out = (zf - m) * jax.lax.rsqrt(v + self.epsilon) * scale + bias
            return out.astype(z.dtype)

        h = (
            jnp.dot(
                x.astype(self.dtype),
                w1.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + b1
        ).astype(self.dtype)
        h = nn.relu(bn(h, mean1, var1, scale1, bias1))
        a = (
            jnp.dot(
                h.astype(self.dtype),
                w2.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + b2
        ).astype(self.dtype)
        a = bn(a, mean2, var2, scale2, bias2)
        attn = nn.sigmoid(a)
        return shared * attn.astype(shared.dtype)


class AttentionModuleEncoder(nn.Module):
    """Encoder-side task attention (reference mtan_model.py:12-83):
    concat(shared1, prev) -> 1x1 conv-BN-ReLU -> 1x1 conv-BN-sigmoid gate
    * shared2 -> 3x3 conv-BN-ReLU -> maxpool."""

    out_channels: int
    shared_2_channels: int
    hidden_channels: int = 64
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        conv1_shared: jax.Array,
        conv2_shared: jax.Array,
        prev_layer_outs: t.Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if prev_layer_outs is None:
            h = conv1_shared
        else:
            h = jnp.concatenate(
                [conv1_shared, prev_layer_outs.astype(conv1_shared.dtype)], axis=-1
            )
        g = GateChain(
            hidden=self.hidden_channels,
            gate_features=self.shared_2_channels,
            dtype=self.dtype,
        )(h, conv2_shared, train)
        g = Conv(self.out_channels, (3, 3), dtype=self.dtype)(g)
        g = BatchNorm(use_running_average=not train)(g)
        g = nn.relu(g)
        return max_pool_2x(g)


class AttentionModuleDecoder(nn.Module):
    """Decoder-side task attention (reference mtan_model.py:86-169): 3x3 conv
    on prev task stream (+bilinear x2 align_corners upsample on scale
    mismatch) -> concat with shared1 -> two 1x1 convs -> sigmoid gate *
    shared2 -> 3x3 out conv."""

    shared_2_channels: int
    out_channels: int
    hidden_channels: int = 64
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        conv1_shared: jax.Array,
        prev_layer_outs: jax.Array,
        conv2_shared: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        p = Conv(self.hidden_channels, (3, 3), dtype=self.dtype)(prev_layer_outs)
        p = BatchNorm(use_running_average=not train)(p)
        p = nn.relu(p)
        if conv1_shared.shape[1:3] != p.shape[1:3]:
            p = resize_bilinear_align_corners(
                p, conv1_shared.shape[1], conv1_shared.shape[2]
            )
        merged = jnp.concatenate(
            [conv1_shared, p.astype(conv1_shared.dtype)], axis=-1
        )
        g = GateChain(
            hidden=self.hidden_channels,
            gate_features=self.shared_2_channels,
            dtype=self.dtype,
        )(merged, conv2_shared, train)
        g = Conv(self.out_channels, (3, 3), dtype=self.dtype)(g)
        g = BatchNorm(use_running_average=not train)(g)
        return nn.relu(g)


class MTANMiniUnet(nn.Module):
    """Mini-Unet global net + per-task attention streams
    (reference mtan_model.py:246-404)."""

    map_tasks_to_num_channels: t.Dict[str, int]
    task_subnets_hidden_channels: int = 128
    encoder_first_channel: int = 64
    encoder_num_channels: int = 4
    # rematerialize the per-task attention modules in backward. Measured on
    # v5e (bs128, 128x256): remat LOSES (294 -> 254 img/s) — the module
    # inputs re-read for recompute outweigh the saved hidden activations.
    # Kept as an option for memory-constrained configs.
    remat_attention: bool = False
    # rematerialize the shared mini-Unet DoubleConvs (enc levels,
    # bottleneck, dec levels) — the other half of MTAN's activation
    # memory; for high-resolution configs that otherwise cannot compile
    remat_shared: bool = False
    # fold the T per-task attention streams into one leading axis via
    # nn.vmap: each level's T attention modules run as ONE vmapped call
    # (XLA lowers the per-task convs as single grouped/batched ops instead
    # of T separate dispatches). Exactly the same math per task; params
    # live STACKED (leading T axis) under enc/dec_attn_{i}_folded — use
    # fold_task_variables() to convert an unfolded checkpoint.
    fold_tasks: bool = False
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> t.Dict[str, jax.Array]:
        task_names = list(self.map_tasks_to_num_channels.keys())
        n_tasks = len(task_names)
        hidden = self.task_subnets_hidden_channels
        AttnEnc = AttentionModuleEncoder
        AttnDec = AttentionModuleDecoder
        if self.remat_attention:
            AttnEnc = nn.remat(AttentionModuleEncoder, static_argnums=(4,))
            AttnDec = nn.remat(AttentionModuleDecoder, static_argnums=(4,))
        DConv = DoubleConv
        if self.remat_shared:
            # static_argnums: module instance is arg 0; arg 2 is `train`
            DConv = nn.remat(DoubleConv, static_argnums=(2,))

        enc_out = [
            self.encoder_first_channel * (2**i)
            for i in range(self.encoder_num_channels)
        ]
        dec_out = enc_out[::-1]

        def vmap_tasks(module_cls, prev_axis):
            """Lift a per-task attention module over a leading task axis:
            stacked params/stats (T, ...), shared inputs broadcast, the
            previous task stream mapped on ``prev_axis``."""
            return nn.vmap(
                module_cls,
                in_axes=prev_axis,
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
                axis_size=n_tasks,
            )

        # ---- encoder: shared DoubleConv levels + per-task gated streams ----
        shared = x
        task_streams: t.Any = [None] * n_tasks  # folded mode: (T,B,H,W,C)
        encoder_features: t.List[jax.Array] = []
        for i, ch in enumerate(enc_out):
            level_in = shared
            dconv_out = DConv(ch, dtype=self.dtype, name=f"enc_dconv_{i}")(
                level_in, train
            )
            if self.fold_tasks:
                prev = task_streams if i else None
                task_streams = vmap_tasks(
                    AttnEnc, (None, None, 0 if i else None, None)
                )(
                    out_channels=ch,
                    shared_2_channels=ch,
                    hidden_channels=hidden,
                    dtype=self.dtype,
                    name=f"enc_attn_{i}_folded",
                )(level_in, dconv_out, prev, train)
            else:
                new_streams: t.List[jax.Array] = []
                for ti in range(n_tasks):
                    new_streams.append(
                        AttnEnc(
                            out_channels=ch,
                            shared_2_channels=ch,
                            hidden_channels=hidden,
                            dtype=self.dtype,
                            name=f"enc_attn_{i}_task{ti}",
                        )(level_in, dconv_out, task_streams[ti], train)
                    )
                task_streams = new_streams
            encoder_features.append(dconv_out)
            shared = max_pool_2x(dconv_out)

        # ---- bottleneck ----
        shared = DConv(
            enc_out[-1] * 2, dtype=self.dtype, name="bottleneck"
        )(shared, train)

        # ---- decoder: ConvTranspose up + pad-concat skip + DoubleConv ----
        for i, ch in enumerate(dec_out):
            in_ch = shared.shape[-1]
            up = nn.ConvTranspose(
                features=in_ch // 2,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"dec_up_{i}",
            )(shared)
            skip = encoder_features[-(i + 1)]
            merged = pad_concat(up, skip.astype(up.dtype))
            conv_out = DConv(ch, dtype=self.dtype, name=f"dec_dconv_{i}")(
                merged, train
            )
            if self.fold_tasks:
                task_streams = vmap_tasks(AttnDec, (None, 0, None, None))(
                    shared_2_channels=ch,
                    out_channels=ch,
                    hidden_channels=hidden,
                    dtype=self.dtype,
                    name=f"dec_attn_{i}_folded",
                )(merged, task_streams, conv_out, train)
            else:
                new_streams = []
                for ti in range(n_tasks):
                    new_streams.append(
                        AttnDec(
                            shared_2_channels=ch,
                            out_channels=ch,
                            hidden_channels=hidden,
                            dtype=self.dtype,
                            name=f"dec_attn_{i}_task{ti}",
                        )(merged, task_streams[ti], conv_out, train)
                    )
                task_streams = new_streams
            shared = conv_out

        # ---- per-task 1x1 heads on the final task streams ----
        out: t.Dict[str, jax.Array] = {}
        for ti, task_name in enumerate(task_names):
            out[task_name] = Conv(
                self.map_tasks_to_num_channels[task_name],
                (1, 1),
                dtype=self.dtype,
                name=f"head_{task_name}",
            )(task_streams[ti])
        return out


def fold_task_variables(
    variables: t.Dict[str, t.Any], n_tasks: int
) -> t.Dict[str, t.Any]:
    """Convert unfolded MTAN variables (per-task ``*_task{ti}`` subtrees)
    to the ``fold_tasks=True`` layout (``*_folded`` subtrees with leaves
    stacked on a leading task axis). Exact: the folded forward then
    reproduces the unfolded model bit-for-bit (tests/test_fold_tasks.py)."""
    import re

    import numpy as np

    def fold(d: t.Dict[str, t.Any]) -> t.Dict[str, t.Any]:
        out: t.Dict[str, t.Any] = {}
        bases = {}
        for k in d:
            m = re.fullmatch(r"(.+)_task(\d+)", k)
            if m:
                bases.setdefault(m.group(1), {})[int(m.group(2))] = d[k]
        for k, v in d.items():
            if re.fullmatch(r"(.+)_task(\d+)", k):
                continue
            out[k] = fold(v) if isinstance(v, dict) else v
        for base, parts in bases.items():
            assert len(parts) == n_tasks, (base, sorted(parts))
            stacked = jax.tree.map(
                lambda *leaves: np.stack([np.asarray(l) for l in leaves]),
                *[parts[ti] for ti in range(n_tasks)],
            )
            out[f"{base}_folded"] = stacked
        return out

    return {coll: fold(sub) for coll, sub in variables.items()}
