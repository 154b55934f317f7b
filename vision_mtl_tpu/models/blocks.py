"""Shared NHWC Flax building blocks.

Initialization matches torch defaults (kaiming_uniform(a=sqrt(5)) for conv
kernels, uniform(+-1/sqrt(fan_in)) for biases) so that from-scratch training
dynamics track the reference. BatchNorm runs in float32 with torch's
eps=1e-5 / momentum=0.1 (flax momentum=0.9 == fraction retained); convolutions
compute in the configured dtype (bfloat16 by default) to hit the MXU.
"""

from __future__ import annotations

import os
import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

#: When True, BatchNorm running-variance updates use torch's UNBIASED
#: (N/(N-1)) estimator instead of flax's biased one — the last documented
#: numeric divergence from the reference (docs/QUIRKS.md #11). Off by
#: default (flax semantics); flip with --torch_bn_var / VMTL_TORCH_BN_VAR=1
#: or set_torch_bn_running_var(). Read at TRACE time; param/stat trees are
#: identical either way, so checkpoints are interchangeable.
_TORCH_BN_VAR = os.environ.get("VMTL_TORCH_BN_VAR", "0") == "1"


def set_torch_bn_running_var(enabled: bool) -> None:
    global _TORCH_BN_VAR
    _TORCH_BN_VAR = bool(enabled)


def torch_bn_running_var() -> bool:
    return _TORCH_BN_VAR

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)),
# fan_in = in_ch * kh * kw. variance_scaling limit = sqrt(3*scale/fan_in).
torch_conv_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_conv_bias_init(
    key: jax.Array, shape: t.Sequence[int], dtype: t.Any, fan_in: int
) -> jax.Array:
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """Conv2d with torch-default init. NHWC; kernel HWIO."""

    features: int
    kernel_size: t.Tuple[int, int] = (3, 3)
    strides: t.Tuple[int, int] = (1, 1)
    # "torch": explicit symmetric ((k-1)//2) padding — identical to torch
    # Conv2d(padding=(k-1)//2) for every stride, unlike XLA "SAME" which
    # pads asymmetrically for stride 2 (would break weight-porting parity).
    padding: t.Any = "torch"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        padding = self.padding
        if padding == "torch":
            ph = (self.kernel_size[0] - 1) // 2
            pw = (self.kernel_size[1] - 1) // 2
            padding = ((ph, ph), (pw, pw))
        in_ch = x.shape[-1]
        fan_in = (
            (in_ch // self.feature_group_count)
            * self.kernel_size[0]
            * self.kernel_size[1]
        )
        bias_init = (
            (lambda key, shape, dtype=jnp.float32: torch_conv_bias_init(
                key, shape, dtype, fan_in
            ))
            if self.use_bias
            else nn.initializers.zeros_init()
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchVarBatchNorm(nn.Module):
    """``nn.BatchNorm`` drop-in (identical param/stat layout: ``scale``/
    ``bias`` params, ``batch_stats`` ``mean``/``var``) whose running-var
    update uses torch's UNBIASED (N/(N-1)) batch variance — torch
    ``_BatchNorm.forward``'s semantics exactly. Normalization itself uses
    the biased variance in train mode, as both frameworks do.
    """

    use_running_average: t.Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: t.Optional[t.Any] = None
    param_dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, use_running_average: t.Optional[bool] = None
    ) -> jax.Array:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (c,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", jnp.zeros, (c,), self.param_dtype
        )
        ra_var = self.variable(
            "batch_stats", "var", jnp.ones, (c,), self.param_dtype
        )
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if ura:
            m, v = ra_mean.value, ra_var.value
        else:
            m = jnp.mean(xf, axis=axes)
            v = jnp.mean(jnp.square(xf - m), axis=axes)
            if not self.is_initializing():
                n = x.size // c
                unbiased = v * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * m
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * unbiased
                )
        y = (xf - m) * jax.lax.rsqrt(v + self.epsilon) * scale.astype(
            jnp.float32
        ) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)


def bn_class() -> t.Any:
    """The raw-BN class honoring the torch-running-var switch; same call
    surface and param layout either way."""
    return TorchVarBatchNorm if _TORCH_BN_VAR else nn.BatchNorm


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults.

    I/O stays in the input dtype (bf16 on the fast path — the train step is
    HBM-bandwidth bound, and f32 BN outputs would double activation traffic);
    mean/var reductions and params are float32 (flax upcasts statistics
    internally). Under jit over a sharded batch the reductions become global
    collectives automatically (GSPMD), giving cross-replica-synced BN for
    free.

    With the torch-running-var switch on (docs/QUIRKS.md #11) the child is
    :class:`TorchVarBatchNorm` at the SAME param path — checkpoints are
    interchangeable across the switch.
    """

    use_running_average: bool
    momentum: float = 0.9  # torch momentum 0.1 -> flax retain fraction 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return bn_class()(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=x.dtype,
            param_dtype=jnp.float32,
            name="BatchNorm_0",
        )(x)


def hard_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x: jax.Array) -> jax.Array:
    return x * hard_sigmoid(x)


ACTIVATIONS: t.Dict[str, t.Callable[[jax.Array], jax.Array]] = {
    "relu": nn.relu,
    "hardswish": hard_swish,
    "identity": lambda x: x,
}


class ConvBNAct(nn.Module):
    """conv -> BN -> activation."""

    features: int
    kernel_size: t.Tuple[int, int] = (3, 3)
    strides: t.Tuple[int, int] = (1, 1)
    groups: int = 1
    act: str = "relu"
    use_bias: bool = False
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(
            self.features,
            self.kernel_size,
            self.strides,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = BatchNorm(use_running_average=not train)(x)
        return ACTIVATIONS[self.act](x)


class _ConvParams(nn.Module):
    """Parameter holder mimicking nn.Conv's param layout (kernel/bias names,
    shapes, init) without applying the op — used by the folded compute path
    so fold on/off is checkpoint- and init-identical (same param paths =>
    same init RNG streams => bitwise-equal initial weights)."""

    features: int
    kernel_size: t.Tuple[int, int]
    in_ch: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (*self.kernel_size, self.in_ch, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            fan_in = self.in_ch * self.kernel_size[0] * self.kernel_size[1]
            bias = self.param(
                "bias",
                lambda k, s, d=jnp.float32: torch_conv_bias_init(k, s, d, fan_in),
                (self.features,),
            )
        return kernel, bias


class FoldedConv(nn.Module):
    """Stride-1 conv on a space-to-depth FOLDED input (see ops/fold.py),
    with parameters at the same paths/shapes as ``Conv`` (nested Conv_0)."""

    features: int
    kernel_size: t.Tuple[int, int] = (3, 3)
    in_splits: t.Optional[t.Tuple[int, ...]] = None
    use_bias: bool = True
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vision_mtl_tpu.ops.fold import folded_conv

        in_ch = x.shape[-1] // 4
        kernel, bias = _ConvParams(
            self.features, self.kernel_size, in_ch, self.use_bias, name="Conv_0"
        )()
        return folded_conv(
            x, kernel, bias, in_splits=self.in_splits, dtype=self.dtype
        )


class _BNParams(nn.Module):
    """Parameter/stat holder mimicking nn.BatchNorm's layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean", jnp.zeros, (self.features,), jnp.float32
        )
        var = self.variable(
            "batch_stats", "var", jnp.ones, (self.features,), jnp.float32
        )
        return scale, bias, mean, var


class FoldedBatchNorm(nn.Module):
    """BatchNorm on a FOLDED tensor with statistics tied across the 4 phases
    — numerically identical to BatchNorm on the unfolded tensor. Parameters
    and running stats keep unfolded (C,) shapes at ``BatchNorm``'s paths."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        from vision_mtl_tpu.ops.fold import folded_batch_norm, folded_batch_stats

        c = y.shape[-1] // 4
        scale, bias, mean_v, var_v = _BNParams(c, name="BatchNorm_0")()
        if self.use_running_average:
            m, v = mean_v.value, var_v.value
        else:
            m, v = folded_batch_stats(y)
            if not self.is_initializing():
                v_upd = v
                if _TORCH_BN_VAR:  # unbiased running update (QUIRKS #11)
                    n = y.size // c  # 4 tied phases all contribute
                    v_upd = v * (n / max(n - 1, 1))
                mean_v.value = self.momentum * mean_v.value + (1 - self.momentum) * m
                var_v.value = self.momentum * var_v.value + (1 - self.momentum) * v_upd
        return folded_batch_norm(y, m, v, scale, bias, self.epsilon)


class FoldedConvBNAct(nn.Module):
    """conv -> BN -> activation on a folded tensor; param-path-compatible
    with ``ConvBNAct`` (same Conv_0/BatchNorm_0 children)."""

    features: int
    kernel_size: t.Tuple[int, int] = (3, 3)
    in_splits: t.Optional[t.Tuple[int, ...]] = None
    act: str = "relu"
    use_bias: bool = False
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = FoldedConv(
            self.features,
            self.kernel_size,
            in_splits=self.in_splits,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="Conv_0",
        )(x)
        x = FoldedBatchNorm(use_running_average=not train, name="BatchNorm_0")(x)
        return ACTIVATIONS[self.act](x)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) * 2 — reference utils/model_utils.py:61-80."""

    features: int
    mid_features: t.Optional[int] = None
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = self.mid_features or self.features
        x = ConvBNAct(mid, (3, 3), act="relu", dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, (3, 3), act="relu", dtype=self.dtype)(x, train)
        return x


class SqueezeExcite(nn.Module):
    """MobileNetV3 squeeze-excite: global pool -> fc-relu -> fc-hardsigmoid
    gate."""

    reduced_features: int
    dtype: t.Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = Conv(self.reduced_features, (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * hard_sigmoid(s.astype(jnp.float32)).astype(x.dtype)


def max_pool_2x(x: jax.Array) -> jax.Array:
    """MaxPool2d(kernel_size=2, stride=2) NHWC. Torch floors odd sizes; the
    window trims the trailing row/col the same way with VALID padding."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def make_divisible(v: float, divisor: int = 8, min_value: t.Optional[int] = None) -> int:
    """Channel rounding used throughout the MobileNetV3 family."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
