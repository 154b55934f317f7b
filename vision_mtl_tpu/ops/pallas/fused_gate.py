"""Pallas TPU kernel: fused inference-mode attention gate.

MTAN's task-attention chain (reference mtan_model.py:67-75,154-162) is

    attn = sigmoid(BN2(conv1x1_2(relu(BN1(conv1x1_1(x))))))
    out  = shared * attn

In eval mode the BNs are affine, so the chain is two per-pixel matmuls plus
elementwise ops. XLA materializes the (N, hidden) intermediate in HBM between
the matmuls (~1GB at bs128 full-res, hidden=128, written+read per module);
this kernel keeps it in VMEM: per row-tile it computes
``relu(x @ w1 * s1 + c1) @ w2 * s2 + c2``, applies the sigmoid gate to the
``shared`` tile and writes only the gated output. HBM traffic drops to the
unavoidable reads of x/shared + one output write.

Train mode keeps the XLA path (batch statistics need global reductions).
Inference-only -> no custom VJP required; the caller guards on ``train``.

Folding (handled by ``fold_bn``): BN(z) = z*(g/sqrt(v+eps)) + (b - m*g/
sqrt(v+eps)) for conv output z (conv bias folded into the constant).
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows (pixels) per grid step


def fold_bn(
    conv_bias: t.Optional[jax.Array],
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    eps: float = 1e-5,
) -> t.Tuple[jax.Array, jax.Array]:
    """Returns (scale, const) with BN(conv(x)) == conv_nobias(x)*scale+const."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    b = conv_bias if conv_bias is not None else 0.0
    return inv, (b - bn_mean) * inv + bn_bias


def _kernel(x_ref, shared_ref, w1_ref, c1_ref, w2_ref, c2_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + c1_ref[:], 0.0)
    a = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    attn = jax.nn.sigmoid(a + c2_ref[:])
    out_ref[:] = (shared_ref[:].astype(jnp.float32) * attn).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_gate(
    x: jax.Array,
    shared: jax.Array,
    w1: jax.Array,
    c1: jax.Array,
    w2: jax.Array,
    c2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """out = shared * sigmoid(relu(x@w1 + c1) @ w2 + c2), NHWC.

    Args:
      x: (B, H, W, Cin) gate input (folded-BN scales pre-multiplied into w1).
      shared: (B, H, W, C2) features to modulate.
      w1: (Cin, hidden); c1: (hidden,) — first conv1x1 + folded BN1.
      w2: (hidden, C2); c2: (C2,) — second conv1x1 + folded BN2.
    """
    b, h, w, cin = x.shape
    c2ch = shared.shape[-1]
    n = b * h * w
    xf = x.reshape(n, cin)
    sf = shared.reshape(n, c2ch)
    pad = (-n) % TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        sf = jnp.pad(sf, ((0, pad), (0, 0)))
    tiles = xf.shape[0] // TILE
    hidden = w1.shape[1]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(sf.shape, shared.dtype),
        grid_spec=pl.GridSpec(
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, c2ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cin, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, c2ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, c2ch), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(
        xf,
        sf,
        w1.astype(jnp.float32),
        c1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32),
        c2.reshape(1, -1).astype(jnp.float32),
    )
    if pad:
        out = out[:n]
    return out.reshape(b, h, w, c2ch)
