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

``fused_attention_gate_train`` is the 3-pass TRAIN-mode forward (the last
untried MTAN speedup hypothesis, VERDICT r3 #4b): batch statistics need
global reductions before normalization can start, so the chain runs as
three grid-sequential kernels that RECOMPUTE the (N, hidden) intermediate
instead of round-tripping it through HBM — pass 1 accumulates BN1 stats,
pass 2 recomputes h and accumulates BN2 stats, pass 3 recomputes both and
writes only the gated output. 5 row-tile matmuls of MXU work vs XLA's 2,
in exchange for never materializing h/a in HBM. Forward-only: it bounds
the full train-step version from above (a custom VJP would add backward
passes on top), which is all the measurement needs
(scripts/dissect_gate3.py; docs/BENCH_NOTES.md).

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


# ---------------------------------------------------------------------------
# 3-pass train-mode forward (hypothesis 4b measurement)
# ---------------------------------------------------------------------------


def _stats_kernel_1(x_ref, w1_ref, b1_ref, acc_ref, *, n_valid):
    """Pass 1: h = x@w1 + b1; accumulate per-channel sum/sumsq of h into
    acc (2, hidden). TPU grid steps run sequentially on a core, so the
    accumulator output block (same for every step) carries across steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    # zero the padded tail rows so they don't pollute the statistics
    base = i * x.shape[0]
    rows = base + jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    h = jnp.where(rows < n_valid, h, 0.0)
    acc_ref[0, :] += jnp.sum(h, axis=0)
    acc_ref[1, :] += jnp.sum(h * h, axis=0)


def _stats_kernel_2(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, m1_ref, acc_ref, *, n_valid
):
    """Pass 2: recompute h, normalize with BN1 batch stats, relu, a = @w2;
    accumulate BN2 stats."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h * m1_ref[0, :] + m1_ref[1, :], 0.0)
    a = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    base = i * x.shape[0]
    rows = base + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    a = jnp.where(rows < n_valid, a, 0.0)
    acc_ref[0, :] += jnp.sum(a, axis=0)
    acc_ref[1, :] += jnp.sum(a * a, axis=0)


def _gate_kernel_3(
    x_ref, shared_ref, w1_ref, b1_ref, w2_ref, b2_ref, m1_ref, m2_ref, out_ref
):
    """Pass 3: full recompute + normalize + sigmoid gate; only the gated
    output touches HBM."""
    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h * m1_ref[0, :] + m1_ref[1, :], 0.0)
    a = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    attn = jax.nn.sigmoid(a * m2_ref[0, :] + m2_ref[1, :])
    out_ref[:] = (shared_ref[:].astype(jnp.float32) * attn).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_attention_gate_train(
    x: jax.Array,
    shared: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    scale1: jax.Array,
    bias1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    scale2: jax.Array,
    bias2: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> t.Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Train-mode gate forward with batch-statistic BNs, 3-pass fused.

    Returns (out, mean1, var1, mean2, var2) — the batch statistics feed the
    caller's running-stat update exactly like the jnp path (GateChain).
    """
    b, hh, ww, cin = x.shape
    c2ch = shared.shape[-1]
    n = b * hh * ww
    hidden = w1.shape[1]
    xf = x.reshape(n, cin)
    sf = shared.reshape(n, c2ch)
    pad = (-n) % TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        sf = jnp.pad(sf, ((0, pad), (0, 0)))
    tiles = xf.shape[0] // TILE

    w1f = w1.astype(jnp.float32)
    b1f = b1.reshape(1, -1).astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    b2f = b2.reshape(1, -1).astype(jnp.float32)

    def row_spec(ch):
        return pl.BlockSpec((TILE, ch), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def bcast_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def stat_pass(kernel, operands, specs, ch):
        acc = pl.pallas_call(
            functools.partial(kernel, n_valid=n),
            out_shape=jax.ShapeDtypeStruct((2, ch), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(tiles,),
                in_specs=specs,
                out_specs=bcast_spec((2, ch)),
            ),
            interpret=interpret,
        )(*operands)
        mean = acc[0] / n
        var = acc[1] / n - mean * mean
        return mean, jnp.maximum(var, 0.0)

    mean1, var1 = stat_pass(
        _stats_kernel_1,
        [xf, w1f, b1f],
        [row_spec(cin), bcast_spec(w1f.shape), bcast_spec(b1f.shape)],
        hidden,
    )
    # fold BN1(batch stats) into (scale, const) rows for the next passes
    inv1 = scale1 / jnp.sqrt(var1 + eps)
    m1 = jnp.stack([inv1, bias1 - mean1 * inv1]).astype(jnp.float32)
    mean2, var2 = stat_pass(
        _stats_kernel_2,
        [xf, w1f, b1f, w2f, b2f, m1],
        [
            row_spec(cin),
            bcast_spec(w1f.shape),
            bcast_spec(b1f.shape),
            bcast_spec(w2f.shape),
            bcast_spec(b2f.shape),
            bcast_spec(m1.shape),
        ],
        c2ch,
    )
    inv2 = scale2 / jnp.sqrt(var2 + eps)
    m2 = jnp.stack([inv2, bias2 - mean2 * inv2]).astype(jnp.float32)

    out = pl.pallas_call(
        _gate_kernel_3,
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
                pl.BlockSpec((2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, c2ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, c2ch), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(xf, sf, w1f, b1f, w2f, b2f, m1, m2)
    if pad:
        out = out[:n]
    return out.reshape(b, hh, ww, c2ch), mean1, var1, mean2, var2
