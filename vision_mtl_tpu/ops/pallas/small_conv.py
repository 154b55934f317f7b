"""Pallas TPU kernel: 3x3 stride-1 conv for SMALL channel counts.

Why XLA is slow here: XLA lowers a 3x3 NHWC conv as per-tap matmuls whose
contraction (C) and output (O) dims both pad to 128 MXU lanes — for the
basic model's decoder tail (67->33, 33->33, 33->20) and MTAN's 32/64-channel
streams that is 7-14% MXU utilization (measured ~4.2-8.8 ms per conv at
bs128 128x256, docs/BENCH_NOTES.md).

This kernel repacks the conv as ONE matmul per row-tile:

    lhs  (T*W, 3C)  — the 3 row-taps concatenated into the contraction dim
    rhs  (3C, 3O)   — kernel as [du*C+c, dv*O+o]
    out  (T*W, 3O)  — partial sums per column-tap, reduced by 3 shifted
                      adds in VMEM (never materialized in HBM)

Both matmul dims land near the 128 boundary (e.g. 33->33: 99x99 = 60%
useful vs 6.8%), no zero-MACs, and HBM traffic is exactly input + output.
Row halos are passed as two thin (B, nH, W, C) side arrays built by XLA
slicing (2 rows per tile vs 16 — 12.5% extra input traffic).

The public entry `conv3x3_small` has a custom VJP: dx reuses this kernel
(transposed+flipped kernel is another small-channel 3x3 conv), dw/db fall
back to XLA's transpose rules (dw's contraction is over N=B*H*W where XLA
is efficient).
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16  # bf16 sublane tile


def _kernel(x_ref, top_ref, bot_ref, rhs_ref, bias_ref, o_ref):
    t_, w, c = x_ref.shape[1:]
    o = o_ref.shape[-1]
    xw = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    # contraction packing: lhs[t, w, du*C+c] = x[row0 + t + du - 1, w, c]
    lhs = jnp.concatenate([xw[0:t_], xw[1 : t_ + 1], xw[2 : t_ + 2]], axis=-1)
    part = jax.lax.dot_general(
        lhs,
        rhs_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, W, 3O) f32
    pp = jnp.pad(part, ((0, 0), (1, 1), (0, 0)))
    y = (
        pp[:, 0:w, 0:o]
        + pp[:, 1 : w + 1, o : 2 * o]
        + pp[:, 2 : w + 2, 2 * o : 3 * o]
    )
    y = y + bias_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _pack_rhs(kernel: jax.Array, dtype: t.Any) -> jax.Array:
    """(3,3,C,O) -> (3C, 3O) with rhs[du*C+c, dv*O+o] = K[du,dv,c,o]."""
    k3, _, c, o = kernel.shape
    assert k3 == 3
    return (
        jnp.transpose(kernel, (0, 2, 1, 3)).reshape(3 * c, 3 * o).astype(dtype)
    )


def _halos(x: jax.Array, tile_h: int) -> t.Tuple[jax.Array, jax.Array]:
    """Rows {j*T-1} and {j*T+T} per tile, zeros at the image boundary."""
    b, h, w, c = x.shape
    nh = h // tile_h
    zero = jnp.zeros((b, 1, w, c), x.dtype)
    top_rows = [zero] + [
        x[:, j * tile_h - 1 : j * tile_h - 1 + 1] for j in range(1, nh)
    ]
    bot_rows = [
        x[:, (j + 1) * tile_h : (j + 1) * tile_h + 1] for j in range(nh - 1)
    ] + [zero]
    top = jnp.stack([r[:, 0] for r in top_rows], axis=1)  # (B, nH, W, C)
    bot = jnp.stack([r[:, 0] for r in bot_rows], axis=1)
    return top, bot


def _conv3x3_pallas(
    x: jax.Array, kernel: jax.Array, bias: jax.Array, interpret: bool = False
) -> jax.Array:
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    tile_h = TILE_H if h % TILE_H == 0 else 8
    assert h % tile_h == 0, (h, tile_h)
    nh = h // tile_h
    rhs = _pack_rhs(kernel, x.dtype)
    top, bot = _halos(x, tile_h)
    bias2 = bias.reshape(1, o).astype(jnp.float32)

    grid = (b, nh)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, o), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * o,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * h * w * o * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, top, bot, rhs, bias2)
    return out


def _conv3x3_xla(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def _use_pallas(x_shape, c: int, o: int) -> bool:
    """The repack only wins while both matmul dims are meaningfully below
    the 128 lanes XLA would pad them to; at >=128 channels XLA's conv is
    already at full lane utilization."""
    import os

    # NEGATIVE RESULT (v5e, 2026-08-16): the repack itself is sound (relerr
    # ~bf16) but pallas_call's HBM<->VMEM pipeline for narrow-lane (C<128)
    # NHWC blocks runs at ~9 ms per 554 MB round trip — above XLA's ENTIRE
    # conv (6.5 ms for 33->33) — and Mosaic cannot relayout the dense
    # (T, W*C) form in-kernel (lane-splitting reshape). Opt-in for future
    # hardware/toolchain generations; numbers in docs/BENCH_NOTES.md.
    if not os.environ.get("VMTL_ENABLE_SMALL_CONV"):
        return False
    _, h, w, _ = x_shape
    if jax.default_backend() != "tpu":
        return False
    if c >= 100 or o >= 100:  # 3C/3O beyond ~2.3 lane tiles: XLA wins
        return False
    if h % 8 != 0 or w % 8 != 0:
        return False
    # VMEM window (T+2, W, C->128 lanes) x 2 buffers + lhs + f32 partials
    if (TILE_H + 2) * w * 128 * 2 * 4 > 6 * 1024 * 1024:
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_small(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 stride-1 'torch' padded conv, NHWC, small channels — Pallas on
    TPU (see module docstring), XLA elsewhere. kernel (3,3,C,O) f32 params;
    compute in x.dtype with f32 accumulation; output x.dtype."""
    if _use_pallas(x.shape, x.shape[-1], kernel.shape[-1]):
        return _conv3x3_pallas(x, kernel, bias)
    return _conv3x3_xla(x, kernel, bias)


def _fwd(x, kernel, bias):
    return conv3x3_small(x, kernel, bias), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    c, o = kernel.shape[2], kernel.shape[3]
    # dx: correlate g with the flipped, transposed kernel — itself a
    # small-channel 3x3 conv, so it reuses the Pallas kernel
    k_t = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # (3,3,O,C)
    if _use_pallas(g.shape, o, c):
        dx = _conv3x3_pallas(g, k_t, jnp.zeros((c,), jnp.float32))
    else:
        dx = _conv3x3_xla(g, k_t, jnp.zeros((c,), jnp.float32))
    # dw via XLA's conv kernel-transpose rule (contraction over B*H*W where
    # the MXU is already well utilized)
    _, dw_fn = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            x,
            k.astype(x.dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        kernel,
    )
    (dw,) = dw_fn(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dw, db


conv3x3_small.defvjp(_fwd, _bwd)
