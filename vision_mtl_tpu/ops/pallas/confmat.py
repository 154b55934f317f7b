"""Pallas TPU kernel: weighted confusion matrix.

Computes ``cm[i, j] = sum_n w[n] * (t[n] == i) * (p[n] == j)`` for int class
vectors without materializing the (N, C) one-hot matrices in HBM: each grid
step loads a tile of targets/preds into VMEM, expands one-hots in registers
(broadcasted-iota compares), contracts them on the MXU, and accumulates into
the (C, C) output, which stays resident in VMEM across the sequential TPU
grid. The XLA fallback (metrics.py) writes/reads ~2*N*C bf16 of one-hots;
this kernel touches only the 2*N int32 inputs.

No VJP needed — metric accumulation is outside the differentiated graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile of samples processed per grid step (sublane-friendly: 8 x 512)
TILE = 4096


def _kernel(t_ref, p_ref, w_ref, out_ref, *, num_classes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = t_ref[:].reshape(TILE, 1)
    p = p_ref[:].reshape(TILE, 1)
    w = w_ref[:].reshape(TILE, 1)
    classes = jax.lax.broadcasted_iota(jnp.int32, (TILE, num_classes), 1)
    t1h = (t == classes).astype(jnp.float32) * w
    p1h = (p == classes).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        t1h,
        p1h,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def confusion_matrix(
    targets: jax.Array,
    preds: jax.Array,
    num_classes: int,
    weights: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(C, C) float32 confusion matrix (rows = target, cols = pred).

    Args:
      targets, preds: int arrays of any (matching) shape.
      weights: optional float weights, same shape.
    """
    t = targets.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    w = (
        weights.reshape(-1).astype(jnp.float32)
        if weights is not None
        else jnp.ones_like(t, jnp.float32)
    )
    n = t.shape[0]
    pad = (-n) % TILE
    if pad:
        # out-of-range class ids contribute nothing (one-hot row is zero)
        t = jnp.concatenate([t, jnp.full((pad,), num_classes, jnp.int32)])
        p = jnp.concatenate([p, jnp.full((pad,), num_classes, jnp.int32)])
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    tiles = t.shape[0] // TILE

    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_classes, num_classes),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, num_classes=num_classes),
        out_shape=jax.ShapeDtypeStruct((num_classes, num_classes), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(t, p, w)
