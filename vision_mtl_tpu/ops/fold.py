"""Space-to-depth folding: exact-transform layout rewrites for
small-channel / high-resolution tensors.

Why: TPU tiles the channel (lane) dimension to 128. The decoder tail of the
basic model runs 33/67-channel tensors at full resolution (128x256) and MTAN
threads 32-channel task streams through full-res gates — each padded to 128
lanes, inflating *physical* HBM traffic 2-4x over logical (measured:
docs/BENCH_NOTES.md roofline — 440 GB/s logical vs ~roofline physical).
Folding (B,H,W,C) -> (B,H/2,W/2,4C) packs 4 spatial phases into lanes,
cutting the padding inflation (33ch: 3.9x -> 1.9x; 32ch: 4x -> 1x).

Every op here is an EXACT transform of its unfolded counterpart (same math,
reassociated): a stride-1 odd-k conv is a folded conv with a structured
(k,k,4C,4O) kernel built from the original (k,k,C,O) parameter; BatchNorm
ties statistics across the 4 phases; nearest x2 upsample becomes a channel
tile; 2x2/2 maxpool becomes a phase-max; a 2x2/2 ConvTranspose becomes a
folded 1x1 conv. Parameters keep their UNFOLDED shapes (checkpoint/porting
parity); kernels are rearranged at trace time (tiny, fused by XLA).

Phase layout: fold(x)[b, i, j, (pr*2+pc)*C + c] = x[b, 2i+pr, 2j+pc, c]
("phase-major"). `in_splits` supports tensors built by concatenating
separately-folded groups: concat([fold(a), fold(b)]) has layout
[(phase-major over Ca), (phase-major over Cb)] which is a channel
permutation of fold(concat([a, b])); the folded kernels absorb it.
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major channel layout."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jax.Array) -> jax.Array:
    """(B,Hf,Wf,4C) -> (B,2Hf,2Wf,C) — inverse of space_to_depth."""
    b, hf, wf, c4 = y.shape
    assert c4 % 4 == 0, c4
    c = c4 // 4
    y = y.reshape(b, hf, wf, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * hf, 2 * wf, c)


def tile_for_upsample(x: jax.Array) -> jax.Array:
    """fold(upsample_nearest_2x(x)) without materializing the upsample:
    all 4 phases equal x, so the folded tensor is a channel 4-tile."""
    return jnp.tile(x, (1, 1, 1, 4))


def phase_max(y: jax.Array) -> jax.Array:
    """maxpool2x2/2 of the unfolded tensor == max over the 4 phases of the
    folded tensor; output is UNFOLDED at (B,Hf,Wf,C)."""
    b, hf, wf, c4 = y.shape
    c = c4 // 4
    return jnp.max(y.reshape(b, hf, wf, 4, c), axis=3)


@functools.lru_cache(maxsize=64)
def _fold_gather_index(
    k: int, in_ch: int, out_ch: int, in_splits: t.Tuple[int, ...]
) -> t.Tuple[np.ndarray, np.ndarray]:
    """Static index maps to build the folded kernel by gather.

    Returns (src, mask): int arrays of shape (k', k', 4*in_ch, 4*out_ch)
    where k' = k//2 + 2 is the folded spatial extent (3 for k in {1,3}...
    actually k'=1 for k=1, 3 for k=3/5). src flat-indexes into the original
    (k,k,in_ch,out_ch) kernel; mask zeroes structurally-absent taps.
    """
    assert k % 2 == 1, k
    half = (k - 1) // 2
    # folded spatial offsets span floor((p - half .. p + half)/2) for p in
    # {0,1}: [-(half+1)//2 - ... ] — compute exactly:
    offs = sorted({(p + u - half) // 2 for p in (0, 1) for u in range(k)})
    kf = len(offs)
    off_to_idx = {o: i for i, o in enumerate(offs)}

    # channel layout: groups folded independently then concatenated
    # in-channel position of (group g, phase P, channel c within group):
    #   base(g) + P*split[g] + c  where base(g) = 4 * sum(split[:g])
    # original in-channel = sum(split[:g]) + c
    in_pos = np.zeros((4, in_ch), dtype=np.int64)  # [phase, orig_ch] -> folded pos
    base = 0
    orig_base = 0
    for g in in_splits:
        for P in range(4):
            for c in range(g):
                in_pos[P, orig_base + c] = base + P * g + c
        base += 4 * g
        orig_base += g

    src = np.zeros((kf, kf, 4 * in_ch, 4 * out_ch), dtype=np.int64)
    mask = np.zeros((kf, kf, 4 * in_ch, 4 * out_ch), dtype=bool)
    for p in (0, 1):  # output row phase
        for q in (0, 1):  # output col phase
            for u in range(k):
                for v in range(k):
                    du, dv = p + u - half, q + v - half
                    fr, ir = du // 2, du % 2
                    fc, ic = dv // 2, dv % 2
                    a, b_ = off_to_idx[fr], off_to_idx[fc]
                    ip = ir * 2 + ic  # input phase
                    for cin in range(in_ch):
                        row = in_pos[ip, cin]
                        # original kernel flat index at [u, v, cin, :]
                        flat = ((u * k) + v) * in_ch + cin
                        cols = (p * 2 + q) * out_ch + np.arange(out_ch)
                        src[a, b_, row, cols] = flat * out_ch + np.arange(out_ch)
                        mask[a, b_, row, cols] = True
    return src, mask


def fold_kernel(
    kernel: jax.Array, in_splits: t.Optional[t.Sequence[int]] = None
) -> jax.Array:
    """(k,k,C,O) stride-1 odd-k conv kernel -> folded (k',k',4C,4O) kernel
    such that conv(fold(x), folded) == fold(conv(x, kernel)) with SAME
    padding of (k'-1)/2 in folded space (exact: the extra padded row/col in
    original space only meets structurally-zero taps)."""
    k, k2, cin, cout = kernel.shape
    assert k == k2, kernel.shape
    splits = tuple(in_splits) if in_splits is not None else (cin,)
    assert sum(splits) == cin, (splits, cin)
    src, mask = _fold_gather_index(k, cin, cout, splits)
    flat = kernel.reshape(-1)
    kf = flat[jnp.asarray(src.reshape(-1))].reshape(src.shape)
    return jnp.where(jnp.asarray(mask), kf, 0)


def fold_vector(v: jax.Array) -> jax.Array:
    """Per-out-channel vector (bias / BN scale) -> folded (4O,) phase-major
    tile."""
    return jnp.tile(v, 4)


def fold_conv_transpose_2x2_kernel(kernel: jax.Array) -> jax.Array:
    """flax ConvTranspose kernel (2,2,Cin,Cout) with stride 2 -> a folded
    1x1 conv kernel (1,1,Cin,4Cout): output (2i+p,2j+q,o) = sum_c
    x[i,j,c] * K[1-p,1-q,c,o] (non-overlapping taps, spatially flipped —
    lax.conv_transpose with transpose_kernel=False; verified numerically),
    so each output phase is an independent 1x1 projection of the SAME
    (unfolded) input pixel."""
    k = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3))  # (Cin, 2, 2, Cout)
    cin = kernel.shape[2]
    return k.reshape(cin, 4 * kernel.shape[3])[None, None]


def folded_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: t.Optional[jax.Array] = None,
    in_splits: t.Optional[t.Sequence[int]] = None,
    dtype: t.Any = None,
) -> jax.Array:
    """Apply an unfolded-parameter (k,k,C,O) stride-1 conv to a FOLDED input
    (B,Hf,Wf,4C); returns folded (B,Hf,Wf,4O)."""
    kf = fold_kernel(kernel, in_splits)
    if dtype is not None:
        x = x.astype(dtype)
        kf = kf.astype(dtype)
    pad = (kf.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        kf,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + fold_vector(bias).astype(y.dtype)
    return y


def folded_batch_norm(
    y: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    epsilon: float = 1e-5,
) -> jax.Array:
    """Normalize a folded tensor with UNFOLDED (C,)-shaped statistics/affine
    parameters (tied across the 4 phases — exactly the unfolded BN)."""
    yf = y.astype(jnp.float32)
    m = fold_vector(mean)
    v = fold_vector(var)
    s = fold_vector(scale)
    b = fold_vector(bias)
    out = (yf - m) * jax.lax.rsqrt(v + epsilon) * s + b
    return out.astype(y.dtype)


def folded_batch_stats(y: jax.Array) -> t.Tuple[jax.Array, jax.Array]:
    """Batch mean/var over (B,Hf,Wf,phases) of a folded tensor — identical
    to the unfolded batch statistics (the phase axis is just spatial)."""
    b, hf, wf, c4 = y.shape
    c = c4 // 4
    yf = y.astype(jnp.float32).reshape(b, hf, wf, 4, c)
    m = jnp.mean(yf, axis=(0, 1, 2, 3))
    v = jnp.var(yf, axis=(0, 1, 2, 3))
    return m, v
