"""Exactness of the space-to-depth folded ops (ops/fold.py): every folded
op must reproduce its unfolded counterpart bit-for-bit in f32 (the transform
reassociates additions only with structurally-zero terms)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.ops.fold import (
    depth_to_space,
    fold_conv_transpose_2x2_kernel,
    folded_batch_norm,
    folded_batch_stats,
    folded_conv,
    phase_max,
    space_to_depth,
    tile_for_upsample,
)
from vision_mtl_tpu.ops.interpolate import upsample_nearest_2x


def _x(rng, b=2, h=8, w=12, c=5):
    return jnp.asarray(rng.uniform(-1, 1, size=(b, h, w, c)).astype(np.float32))


def test_fold_roundtrip(rng):
    x = _x(rng)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_fold_phase_layout(rng):
    x = _x(rng, b=1, h=4, w=4, c=3)
    y = np.asarray(space_to_depth(x))
    xn = np.asarray(x)
    for pr in (0, 1):
        for pc in (0, 1):
            np.testing.assert_array_equal(
                y[0, 1, 1, (pr * 2 + pc) * 3 : (pr * 2 + pc + 1) * 3],
                xn[0, 2 + pr, 2 + pc],
            )


@pytest.mark.parametrize("k", [1, 3])
def test_folded_conv_matches_unfolded(rng, k):
    cin, cout = 5, 7
    x = _x(rng, c=cin)
    kernel = jnp.asarray(
        rng.normal(scale=0.3, size=(k, k, cin, cout)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((k // 2, k // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    got = depth_to_space(folded_conv(space_to_depth(x), kernel, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_folded_conv_grouped_concat_layout(rng):
    """concat([fold(a), fold(b)]) consumed via in_splits must equal the
    unfolded conv on concat([a, b])."""
    ca, cb, cout = 3, 4, 6
    a = _x(rng, c=ca)
    b = _x(rng, c=cb)
    kernel = jnp.asarray(
        rng.normal(scale=0.3, size=(3, 3, ca + cb, cout)).astype(np.float32)
    )
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], axis=-1), kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    folded_in = jnp.concatenate([space_to_depth(a), space_to_depth(b)], axis=-1)
    got = depth_to_space(folded_conv(folded_in, kernel, in_splits=(ca, cb)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_tile_for_upsample(rng):
    x = _x(rng)
    np.testing.assert_array_equal(
        np.asarray(tile_for_upsample(x)),
        np.asarray(space_to_depth(upsample_nearest_2x(x))),
    )


def test_phase_max_is_maxpool(rng):
    from vision_mtl_tpu.models.blocks import max_pool_2x

    x = _x(rng)
    np.testing.assert_array_equal(
        np.asarray(phase_max(space_to_depth(x))),
        np.asarray(max_pool_2x(x)),
    )


def test_folded_batch_norm_and_stats(rng):
    c = 5
    x = _x(rng, c=c)
    mean = jnp.asarray(rng.uniform(-0.3, 0.3, c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.3, 0.3, c).astype(np.float32))

    ref = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    got = depth_to_space(
        folded_batch_norm(space_to_depth(x), mean, var, scale, bias)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    m, v = folded_batch_stats(space_to_depth(x))
    xf = np.asarray(x)
    np.testing.assert_allclose(np.asarray(m), xf.mean((0, 1, 2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), xf.var((0, 1, 2)), atol=1e-6)


def test_fold_conv_transpose_2x2(rng):
    cin, cout = 6, 4
    x = _x(rng, c=cin)
    kernel = jnp.asarray(
        rng.normal(scale=0.3, size=(2, 2, cin, cout)).astype(np.float32)
    )
    # unfolded reference: flax-style conv_transpose stride 2 VALID
    ref = jax.lax.conv_transpose(
        x, kernel, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    k1 = fold_conv_transpose_2x2_kernel(kernel)
    got_folded = jax.lax.conv_general_dilated(
        x, k1, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got_folded)), np.asarray(ref), atol=1e-6
    )


def test_basic_model_fold_tail_parity(rng):
    """fold_tail=True must produce the same params (identical tree, identical
    init RNG streams) and the same outputs/gradients as the unfolded model."""
    from vision_mtl_tpu.models.basic import BasicMTLModel

    x = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)).astype(np.float32))
    m0 = BasicMTLModel(segm_classes=5, decoder_first_channel=16, dtype=jnp.float32)
    m1 = BasicMTLModel(
        segm_classes=5, decoder_first_channel=16, fold_tail=True, dtype=jnp.float32
    )
    v0 = m0.init(jax.random.key(3), x, train=False)
    v1 = m1.init(jax.random.key(3), x, train=False)

    # identical param trees and values
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )

    # train mode: BN batch stats + running-stat updates must match too
    o0t, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    o1t, mut1 = m1.apply(v0, x, train=True, mutable=["batch_stats"])
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(o0t[k]), np.asarray(o1t[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # gradient parity through the folded tail
    def loss(variables, model):
        out = model.apply(variables, x, train=False)
        return (
            jnp.sum(out["segm"].astype(jnp.float32) ** 2)
            + jnp.sum(out["depth"].astype(jnp.float32) ** 2)
        )

    g0 = jax.grad(lambda v: loss(v, m0))(v0)
    g1 = jax.grad(lambda v: loss(v, m1))(v0)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(p0),
        )


def test_basic_model_merged_heads_parity(rng):
    """merge_heads=True (the default fast path) must be param-tree- and
    output-identical to the separate-heads model."""
    from vision_mtl_tpu.models.basic import BasicMTLModel

    x = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    m0 = BasicMTLModel(
        segm_classes=5, decoder_first_channel=16, merge_heads=False,
        dtype=jnp.float32,
    )
    m1 = BasicMTLModel(
        segm_classes=5, decoder_first_channel=16, merge_heads=True,
        dtype=jnp.float32,
    )
    v0 = m0.init(jax.random.key(3), x, train=False)
    v1 = m1.init(jax.random.key(3), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_small_conv_pallas_fallback_matches(rng):
    """conv3x3_small on non-TPU backends routes to XLA; values + grads match
    the reference conv."""
    from vision_mtl_tpu.ops.pallas.small_conv import conv3x3_small

    x = jnp.asarray(rng.uniform(size=(2, 16, 24, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(scale=0.3, size=(3, 3, 5, 7)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))

    def ref(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    np.testing.assert_allclose(
        np.asarray(conv3x3_small(x, k, b)), np.asarray(ref(x, k, b)),
        rtol=1e-6, atol=1e-6,
    )
    g0 = jax.grad(lambda k: jnp.sum(ref(x, k, b) ** 2))(k)
    g1 = jax.grad(lambda k: jnp.sum(conv3x3_small(x, k, b) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5)
    gx0 = jax.grad(lambda x: jnp.sum(ref(x, k, b) ** 2))(x)
    gx1 = jax.grad(lambda x: jnp.sum(conv3x3_small(x, k, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-4, atol=1e-5)


def test_basic_model_remat_tail_parity(rng):
    """remat_tail (memory-saving opt-in, measured slower on v5e — BENCH_NOTES
    'remat of the decoder tail') must be transparent: identical param tree,
    bit-identical eval forward, and train gradients/BN-stat updates equal up
    to recompute reassociation rounding."""
    from vision_mtl_tpu.models.basic import BasicMTLModel

    x = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)).astype(np.float32))
    m0 = BasicMTLModel(segm_classes=5, decoder_first_channel=16, dtype=jnp.float32)
    m1 = BasicMTLModel(
        segm_classes=5, decoder_first_channel=16, remat_tail=2, dtype=jnp.float32
    )
    v0 = m0.init(jax.random.key(3), x, train=False)
    v1 = m1.init(jax.random.key(3), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-6, atol=1e-7, err_msg=k
        )

    # train mode — the advertised use case: remat must thread the mutable
    # batch_stats updates and gradients. Gradients through the recompute are
    # mathematically identical but numerically reassociated (XLA fuses the
    # rematerialized forward differently), so this leg uses an fp32-rounding
    # tolerance rather than exact equality.
    def loss(m, v):
        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (
                jnp.sum(out["segm"] ** 2) + jnp.sum(out["depth"] ** 2),
                mut["batch_stats"],
            )
        return jax.grad(f, has_aux=True)(v["params"])

    (g0, bs0), (g1, bs1) = loss(m0, v0), loss(m1, v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5
        )
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_basic_model_remat_encoder_parity(rng):
    """remat_encoder (the high-resolution memory opt-in — BENCH_NOTES
    round-3: makes native-res 1024x2048 training fit on one chip) must be
    transparent: identical param tree, bit-identical eval forward, train
    gradients/BN-stat updates equal up to recompute reassociation."""
    from vision_mtl_tpu.models.basic import BasicMTLModel

    x = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)).astype(np.float32))
    m0 = BasicMTLModel(segm_classes=5, decoder_first_channel=16, dtype=jnp.float32)
    m1 = BasicMTLModel(
        segm_classes=5,
        decoder_first_channel=16,
        remat_encoder=True,
        dtype=jnp.float32,
    )
    v0 = m0.init(jax.random.key(3), x, train=False)
    v1 = m1.init(jax.random.key(3), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-6, atol=1e-7, err_msg=k
        )

    def loss(m, v):
        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (
                jnp.sum(out["segm"] ** 2) + jnp.sum(out["depth"] ** 2),
                mut["batch_stats"],
            )
        # jit both sides; the rematerialized backward still reassociates a
        # handful of reductions (measured: <=0.005% of elements, abs diff
        # <=5e-5 on gradients of magnitude O(10)), so the bound is loose in
        # atol but tight relative to gradient scale
        return jax.jit(jax.grad(f, has_aux=True))(v["params"])

    (g0, bs0), (g1, bs1) = loss(m0, v0), loss(m1, v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4
        )
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_csnet_mtan_remat_flags_transparent(rng):
    """The remat memory opt-ins must be architecture-transparent for csnet
    (remat_encoder — both task encoders) and mtan (remat_attention):
    identical param tree and bit-identical eval forward. (Gradient-level
    remat parity is covered on basic above; the lifted transform is the
    same.)"""
    from vision_mtl_tpu.models.cross_stitch import CSNet
    from vision_mtl_tpu.models.mtan import MTANMiniUnet

    x = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)).astype(np.float32))
    pairs = [
        (
            CSNet(
                task_channels={"depth": 1, "segm": 5},
                decoder_first_channel=16,
                dtype=jnp.float32,
            ),
            CSNet(
                task_channels={"depth": 1, "segm": 5},
                decoder_first_channel=16,
                remat_encoder=True,
                remat_tail=2,
                dtype=jnp.float32,
            ),
        ),
        (
            MTANMiniUnet(
                map_tasks_to_num_channels={"depth": 1, "segm": 5},
                task_subnets_hidden_channels=8,
                encoder_first_channel=8,
                encoder_num_channels=3,
                dtype=jnp.float32,
            ),
            MTANMiniUnet(
                map_tasks_to_num_channels={"depth": 1, "segm": 5},
                task_subnets_hidden_channels=8,
                encoder_first_channel=8,
                encoder_num_channels=3,
                remat_attention=True,
                remat_shared=True,
                dtype=jnp.float32,
            ),
        ),
    ]
    for m0, m1 in pairs:
        v0 = m0.init(jax.random.key(7), x, train=False)
        v1 = m1.init(jax.random.key(7), x, train=False)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        o0 = jax.jit(lambda v, m=m0: m.apply(v, x, train=False))(v0)
        o1 = jax.jit(lambda v, m=m1: m.apply(v, x, train=False))(v0)
        for k in ("segm", "depth"):
            np.testing.assert_allclose(
                np.asarray(o0[k]),
                np.asarray(o1[k]),
                rtol=1e-6,
                atol=1e-7,
                err_msg=f"{type(m0).__name__}/{k}",
            )
