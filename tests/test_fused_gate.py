"""Fused attention gate: Pallas kernel (interpret) vs jnp; GateChain paths."""

import numpy as np

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.mtan import GateChain
from vision_mtl_tpu.ops.pallas.fused_gate import (
    fold_bn,
    fused_attention_gate,
    fused_attention_gate_train,
)


def test_kernel_matches_jnp(rng):
    b, h, w, cin, hid, c2 = 2, 8, 16, 3, 32, 16
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    shared = jnp.asarray(rng.normal(size=(b, h, w, c2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(scale=0.3, size=(cin, hid)).astype(np.float32))
    c1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(scale=0.3, size=(hid, c2)).astype(np.float32))
    c2v = jnp.asarray(rng.normal(size=(c2,)).astype(np.float32))

    got = fused_attention_gate(x, shared, w1, c1, w2, c2v, interpret=True)
    hdn = jax.nn.relu(x @ w1 + c1)
    attn = jax.nn.sigmoid(hdn @ w2 + c2v)
    ref = shared * attn
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_train_kernel_matches_jnp(rng):
    """3-pass train-mode forward (VERDICT r3 #4b): output AND the returned
    batch statistics match the GateChain jnp train path's math."""
    b, h, w, cin, hid, c2 = 2, 8, 16, 3, 32, 16
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    shared = jnp.asarray(rng.normal(size=(b, h, w, c2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(scale=0.3, size=(cin, hid)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, hid).astype(np.float32))
    o1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(scale=0.3, size=(hid, c2)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(c2,)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, c2).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(c2,)).astype(np.float32))

    got, m1, v1, m2, v2 = fused_attention_gate_train(
        x, shared, w1, b1, s1, o1, w2, b2, s2, o2, interpret=True
    )

    eps = 1e-5
    hdn = (x @ w1 + b1).reshape(-1, hid)
    rm1, rv1 = jnp.mean(hdn, 0), jnp.var(hdn, 0)
    hdn = jax.nn.relu((hdn - rm1) * jax.lax.rsqrt(rv1 + eps) * s1 + o1)
    a = (hdn @ w2 + b2)
    rm2, rv2 = jnp.mean(a, 0), jnp.var(a, 0)
    attn = jax.nn.sigmoid((a - rm2) * jax.lax.rsqrt(rv2 + eps) * s2 + o2)
    ref = shared * attn.reshape(b, h, w, c2)

    np.testing.assert_allclose(np.asarray(m1), np.asarray(rm1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(rv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(rm2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(rv2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fold_bn():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
    s, c = fold_bn(bias, g, b, m, v)
    ref = ((z + bias) - m) / jnp.sqrt(v + 1e-5) * g + b
    np.testing.assert_allclose(np.asarray(z * s + c), np.asarray(ref), atol=1e-5)


def test_gatechain_train_vs_eval_consistency(rng):
    """After many identical train steps the running stats converge to the
    batch stats, so eval output approaches train output."""
    gc = GateChain(hidden=8, gate_features=4, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    shared = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    variables = gc.init(jax.random.key(0), x, shared, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    train_out = None
    for _ in range(400):
        train_out, mut = gc.apply(
            {"params": params, "batch_stats": stats},
            x,
            shared,
            True,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
    eval_out = gc.apply(
        {"params": params, "batch_stats": stats}, x, shared, False
    )
    np.testing.assert_allclose(
        np.asarray(eval_out), np.asarray(train_out), atol=1e-2, rtol=1e-2
    )


def test_gatechain_param_structure(rng):
    gc = GateChain(hidden=8, gate_features=4)
    x = jnp.zeros((1, 4, 4, 3))
    shared = jnp.zeros((1, 4, 4, 4))
    v = jax.eval_shape(lambda: gc.init(jax.random.key(0), x, shared, True))
    assert set(v["params"]) == {
        "w1", "b1", "w2", "b2", "scale1", "bias1", "scale2", "bias2"
    }
    assert set(v["batch_stats"]) == {"mean1", "var1", "mean2", "var2"}
    assert v["params"]["w1"].shape == (3, 8)
    assert v["params"]["w2"].shape == (8, 4)
