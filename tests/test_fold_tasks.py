"""MTAN task-folded attention streams (fold_tasks=True).

The T per-task attention modules at each level run as ONE nn.vmap'd call
over a leading task axis (VERDICT r3 hypothesis 4a: cut per-conv dispatch/
padding waste). Math per task is unchanged; params live stacked. These
tests pin exactness against the unfolded model via fold_task_variables.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.mtan import MTANMiniUnet, fold_task_variables

NC = 5


def _models():
    kw = dict(
        map_tasks_to_num_channels={"depth": 1, "segm": NC},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=3,
        dtype=jnp.float32,
    )
    return MTANMiniUnet(**kw), MTANMiniUnet(fold_tasks=True, **kw)


def test_folded_forward_matches_unfolded():
    base, folded = _models()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    v = base.init(jax.random.key(0), x, train=False)
    vf = jax.tree.map(jnp.asarray, fold_task_variables(jax.device_get(v), 2))

    # folded init produces the same tree STRUCTURE as the converted one
    vf_shape = jax.eval_shape(lambda: folded.init(jax.random.key(0), x, False))
    assert jax.tree_util.tree_structure(vf_shape) == jax.tree_util.tree_structure(vf)
    for a, b in zip(jax.tree.leaves(vf_shape), jax.tree.leaves(vf)):
        assert a.shape == b.shape, (a.shape, b.shape)

    out = base.apply(v, x, train=False)
    out_f = folded.apply(vf, x, train=False)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_f[k]), rtol=1e-6, atol=1e-6
        )


def test_folded_train_step_stats_match():
    base, folded = _models()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    v = base.init(jax.random.key(0), x, train=True)
    vf = jax.tree.map(jnp.asarray, fold_task_variables(jax.device_get(v), 2))

    out, upd = base.apply(v, x, train=True, mutable=["batch_stats"])
    out_f, upd_f = folded.apply(vf, x, train=True, mutable=["batch_stats"])
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_f[k]), rtol=1e-5, atol=1e-6
        )
    want = fold_task_variables(jax.device_get(upd), 2)["batch_stats"]
    got = jax.device_get(upd_f)["batch_stats"]
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(want)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=lambda kv: str(kv[0])),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_folded_gradients_match():
    base, folded = _models()
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 16, 16, 3)).astype(np.float32)
    )
    v = base.init(jax.random.key(0), x, train=True)
    vf = jax.tree.map(jnp.asarray, fold_task_variables(jax.device_get(v), 2))

    def loss(params, model, variables):
        out, _ = model.apply(
            {**variables, "params": params}, x, train=True,
            mutable=["batch_stats"],
        )
        # mean (not sum): sum amplifies the f32 cancellation noise on
        # bias-into-BN leaves whose true gradient is analytically ~0
        return sum(
            jnp.mean(jnp.square(o.astype(jnp.float32))) for o in out.values()
        )

    g = jax.grad(loss)(v["params"], base, v)
    gf = jax.grad(loss)(vf["params"], folded, vf)
    want = fold_task_variables({"params": jax.device_get(g)}, 2)["params"]
    got = jax.device_get(gf)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(want)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=lambda kv: str(kv[0])),
    ):
        assert str(pa) == str(pb)
        a = np.asarray(a)
        b = np.asarray(b)
        # grouped-conv backward reassociates float accumulation; compare
        # against the leaf's own gradient scale, not elementwise rtol
        # floor: bias-into-BN leaves have analytically-zero gradients
        # (both sides compute ~1e-10 f32 cancellation noise)
        scale = float(np.max(np.abs(a)))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-3 * scale + 1e-6)
