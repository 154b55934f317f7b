"""Spatial (H-axis) sharding correctness: jit over a data x spatial mesh must
reproduce single-device numerics — XLA inserts conv halo exchanges at shard
boundaries (the dense-prediction analog of sequence parallelism)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.parallel.mesh import create_mesh, put_batch
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import (
    make_eval_step,
    make_predict_eval_step,
    make_train_step,
)


def _model(nc=5):
    return MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )


def test_data_spatial_mesh_matches_single_device(rng):
    nc = 5
    model = _model(nc)
    bs, h, w = 4, 32, 16
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, nc, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(
            rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)
        ),
    }
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)

    step_ref = make_train_step(model, donate=False)
    s_ref, m_ref, l_ref = step_ref(state, batch, init_metrics(nc))

    mesh = create_mesh("data:4,spatial:2")
    sharded = put_batch(batch, mesh)
    # verify the layout really is sharded over both axes
    img_sharding = sharded["img"].sharding
    assert img_sharding.spec[0] == "data" and img_sharding.spec[1] == "spatial"

    step_sp = make_train_step(model, mesh=mesh, donate=False)
    s_sp, m_sp, l_sp = step_sp(state, sharded, init_metrics(nc))

    assert float(l_ref["loss"]) == pytest.approx(float(l_sp["loss"]), rel=1e-4)
    r_ref, r_sp = compute_metrics(m_ref), compute_metrics(m_sp)
    for k in ("accuracy", "jaccard_index", "fbeta_score", "mae"):
        assert float(r_ref[k]) == pytest.approx(float(r_sp[k]), rel=1e-5), k
    p_ref = np.asarray(jax.tree.leaves(s_ref.params)[0])
    p_sp = np.asarray(jax.tree.leaves(s_sp.params)[0])
    np.testing.assert_allclose(p_ref, p_sp, rtol=2e-4, atol=2e-6)


def _batch(rng, bs=4, h=32, w=16, nc=5):
    return {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, nc, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(
            rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)
        ),
    }


def test_eval_metrics_identical_across_mesh_configs(rng):
    """Eval under a data+spatial mesh must reproduce single-device metrics —
    including when the caller hands over an UNSHARDED batch (the in-step
    with_sharding_constraint, not caller placement, pins the layout)."""
    nc = 5
    model = _model(nc)
    batch = _batch(rng, nc=nc)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)

    m_ref, l_ref = make_eval_step(model)(state, batch, init_metrics(nc))
    r_ref = compute_metrics(m_ref)

    for spec in ("data:8", "data:4,spatial:2", "data:2,spatial:2"):
        mesh = create_mesh(spec, devices=jax.devices()[: np.prod(
            [int(p.split(":")[1]) for p in spec.split(",")]
        )])
        # deliberately NOT put_batch-sharded: replicated input, meshed step
        m_sp, l_sp = make_eval_step(model, mesh=mesh)(
            state, batch, init_metrics(nc)
        )
        assert float(l_ref["loss"]) == pytest.approx(
            float(l_sp["loss"]), rel=1e-5
        ), spec
        r_sp = compute_metrics(m_sp)
        for k in ("accuracy", "jaccard_index", "fbeta_score", "mae"):
            assert float(r_ref[k]) == pytest.approx(
                float(r_sp[k]), rel=1e-5
            ), (spec, k)


def test_predict_eval_matches_single_device_under_mesh(rng):
    nc = 5
    model = _model(nc)
    batch = _batch(rng, nc=nc)
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=1e-3)

    preds_ref, m_ref, _ = make_predict_eval_step(model)(
        state, batch, init_metrics(nc)
    )
    mesh = create_mesh("data:4,spatial:2")
    preds_sp, m_sp, _ = make_predict_eval_step(model, mesh=mesh)(
        state, put_batch(batch, mesh), init_metrics(nc)
    )
    np.testing.assert_array_equal(
        np.asarray(preds_ref["segm"]), np.asarray(preds_sp["segm"])
    )
    np.testing.assert_allclose(
        np.asarray(preds_ref["depth"]),
        np.asarray(preds_sp["depth"]),
        rtol=1e-5,
        atol=1e-6,
    )
    r_ref, r_sp = compute_metrics(m_ref), compute_metrics(m_sp)
    for k in ("accuracy", "jaccard_index", "fbeta_score", "mae"):
        assert float(r_ref[k]) == pytest.approx(float(r_sp[k]), rel=1e-5), k
