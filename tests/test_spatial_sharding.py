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
from vision_mtl_tpu.train.step import make_train_step


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
