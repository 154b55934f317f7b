"""Serving: AOT predictor, ragged padding, export/load roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.serving import (
    Predictor,
    export_model,
    latency_bench,
    load_exported,
)
from vision_mtl_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def model_state():
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": 5},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 16, 16, 3)), lr=1e-3
    )
    return model, state


def test_predictor_shapes_and_padding(model_state, rng):
    model, state = model_state
    pred = Predictor(model, state, batch_size=4, height=16, width=16)
    # full batch
    out = pred(rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
    assert out["segm"].shape == (4, 16, 16)
    assert out["depth"].shape == (4, 16, 16, 1)
    # ragged batch padded internally, trimmed on return
    out3 = pred(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    assert out3["segm"].shape == (3, 16, 16)
    with pytest.raises(ValueError):
        pred(np.zeros((5, 16, 16, 3), np.float32))


def test_predictor_matches_direct_apply(model_state, rng):
    model, state = model_state
    imgs = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    pred = Predictor(model, state, batch_size=4, height=16, width=16)
    got = pred(imgs)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(imgs),
        train=False,
    )
    np.testing.assert_array_equal(
        got["segm"], np.argmax(np.asarray(out["segm"]), -1)
    )


def test_export_roundtrip(model_state, rng, tmp_path):
    model, state = model_state
    imgs = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "model.stablehlo")
    export_model(model, state, 2, 16, 16, path)
    fn = load_exported(path)
    out = fn(imgs)
    pred = Predictor(model, state, batch_size=2, height=16, width=16)
    ref = pred(imgs)
    np.testing.assert_array_equal(out["segm"], ref["segm"])
    np.testing.assert_allclose(out["depth"], ref["depth"], rtol=1e-6)


def test_latency_bench_reports(model_state, rng):
    model, state = model_state
    pred = Predictor(model, state, batch_size=2, height=16, width=16)
    stats = latency_bench(
        pred, rng.uniform(size=(2, 16, 16, 3)).astype(np.float32), n=5, warmup=1
    )
    assert stats["p50_ms"] > 0
    assert stats["p99_ms"] >= stats["p50_ms"]


def test_meshed_predictor_matches_single_device(rng):
    """A data+spatial-meshed AOT Predictor must produce identical preds to
    the unmeshed one (multi-chip batch-parallel serving)."""
    from vision_mtl_tpu.parallel.mesh import create_mesh

    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": 5},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    imgs = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(imgs), lr=1e-3
    )
    p0 = Predictor(model, state, batch_size=8, height=32, width=32)
    mesh = create_mesh("data:4,spatial:2")
    p1 = Predictor(
        model, state, batch_size=8, height=32, width=32, mesh=mesh
    )
    o0, o1 = p0(imgs), p1(imgs)
    np.testing.assert_array_equal(o0["segm"], o1["segm"])
    np.testing.assert_allclose(o0["depth"], o1["depth"], rtol=1e-5, atol=1e-6)
    # ragged final batch pads under the mesh too
    o2 = p1(imgs[:3])
    np.testing.assert_array_equal(o2["segm"], o0["segm"][:3])
