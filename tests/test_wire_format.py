"""Compact host->device wire format: roundtrip bounds and step equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.data.loader import DataLoader, compress_batch
from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset
from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import decode_batch, make_eval_step


def test_compress_roundtrip_bounds(rng):
    batch = {
        "img": rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32),
        "mask": rng.integers(0, 19, size=(2, 8, 8)).astype(np.int32),
        "depth": rng.uniform(0, 1, size=(2, 8, 8, 1)).astype(np.float32),
    }
    c = compress_batch(batch)
    assert c["img"].dtype == np.uint8
    assert c["mask"].dtype == np.uint8
    assert c["depth"].dtype == np.uint16
    d = decode_batch({k: jnp.asarray(v) for k, v in c.items()})
    np.testing.assert_array_equal(np.asarray(d["mask"]), batch["mask"])
    assert np.max(np.abs(np.asarray(d["img"]) - batch["img"])) <= 0.5 / 255
    assert np.max(np.abs(np.asarray(d["depth"]) - batch["depth"])) <= 0.5 / 65535


def test_uint8_sourced_image_is_lossless(rng):
    src = rng.integers(0, 256, size=(1, 4, 4, 3)).astype(np.uint8)
    batch = {"img": src.astype(np.float32) / 255.0,
             "mask": np.zeros((1, 4, 4), np.int32),
             "depth": np.zeros((1, 4, 4, 1), np.float32)}
    c = compress_batch(batch)
    np.testing.assert_array_equal(c["img"], src)
    d = decode_batch({k: jnp.asarray(v) for k, v in c.items()})
    np.testing.assert_allclose(np.asarray(d["img"]), batch["img"], atol=1e-7)


def test_loader_wire_format():
    ds = SyntheticMTLDataset(stage="val")
    b = next(iter(DataLoader(ds, batch_size=4, wire_format="compact")))
    assert b["img"].dtype == np.uint8
    assert b["depth"].dtype == np.uint16
    b2 = next(iter(DataLoader(ds, batch_size=4)))
    assert b2["img"].dtype == np.float32


def test_eval_step_compact_close_to_f32(rng):
    nc = 5
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": nc},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=2,
        dtype=jnp.float32,
    )
    batch = {
        "img": rng.uniform(size=(2, 16, 16, 3)).astype(np.float32),
        "mask": rng.integers(0, nc, size=(2, 16, 16)).astype(np.int32),
        "depth": rng.uniform(0.05, 1, size=(2, 16, 16, 1)).astype(np.float32),
    }
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batch["img"]), lr=1e-3
    )
    step = make_eval_step(model)
    m1, l1 = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                  init_metrics(nc))
    compact = compress_batch(batch)
    m2, l2 = step(state, {k: jnp.asarray(v) for k, v in compact.items()},
                  init_metrics(nc))
    r1, r2 = compute_metrics(m1), compute_metrics(m2)
    assert float(l1["loss"]) == pytest.approx(float(l2["loss"]), rel=2e-3)
    assert float(r1["mae"]) == pytest.approx(float(r2["mae"]), abs=2e-3)
