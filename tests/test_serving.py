"""Serving: AOT predictor, ragged padding, export/load roundtrip,
dynamic micro-batching server."""

import concurrent.futures

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.serving import (
    BatchingServer,
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


@pytest.fixture(scope="module")
def batching_server(model_state):
    model, state = model_state
    with BatchingServer(
        model, state, height=16, width=16, buckets=(1, 2, 4), max_wait_ms=5.0
    ) as srv:
        yield srv


def test_batching_server_matches_predictor(model_state, batching_server, rng):
    """Concurrent single-image requests come back demuxed and equal to the
    one-shot Predictor's output for the same images."""
    model, state = model_state
    imgs = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    ref = Predictor(model, state, batch_size=4, height=16, width=16)(imgs)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        futs = list(pool.map(batching_server.submit, imgs))
    for i, fut in enumerate(futs):
        out = fut.result(timeout=60)
        assert out["segm"].shape == (16, 16)
        np.testing.assert_array_equal(out["segm"], ref["segm"][i])
        np.testing.assert_allclose(
            out["depth"], ref["depth"][i], rtol=1e-5, atol=1e-6
        )


def test_batching_server_coalesces_and_counts(model_state):
    model, state = model_state
    srv = BatchingServer(
        model, state, height=16, width=16, buckets=(2,), max_wait_ms=200.0
    )
    try:
        imgs = np.zeros((5, 16, 16, 3), np.float32)
        futs = [srv.submit(im) for im in imgs]
        for f in futs:
            f.result(timeout=60)
        s = srv.stats()
        assert s["requests"] == 5
        assert s["batched_images"] == 5
        # 5 requests through a single bucket of 2 -> 3 batches, 1 padded slot
        assert s["batches"] == 3
        assert s["padded_slots"] == 1
        assert 0 < s["mean_batch_occupancy"] <= 1
    finally:
        srv.close()


def test_batching_server_survives_client_cancel(model_state, rng):
    """A client cancelling a pending future must not kill the fetch thread
    (pre-fix: set_result raised InvalidStateError, the dispatch worker then
    wedged at the bounded in-flight queue and close() hung forever)."""
    model, state = model_state
    srv = BatchingServer(
        model, state, height=16, width=16, buckets=(2,), max_wait_ms=500.0
    )
    try:
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        # long max_wait: the first request sits pending long enough to cancel
        doomed = srv.submit(img)
        assert doomed.cancel()
        # a second request fills the batch and must still resolve normally
        ok = srv.submit(img)
        second = srv.submit(img)  # forces a flush of the first batch
        out = ok.result(timeout=60)
        assert out["segm"].shape == (16, 16)
        second.result(timeout=60)
        assert doomed.cancelled()
    finally:
        srv.close()  # pre-fix this hung; the test harness timeout caught it


def test_batching_server_warmup_and_reset_stats(model_state):
    model, state = model_state
    srv = BatchingServer(
        model, state, height=16, width=16, buckets=(1, 2), max_wait_ms=1.0
    )
    try:
        srv.warmup()  # runs every bucket program outside the counters
        srv.predict(np.zeros((16, 16, 3), np.float32))
        assert srv.stats()["requests"] == 1
        srv.reset_stats()
        s = srv.stats()
        assert s["requests"] == 0 and s["batches"] == 0
        assert s["batched_images"] == 0 and s["padded_slots"] == 0
    finally:
        srv.close()


def test_batching_server_pipelined_stream(model_state, rng):
    """A sustained stream of DISTINCT images through the two-stage pipeline
    (dispatch worker + fetch thread, max_in_flight=2) demuxes every request
    to its own result — no cross-wiring between overlapping in-flight
    batches — and matches the one-shot Predictor exactly."""
    model, state = model_state
    n = 12
    imgs = rng.uniform(size=(n, 16, 16, 3)).astype(np.float32)
    ref = Predictor(model, state, batch_size=n, height=16, width=16)(imgs)
    srv = BatchingServer(
        model,
        state,
        height=16,
        width=16,
        buckets=(1, 2),
        max_wait_ms=1.0,
        max_in_flight=2,
    )
    try:
        futs = [srv.submit(im) for im in imgs]  # floods the 2-deep pipeline
        for i, fut in enumerate(futs):
            out = fut.result(timeout=120)
            np.testing.assert_array_equal(out["segm"], ref["segm"][i])
            np.testing.assert_allclose(
                out["depth"], ref["depth"][i], rtol=1e-5, atol=1e-6
            )
        assert srv.stats()["batched_images"] == n
    finally:
        srv.close()
    with pytest.raises(ValueError):
        BatchingServer(
            model, state, height=16, width=16, buckets=(1,), max_in_flight=0
        )


def test_uint8_wire_mode_exact_and_guarded(model_state, rng):
    """uint8-compiled programs normalize on device; results are bit-equal
    to host-normalized float32 input (same astype(f32)/255 arithmetic),
    and float submissions are rejected up front."""
    model, state = model_state
    raw = rng.integers(0, 256, size=(2, 16, 16, 3)).astype(np.uint8)
    f32 = Predictor(model, state, batch_size=2, height=16, width=16)(
        raw.astype(np.float32) / 255.0
    )
    u8 = Predictor(
        model, state, batch_size=2, height=16, width=16, dtype=jnp.uint8
    )(raw)
    np.testing.assert_array_equal(u8["segm"], f32["segm"])
    np.testing.assert_array_equal(u8["depth"], f32["depth"])

    srv = BatchingServer(
        model, state, height=16, width=16, buckets=(2,), dtype=jnp.uint8
    )
    try:
        with pytest.raises(ValueError, match="uint8 wire"):
            srv.submit(np.zeros((16, 16, 3), np.float32))
        out = srv.predict(raw[0])
        np.testing.assert_array_equal(out["segm"], f32["segm"][0])
    finally:
        srv.close()


def test_batching_server_rejects_bad_requests(batching_server):
    with pytest.raises(ValueError):
        batching_server.submit(np.zeros((2, 16, 16, 3), np.float32))
    with pytest.raises(ValueError):
        batching_server.submit(np.zeros((8, 8, 3), np.float32))


def test_batching_server_close_semantics(model_state):
    model, state = model_state
    srv = BatchingServer(
        model, state, height=16, width=16, buckets=(1,), max_wait_ms=1.0
    )
    fut = srv.submit(np.zeros((16, 16, 3), np.float32))
    srv.close()
    # submitted-before-close requests are drained, not dropped
    assert fut.result(timeout=60)["segm"].shape == (16, 16)
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((16, 16, 3), np.float32))
    srv.close()  # idempotent


@pytest.fixture(scope="module")
def http_server(model_state, batching_server):
    from vision_mtl_tpu.serve import make_server, serve_in_thread

    server = make_server(
        batching_server, (16, 16, 3), {"model": "mtan-test"}, port=0
    )
    serve_in_thread(server)
    yield server
    server.shutdown()
    server.server_close()


def _request(server, method, path, body=None):
    import http.client

    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=120)
    try:
        conn.request(method, path, body=body)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


def _npy_bytes(arr):
    import io

    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_predict_roundtrip(model_state, batching_server, http_server, rng):
    import io

    model, state = model_state
    imgs = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
    ref = Predictor(model, state, batch_size=4, height=16, width=16)(imgs)
    status, body = _request(
        http_server, "POST", "/predict", _npy_bytes(imgs)
    )
    assert status == 200
    out = np.load(io.BytesIO(body))
    assert out["segm"].shape == (3, 16, 16)
    assert out["depth"].shape == (3, 16, 16, 1)
    np.testing.assert_array_equal(out["segm"], ref["segm"])
    # single HWC image body works too
    status, body = _request(
        http_server, "POST", "/predict", _npy_bytes(imgs[0])
    )
    assert status == 200
    out1 = np.load(io.BytesIO(body))
    assert out1["segm"].shape == (1, 16, 16)
    np.testing.assert_array_equal(out1["segm"][0], ref["segm"][0])
    # uint8 body normalizes to /255 on receipt
    u8 = (imgs[0] * 255).astype(np.uint8)
    status, body = _request(http_server, "POST", "/predict", _npy_bytes(u8))
    assert status == 200


def test_http_health_stats_and_errors(http_server):
    import json

    status, body = _request(http_server, "GET", "/healthz")
    assert status == 200
    info = json.loads(body)
    assert info["ok"] and info["model"] == "mtan-test"
    status, body = _request(http_server, "GET", "/stats")
    assert status == 200
    assert "requests" in json.loads(body)
    status, _ = _request(http_server, "GET", "/nope")
    assert status == 404
    status, body = _request(http_server, "POST", "/predict", b"not an array")
    assert status == 400
    assert "npy" in json.loads(body)["error"]
    status, body = _request(
        http_server, "POST", "/predict", _npy_bytes(np.zeros((4, 4, 3), np.float32))
    )
    assert status == 400
    assert "expected shape" in json.loads(body)["error"]


def test_http_uint8_wire_server(model_state, rng):
    """A --wire_dtype uint8 daemon serves raw uint8 bodies and 400s float
    bodies instead of silently quantizing them."""
    from vision_mtl_tpu.serve import make_server, serve_in_thread

    model, state = model_state
    with BatchingServer(
        model, state, height=16, width=16, buckets=(1, 2), dtype=jnp.uint8
    ) as srv:
        server = make_server(srv, (16, 16, 3), wire_dtype=np.uint8)
        serve_in_thread(server)
        try:
            raw = rng.integers(0, 256, size=(2, 16, 16, 3)).astype(np.uint8)
            status, body = _request(
                server, "POST", "/predict", _npy_bytes(raw)
            )
            assert status == 200
            import io

            out = np.load(io.BytesIO(body))
            ref = Predictor(
                model, state, batch_size=2, height=16, width=16,
                dtype=jnp.uint8,
            )(raw)
            np.testing.assert_array_equal(out["segm"], ref["segm"])
            status, body = _request(
                server, "POST", "/predict",
                _npy_bytes(raw.astype(np.float32) / 255.0),
            )
            assert status == 400 and b"uint8" in body
        finally:
            server.shutdown()
            server.server_close()


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


def test_compact_out_wire_format(model_state, rng):
    """compact_out=True: segm argmax as uint8 (lossless) and depth as f16
    (quantized within f16 eps of the f32 value) — the ~4x-smaller response
    wire for transfer-bound serving (BENCH_NOTES r5)."""
    model, state = model_state
    imgs = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
    ref = Predictor(model, state, 2, 16, 16)(imgs)
    out = Predictor(model, state, 2, 16, 16, compact_out=True)(imgs)
    assert out["segm"].dtype == np.uint8
    assert out["depth"].dtype == np.float16
    np.testing.assert_array_equal(out["segm"], ref["segm"].astype(np.uint8))
    np.testing.assert_allclose(
        out["depth"].astype(np.float32), ref["depth"], atol=5e-4
    )
    # batching server passes the flag through to every bucket
    with BatchingServer(
        model, state, 16, 16, buckets=(1, 2), compact_out=True
    ) as srv:
        got = srv.predict(imgs[0])
        assert got["segm"].dtype == np.uint8
        np.testing.assert_array_equal(got["segm"], ref["segm"][0])


def test_http_compact_out_server(model_state, rng):
    """serve.py --compact_out: the npz response carries uint8 segm and
    f16 depth (self-describing — clients need no change), values matching
    the full-precision predictor."""
    import io

    from vision_mtl_tpu.serve import make_server, serve_in_thread

    model, state = model_state
    with BatchingServer(
        model, state, height=16, width=16, buckets=(1, 2), compact_out=True
    ) as srv:
        server = make_server(srv, (16, 16, 3))
        serve_in_thread(server)
        try:
            imgs = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
            status, body = _request(server, "POST", "/predict", _npy_bytes(imgs))
            assert status == 200
            out = np.load(io.BytesIO(body))
            assert out["segm"].dtype == np.uint8
            assert out["depth"].dtype == np.float16
            ref = Predictor(model, state, batch_size=2, height=16, width=16)(imgs)
            np.testing.assert_array_equal(out["segm"], ref["segm"])
            np.testing.assert_allclose(
                out["depth"].astype(np.float32), ref["depth"], atol=5e-4
            )
        finally:
            server.shutdown()
            server.server_close()
