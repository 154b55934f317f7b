"""Serving-path benchmark: request latency + dynamic-batcher throughput.

The reference has no serving story to compare against (its inference is the
predict loop, training_lit.py:186-216); this measures OUR serving stack on
the real chip so the numbers in docs/BENCH_NOTES.md are grounded:

  1. Predictor AOT-program latency per batch bucket (p50/p95/p99) — the pure
     model+transfer cost of one request at each compiled batch size.
  2. BatchingServer throughput under K concurrent blocking clients — how well
     dynamic micro-batching coalesces a single-image request stream into
     full TPU batches (occupancy is reported alongside img/s).
  3. Optional HTTP end-to-end latency (--http): one uint8 image POSTed to a
     live daemon, timed through the full npy-in/npz-out wire path.

Timing notes (docs/BENCH_NOTES.md): every latency sample ends in a host
fetch of the outputs (Predictor.__call__ does jax.device_get), which is the
only honest sync on relay-attached TPUs; on such hosts the D2H transfer of
the segm/depth maps is part of the number — stated in the output.

Usage: python scripts/bench_serving.py [--device tpu] [--height 128]
           [--width 256] [--buckets 1,4,8,32] [--clients 16] [--n 50]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu", help="'tpu' or 'cpu[:N]'")
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--buckets", default="1,4,8,32")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests_per_client", type=int, default=32)
    p.add_argument("--n", type=int, default=50, help="latency samples/bucket")
    p.add_argument("--max_wait_ms", type=float, default=2.0)
    p.add_argument(
        "--wire_dtype",
        choices=("float32", "uint8"),
        default="float32",
        help="compiled input dtype (uint8 = 4x smaller H2D, /255 on device)",
    )
    p.add_argument(
        "--inflight", type=int, default=0,
        help="per-client outstanding requests (0 = blocking clients, the "
        "legacy r4 pattern). K>1 makes offered load exceed service rate "
        "so the batcher is measured at SATURATION (VERDICT r4 #1)",
    )
    p.add_argument(
        "--compact_out", action="store_true",
        help="uint8 segm argmax + f16 depth on the response wire (~4x "
        "smaller D2H — the binding bound on relay-attached hosts)",
    )
    p.add_argument("--run_dir", default=None, help="serve a trained run")
    p.add_argument("--http", action="store_true", help="also time HTTP e2e")
    args = p.parse_args()

    from vision_mtl_tpu.utils.args import select_backend

    select_backend(args.device)

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 8 bucket programs (Predictor sweep +
    # the batcher's own instances) dedupe across and within runs
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.serving import BatchingServer, Predictor, latency_bench

    buckets = tuple(int(b) for b in args.buckets.split(","))
    h, w = args.height, args.width

    if args.run_dir:
        from vision_mtl_tpu.eval_harness import _load_run_args, load_run_model

        run_args = _load_run_args(args.run_dir)
        model, state, data_cfg, _ = load_run_model(
            run_args["model_name"],
            args.run_dir,
            run_args["dataset_name"],
            batch_size=max(buckets),
        )
        h, w = data_cfg.height, data_cfg.width
        label = f"{run_args['model_name']} ({args.run_dir})"
    else:
        from vision_mtl_tpu.models.basic import BasicMTLModel
        from vision_mtl_tpu.train.state import create_train_state

        model = BasicMTLModel(
            segm_classes=19, decoder_first_channel=540, dtype=jnp.bfloat16
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, h, w, 3)), lr=1e-3
        )
        label = "basic (flagship config, fresh weights)"

    wire_u8 = args.wire_dtype == "uint8"
    jdtype = jnp.uint8 if wire_u8 else jnp.float32
    print(
        f"backend={jax.default_backend()}  model={label}  image={h}x{w}  "
        f"wire={args.wire_dtype}"
    )
    rng = np.random.default_rng(0)

    def make_imgs(n: int) -> np.ndarray:
        if wire_u8:
            return rng.integers(0, 256, size=(n, h, w, 3)).astype(np.uint8)
        return rng.uniform(0, 1, size=(n, h, w, 3)).astype(np.float32)

    # -- 1. per-bucket AOT program latency ---------------------------------
    results: dict = {"wire_dtype": args.wire_dtype, "buckets": {}}
    for b in buckets:
        t0 = time.perf_counter()
        pred = Predictor(model, state, b, h, w, dtype=jdtype)
        compile_s = time.perf_counter() - t0
        imgs = make_imgs(b)
        lat = latency_bench(pred, imgs, n=args.n)
        lat["imgs_per_s"] = b / (lat["p50_ms"] / 1000.0)
        results["buckets"][b] = {"compile_s": round(compile_s, 1), **lat}
        print(
            f"bucket {b:4d}: p50 {lat['p50_ms']:7.2f} ms  "
            f"p95 {lat['p95_ms']:7.2f} ms  p99 {lat['p99_ms']:7.2f} ms  "
            f"{lat['imgs_per_s']:8.1f} img/s  (compile {compile_s:.1f}s)"
        )

    # -- 2. dynamic batcher under concurrent single-image clients ----------
    with BatchingServer(
        model, state, h, w, buckets=buckets, max_wait_ms=args.max_wait_ms,
        dtype=jdtype, compact_out=args.compact_out,
    ) as server:
        img = make_imgs(1)[0]

        def client_blocking(_i: int) -> float:
            lats = []
            for _ in range(args.requests_per_client):
                t0 = time.perf_counter()
                server.predict(img)
                lats.append(time.perf_counter() - t0)
            return float(np.median(lats))

        def client_pipelined(_i: int) -> float:
            """Keep --inflight requests outstanding: offered load exceeds
            service rate, so the batcher is measured at saturation."""
            from collections import deque

            lats = []
            outstanding: deque = deque()
            for _ in range(args.requests_per_client):
                if len(outstanding) >= args.inflight:
                    t0, fut = outstanding.popleft()
                    fut.result()
                    lats.append(time.perf_counter() - t0)
                outstanding.append((time.perf_counter(), server.submit(img)))
            while outstanding:
                t0, fut = outstanding.popleft()
                fut.result()
                lats.append(time.perf_counter() - t0)
            return float(np.median(lats))

        client = client_pipelined if args.inflight > 0 else client_blocking

        # warm every bucket program + the queue path, then zero the
        # counters so the reported stats cover only the timed window
        server.warmup()
        probe = server.predict(img)
        server.reset_stats()
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
            medians = list(ex.map(client, range(args.clients)))
        wall = time.perf_counter() - t0
        total = args.clients * args.requests_per_client
        stats = server.stats()
        # wire-byte accounting: is the number transfer-bound? (on relay
        # hosts the tunnel envelope is ~20-45 MB/s — BENCH_NOTES)
        bytes_per_req = img.nbytes + sum(v.nbytes for v in probe.values())
        wire_mbps = total / wall * bytes_per_req / 1e6
        results["batching"] = {
            "clients": args.clients,
            "inflight_per_client": args.inflight,
            "compact_out": args.compact_out,
            "total_requests": total,
            "imgs_per_s": round(total / wall, 1),
            "client_median_latency_ms": round(
                1000 * float(np.median(medians)), 2
            ),
            "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 3),
            "batches": stats["batches"],
            "wire_bytes_per_request": bytes_per_req,
            "achieved_wire_MBps": round(wire_mbps, 1),
        }
        print(
            f"batcher: {args.clients} clients x {args.requests_per_client} "
            f"reqs (inflight {args.inflight or 'blocking'}) -> "
            f"{results['batching']['imgs_per_s']} img/s, "
            f"median client latency "
            f"{results['batching']['client_median_latency_ms']} ms, "
            f"occupancy {results['batching']['mean_batch_occupancy']} "
            f"({stats['batches']} batches), wire {wire_mbps:.1f} MB/s "
            f"({bytes_per_req / 1e3:.0f} KB/req)"
        )

    # -- 3. HTTP end-to-end (optional) --------------------------------------
    if args.http:
        import io
        import urllib.request

        from vision_mtl_tpu.serve import make_server, serve_in_thread

        batcher = BatchingServer(
            model, state, h, w, buckets=buckets,
            max_wait_ms=args.max_wait_ms, dtype=jdtype,
            compact_out=args.compact_out,
        )
        httpd = make_server(
            batcher, (h, w, 3),
            wire_dtype=np.uint8 if wire_u8 else np.float32,
        )
        serve_in_thread(httpd)
        host, port = httpd.server_address[:2]
        buf = io.BytesIO()
        np.save(buf, img if wire_u8 else (img * 255).astype(np.uint8))
        body = buf.getvalue()
        url = f"http://{host}:{port}/predict"

        # serial latency (one warm connection's view)
        batcher.warmup()
        lats = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            with urllib.request.urlopen(
                urllib.request.Request(url, data=body, method="POST")
            ) as r:
                r.read()
            lats.append((time.perf_counter() - t0) * 1000.0)
        lats.sort()
        results["http"] = {
            "p50_ms": round(lats[len(lats) // 2], 2),
            "p99_ms": round(lats[min(int(len(lats) * 0.99), len(lats) - 1)], 2),
        }
        print(f"http e2e: p50 {results['http']['p50_ms']} ms")

        # concurrent-client throughput over the real wire (the http.server
        # daemon is ThreadingHTTPServer: one thread per connection, so
        # --clients concurrent POST streams coalesce in the batcher)
        def http_client(_i: int) -> int:
            for _ in range(args.requests_per_client):
                with urllib.request.urlopen(
                    urllib.request.Request(url, data=body, method="POST")
                ) as r:
                    r.read()
            return args.requests_per_client

        batcher.reset_stats()
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
            total = sum(ex.map(http_client, range(args.clients)))
        wall = time.perf_counter() - t0
        stats = batcher.stats()
        results["http_concurrent"] = {
            "clients": args.clients,
            "imgs_per_s": round(total / wall, 1),
            "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 3),
        }
        print(
            f"http concurrent: {args.clients} clients -> "
            f"{results['http_concurrent']['imgs_per_s']} img/s, occupancy "
            f"{results['http_concurrent']['mean_batch_occupancy']}"
        )
        httpd.shutdown()
        httpd.server_close()
        batcher.close()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
