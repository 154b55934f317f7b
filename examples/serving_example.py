"""Serving walkthrough: load a trained run, AOT-compile a Predictor, export
a portable StableHLO artifact, and measure request latency.

Usage:
    python examples/serving_example.py --run_dir \
        vision_mtl_tpu/lightning_logs/training-basic/<run>/version_0 \
        [--batch_size 8] [--export /tmp/model.stablehlo]

Without --run_dir it builds a freshly initialized basic model on the
synthetic config (useful as a smoke run on any backend).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default=None, help="training run version dir")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--export", default=None, help="write a StableHLO artifact")
    p.add_argument("--requests", type=int, default=20)
    args = p.parse_args()

    from vision_mtl_tpu.serving import Predictor, export_model, latency_bench
    from vision_mtl_tpu.train.state import create_train_state

    if args.run_dir:
        import argparse as ap

        from vision_mtl_tpu.cfg import fetch_data_cfg
        from vision_mtl_tpu.eval_harness import _load_run_args
        from vision_mtl_tpu.pipeline import init_model
        from vision_mtl_tpu.train.checkpoint import restore_state

        run_args = _load_run_args(args.run_dir)
        data_cfg = fetch_data_cfg(run_args.get("dataset_name", "synthetic"))
        h, w, num_classes = data_cfg.height, data_cfg.width, data_cfg.num_classes
        model, state = init_model(
            ap.Namespace(
                model_name=run_args.get("model_name", "basic"),
                batch_size=args.batch_size,
                lr=1e-3,
                ckpt_dir=None,
                channel_wise_stitching=run_args.get(
                    "channel_wise_stitching", True
                ),
                seed=11,
            ),
            data_cfg,
        )
        state = restore_state(state, args.run_dir)
    else:
        from vision_mtl_tpu.cfg import fetch_data_cfg
        from vision_mtl_tpu.models.basic import BasicMTLModel

        data_cfg = fetch_data_cfg("synthetic")
        h, w, num_classes = data_cfg.height, data_cfg.width, data_cfg.num_classes
        model = BasicMTLModel(
            segm_classes=num_classes, decoder_first_channel=64,
            dtype=jnp.bfloat16,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((args.batch_size, h, w, 3)),
            lr=1e-3,
        )

    predictor = Predictor(model, state, args.batch_size, h, w)
    imgs = np.random.default_rng(0).uniform(
        size=(args.batch_size, h, w, 3)
    ).astype(np.float32)
    out = predictor(imgs)
    print(f"predict: segm {out['segm'].shape} depth {out['depth'].shape}")

    # ragged final batch: the predictor pads to the compiled shape
    ragged = max(1, args.batch_size - 1)
    out_r = predictor(imgs[:ragged])
    assert out_r["segm"].shape[0] == ragged

    stats = latency_bench(predictor, imgs, n=args.requests)
    print(
        f"latency bs{args.batch_size}: p50 {stats['p50_ms']:.1f}ms "
        f"p95 {stats['p95_ms']:.1f}ms p99 {stats['p99_ms']:.1f}ms"
    )

    if args.export:
        export_model(model, state, args.batch_size, h, w, args.export)
        print(f"wrote StableHLO artifact: {args.export} "
              f"({os.path.getsize(args.export)/1e6:.1f} MB)")

    # dynamic micro-batching: concurrent single-image requests coalesce
    # into bucketed statically-shaped batches
    import concurrent.futures

    from vision_mtl_tpu.serving import BatchingServer

    with BatchingServer(
        model, state, h, w,
        buckets=(1, max(1, args.batch_size // 2), args.batch_size),
    ) as srv:
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            futs = [
                pool.submit(srv.predict, imgs[i % len(imgs)])
                for i in range(args.requests)
            ]
            for f in futs:
                f.result()
        s = srv.stats()
        print(
            f"batching server: {s['requests']} requests in {s['batches']} "
            f"batches, occupancy {s['mean_batch_occupancy']:.2f}"
        )


if __name__ == "__main__":
    main()
