"""Dissect the train-step tail: metric accumulation + postprocess cost.

Measures (honest scalar-fetch sync, device-resident batches) per variant:
  full      — the shipping fused step (fwd+bwd+Adam+postprocess+metrics)
  nometrics — same step with the metric update replaced by a passthrough
              (XLA then DCEs the argmax + one-hot confmat too)
  noopt     — full step with the Adam update skipped (grads still computed)
  cm_int8   — full step with the confmat one-hot contraction in int8->int32
              instead of bf16->f32 (halves padded one-hot HBM traffic)

Usage: python scripts/dissect_tail.py [--model basic] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, state, pool, mstate, steps, warmup=4):
    for i in range(warmup):
        state, mstate, losses = step(state, pool[i % 2], mstate)
    float(losses["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, mstate, losses = step(state, pool[i % 2], mstate)
    float(losses["loss"])
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="basic")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=128)
    args = p.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import vision_mtl_tpu.metrics as M
    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state
    import vision_mtl_tpu.train.step as S

    num_classes = cityscapes_data_cfg.num_classes
    bs, h, w = args.batch_size, 128, 256
    model_args = argparse.Namespace(
        model_name=args.model, channel_wise_stitching=True,
        fold_tail=False, merge_heads=True,
    )
    model = build_model(model_args, cityscapes_data_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    pool = [
        {
            "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
            "mask": jnp.asarray(rng.integers(0, num_classes, size=(bs, h, w)).astype(np.int32)),
            "depth": jnp.asarray(rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)),
        }
        for _ in range(2)
    ]
    state = create_train_state(model, jax.random.key(0), pool[0]["img"], lr=5e-4)
    mstate = init_metrics(num_classes)

    results = {}

    step = S.make_train_step(model, donate=False)
    results["full"] = timed(step, state, pool, mstate, args.steps)

    # --- nometrics: passthrough update ---
    orig_update = M.update_metrics
    S.update_metrics = lambda ms, *a, **k: ms
    step = S.make_train_step(model, donate=False)
    results["nometrics"] = timed(step, state, pool, mstate, args.steps)
    S.update_metrics = orig_update

    # --- noopt: skip the Adam update (keep grads + metrics) ---
    from vision_mtl_tpu.train.state import TrainState

    orig_apply = TrainState.apply_gradients
    TrainState.apply_gradients = (
        lambda self, *, grads, **kw: self.replace(
            step=self.step + 1,
            batch_stats=kw.get("batch_stats", self.batch_stats),
        )
    )
    step = S.make_train_step(model, donate=False)
    results["noopt"] = timed(step, state, pool, mstate, args.steps)
    TrainState.apply_gradients = orig_apply

    # --- cm_int8: int8 one-hot, int32 accumulation ---
    def update_int8(ms, segm_preds, gt_mask, depth_preds, gt_depth,
                    losses=None, valid=None):
        c = ms.num_classes
        b, hh, ww = gt_mask.shape[:3]
        flat_t = gt_mask.reshape(-1).astype(jnp.int32)
        flat_p = segm_preds.reshape(-1).astype(jnp.int32)
        t1h = jax.nn.one_hot(flat_t, c, dtype=jnp.int8)
        p1h = jax.nn.one_hot(flat_p, c, dtype=jnp.int8)
        if valid is not None:
            vf = valid.astype(jnp.int8)
            t1h = t1h * jnp.repeat(vf, hh * ww)[:, None]
        cm = jax.lax.dot_general(
            t1h, p1h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        abs_err = jnp.abs(depth_preds.astype(jnp.float32) - gt_depth.astype(jnp.float32))
        losses = losses or {}
        zero = jnp.zeros((), jnp.float32)
        return M.MetricState(
            confmat=ms.confmat + cm,
            mae_sum=ms.mae_sum + jnp.sum(abs_err),
            mae_count=ms.mae_count + jnp.float32(abs_err.size),
            loss_sum=ms.loss_sum + losses.get("loss", zero),
            loss_segm_sum=ms.loss_segm_sum + losses.get("loss_segm", zero),
            loss_depth_sum=ms.loss_depth_sum + losses.get("loss_depth", zero),
            num_steps=ms.num_steps + 1.0,
        )

    S.update_metrics = update_int8
    step = S.make_train_step(model, donate=False)
    results["cm_int8"] = timed(step, state, pool, mstate, args.steps)
    S.update_metrics = orig_update

    full = results["full"]
    for k, v in results.items():
        print(f"{k:10s} {v * 1e3:8.2f} ms/step  {bs / v:8.1f} img/s  "
              f"delta vs full {1e3 * (v - full):+7.2f} ms")


if __name__ == "__main__":
    main()
