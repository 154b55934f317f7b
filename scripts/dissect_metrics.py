"""Ablate INSIDE update_metrics: which piece costs the ~65ms/step?

All variants: grads + inject-adam + (partial) metrics, scan-of-8 in one jit.

  m_full       — shipping update_metrics                      (~132 ms)
  m_none       — no metrics at all                            (~68 ms)
  m_noconfmat  — losses+mae only (no argmax/one-hot/dot)
  m_nomae      — losses+confmat only
  m_losses     — loss scalars only
  m_sqmae      — full, but MAE on squeezed (B,H,W) f32
  m_int8       — full, but int8 one-hot / int32-accum dot
  m_bf16small  — full, but one-hot built at (N,32)-reshaped layout:
                 reshape preds to (N/8, 8) then one_hot -> (N/8, 8, C),
                 dot over two dims

Usage: python scripts/dissect_metrics.py
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


def scan_time(fn, carry, K=8, outer=3):
    def k_fn(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=K)[0]

    jf = jax.jit(k_fn)
    c = jf(carry)
    float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(outer):
        c = jf(c)
    float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (outer * K)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.losses import mtl_loss
    from vision_mtl_tpu.metrics import MetricState, init_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state, make_optimizer
    from vision_mtl_tpu.train.step import postprocess_raw_out
    import optax

    C = cityscapes_data_cfg.num_classes
    bs, h, w = 128, 128, 256
    model_args = argparse.Namespace(
        model_name="basic", channel_wise_stitching=True,
        fold_tail=False, merge_heads=True,
    )
    model = build_model(model_args, cityscapes_data_cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, C, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)),
    }
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=5e-4)
    mstate0 = init_metrics(C)
    tx = make_optimizer(5e-4)

    def loss_fn(params, stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats},
            batch["img"], train=True, mutable=["batch_stats"],
        )
        post = postprocess_raw_out(out)
        losses = mtl_loss(
            post["segm_logits"], post["depth_predictions"],
            batch["mask"], batch["depth"], 1.0, 1.0,
        )
        return losses["loss"], (losses, post, mut["batch_stats"])

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def cm_bf16(tp_, pp_):
        t1h = jax.nn.one_hot(tp_, C, dtype=jnp.bfloat16)
        p1h = jax.nn.one_hot(pp_, C, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            t1h, p1h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def cm_int8(tp_, pp_):
        t1h = jax.nn.one_hot(tp_, C, dtype=jnp.int8)
        p1h = jax.nn.one_hot(pp_, C, dtype=jnp.int8)
        return jax.lax.dot_general(
            t1h, p1h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    def cm_2d(tp_, pp_):
        # batch the contraction: (M, 8, C) one-hots, contract over (M, 8)
        t1h = jax.nn.one_hot(tp_.reshape(-1, 8), C, dtype=jnp.bfloat16)
        p1h = jax.nn.one_hot(pp_.reshape(-1, 8), C, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            t1h, p1h, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def make_update(confmat, mae, losses_on, sq_mae=False):
        def upd(ms, segm_preds, gt_mask, depth_preds, gt_depth, losses):
            zero = jnp.zeros((), jnp.float32)
            cm = ms.confmat
            if confmat is not None:
                flat_t = gt_mask.reshape(-1).astype(jnp.int32)
                flat_p = segm_preds.reshape(-1).astype(jnp.int32)
                cm = cm + confmat(flat_t, flat_p)
            mae_add, mae_cnt = zero, zero
            if mae:
                if sq_mae:
                    d = depth_preds.reshape(depth_preds.shape[:3]).astype(jnp.float32)
                    g = gt_depth.reshape(gt_depth.shape[:3]).astype(jnp.float32)
                else:
                    d = depth_preds.astype(jnp.float32)
                    g = gt_depth.astype(jnp.float32)
                abs_err = jnp.abs(d - g)
                mae_add = jnp.sum(abs_err)
                mae_cnt = jnp.float32(abs_err.size)
            L = losses if losses_on else {}
            return MetricState(
                confmat=cm,
                mae_sum=ms.mae_sum + mae_add,
                mae_count=ms.mae_count + mae_cnt,
                loss_sum=ms.loss_sum + L.get("loss", zero),
                loss_segm_sum=ms.loss_segm_sum + L.get("loss_segm", zero),
                loss_depth_sum=ms.loss_depth_sum + L.get("loss_depth", zero),
                num_steps=ms.num_steps + 1.0,
            )

        return upd

    def run(tag, upd):
        def stepfn(c):
            params, opt_s, stats, ms = c
            grads, (losses, post, new_stats) = grad_fn(params, stats)
            if upd is not None:
                ms = upd(
                    ms, post["segm_predictions"], batch["mask"],
                    post["depth_predictions"], batch["depth"], losses,
                )
            u, opt_s = tx.update(grads, opt_s, params)
            params = optax.apply_updates(params, u)
            return (params, opt_s, new_stats, ms)

        t = scan_time(stepfn, (state.params, tx.init(state.params), state.batch_stats, mstate0))
        print(f"{tag:14s} {1e3 * t:8.2f} ms/step  {bs / t:8.1f} img/s", flush=True)

    run("m_full", make_update(cm_bf16, True, True))
    run("m_none", None)
    run("m_noconfmat", make_update(None, True, True))
    run("m_nomae", make_update(cm_bf16, False, True))
    run("m_losses", make_update(None, False, True))
    run("m_sqmae", make_update(cm_bf16, True, True, sq_mae=True))
    run("m_int8", make_update(cm_int8, True, True))
    run("m_2d", make_update(cm_2d, True, True))


if __name__ == "__main__":
    main()
