"""Pin down the ~60ms gap between grads-only (67ms) and the full shipping
train step (130ms) for basic bs128.

Rebuilds the step inline and ablates one piece at a time; every variant is
timed as scan-of-K inside one jit call (single dispatch).

  v_full        — grad + metrics(post) + inject_hyperparams(adam)  [~step]
  v_nometrics   — grad + inject-adam, no metrics/post
  v_plainadam   — grad + plain optax.adam, no metrics/post
  v_sgd         — grad + params-lr*g, no metrics/post
  v_gradseps    — grad consumed via p-1e-30*g (no optimizer state at all)

Usage: python scripts/dissect_step2.py
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

    import optax

    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.losses import mtl_loss
    from vision_mtl_tpu.metrics import init_metrics, update_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state, make_optimizer
    from vision_mtl_tpu.train.step import postprocess_raw_out

    num_classes = cityscapes_data_cfg.num_classes
    bs, h, w = 128, 128, 256
    model_args = argparse.Namespace(
        model_name="basic", channel_wise_stitching=True,
        fold_tail=False, merge_heads=True,
    )
    model = build_model(model_args, cityscapes_data_cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, num_classes, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)),
    }
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=5e-4)
    mstate0 = init_metrics(num_classes)

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

    def run(tag, opt_kind, with_metrics):
        if opt_kind == "inject":
            tx = make_optimizer(5e-4)
        elif opt_kind == "plain":
            tx = optax.adam(5e-4)
        else:
            tx = None
        os_ = tx.init(state.params) if tx else None

        def stepfn(c):
            params, opt_s, stats, ms = c
            grads, (losses, post, new_stats) = grad_fn(params, stats)
            if with_metrics:
                ms = update_metrics(
                    ms, post["segm_predictions"], batch["mask"],
                    post["depth_predictions"], batch["depth"], losses,
                )
            if tx is not None:
                upd, opt_s = tx.update(grads, opt_s, params)
                params = optax.apply_updates(params, upd)
            elif opt_kind == "sgd":
                params = jax.tree.map(
                    lambda p, g: p - 5e-4 * g.astype(p.dtype), params, grads
                )
            else:  # eps
                params = jax.tree.map(
                    lambda p, g: p - 1e-30 * g.astype(p.dtype), params, grads
                )
            return (params, opt_s, new_stats, ms)

        t = scan_time(stepfn, (state.params, os_, state.batch_stats, mstate0))
        print(f"{tag:14s} {1e3 * t:8.2f} ms/step  {bs / t:8.1f} img/s", flush=True)

    run("v_full", "inject", True)
    run("v_nometrics", "inject", False)
    run("v_plainadam", "plain", False)
    run("v_sgd", "sgd", False)
    run("v_gradseps", "eps", False)


if __name__ == "__main__":
    main()
