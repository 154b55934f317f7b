"""Isolate Adam-update and backward costs for the basic train step.

Variants (each timed as scan-of-K inside one jit call to amortize the ~14ms
relay dispatch floor):
  adam_tree — optax adam update over the param tree (the shipping form)
  adam_flat — same update over a single raveled f32 vector
  grads     — jit returning grads only (fwd-for-grad + bwd, no optimizer)
  loss_only — jit returning loss only (bwd DCE check)

Usage: python scripts/dissect_opt.py
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


def scan_time(fn, carry, K=10, outer=3):
    """fn: carry -> carry. Times K iterations inside one jit call."""

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
    from flax.traverse_util import flatten_dict

    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.losses import mtl_loss
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
    n_leaves = len(jax.tree.leaves(state.params))
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"param leaves: {n_leaves}, params: {n_params/1e6:.2f}M", flush=True)

    # ---- adam over the tree ----
    tx = optax.adam(5e-4)
    opt_state = tx.init(state.params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), state.params)

    def adam_tree(c):
        params, os_ = c
        upd, os_ = tx.update(grads, os_, params)
        return (optax.apply_updates(params, upd), os_)

    t = scan_time(adam_tree, (state.params, opt_state))
    print(f"adam_tree  {1e3 * t:8.2f} ms/step", flush=True)

    # ---- adam over one flat vector ----
    flat, unravel = jax.flatten_util.ravel_pytree(state.params)
    fos = tx.init(flat)
    gflat = jnp.full_like(flat, 1e-4)

    def adam_flat(c):
        p, os_ = c
        upd, os_ = tx.update(gflat, os_, p)
        return (optax.apply_updates(p, upd), os_)

    t = scan_time(adam_flat, (flat, fos))
    print(f"adam_flat  {1e3 * t:8.2f} ms/step", flush=True)

    # ---- grads only ----
    def fwd_loss(params, batch_stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["img"], train=True, mutable=["batch_stats"],
        )
        post = postprocess_raw_out(out)
        losses = mtl_loss(
            post["segm_logits"], post["depth_predictions"],
            batch["mask"], batch["depth"], 1.0, 1.0,
        )
        return losses["loss"], mut["batch_stats"]

    def grads_step(c):
        params, stats = c
        g, stats = jax.grad(fwd_loss, has_aux=True)(params, stats)
        # consume grads into params so the scan carries them (no DCE)
        params = jax.tree.map(lambda p, gg: p - 0.0 * gg.astype(p.dtype), params, g)
        return (params, stats)

    t = scan_time(grads_step, (state.params, state.batch_stats), K=5)
    print(f"grads      {1e3 * t:8.2f} ms/step", flush=True)

    # ---- loss only (bwd should DCE) ----
    def loss_step(c):
        params, stats, acc = c
        loss, stats = fwd_loss(params, stats)
        return (params, stats, acc + loss)

    t = scan_time(
        loss_step,
        (state.params, state.batch_stats, jnp.zeros((), jnp.float32)),
        K=5,
    )
    print(f"loss_only  {1e3 * t:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
