"""Separate per-call dispatch overhead from device compute for the train step.

Through the axon relay each jitted call on a big pytree (TrainState: ~600
leaves incl. Adam moments) pays a host->relay dispatch cost that can exceed
device time. This measures:

  trivial     — jitted leaf+1 over the full TrainState pytree (pure dispatch
                + tiny compute): per-call floor
  step x1     — the shipping train step, one call per step (what bench.py
                currently measures)
  step x10    — 10 steps inside ONE compiled lax.scan (single dispatch);
                per-step time here is the honest device compute number

Usage: python scripts/dissect_dispatch.py [--model basic]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="basic")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--outer", type=int, default=4)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.cfg import cityscapes_data_cfg
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_train_step

    num_classes = cityscapes_data_cfg.num_classes
    bs, h, w = args.batch_size, 128, 256
    model_args = argparse.Namespace(
        model_name=args.model, channel_wise_stitching=True,
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
    mstate = init_metrics(num_classes)
    n_leaves = len(jax.tree.leaves((state, mstate)))
    print(f"state+metrics pytree leaves: {n_leaves}", flush=True)

    # --- trivial dispatch floor ---
    triv = jax.jit(lambda s, ms: jax.tree.map(lambda x: x + 1, (s, ms)))
    s2, ms2 = triv(state, mstate)
    float(jax.tree.leaves(ms2)[-1])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        s2, ms2 = triv(s2, ms2)
    float(jax.tree.leaves(ms2)[-1])
    print(f"trivial   {1e3 * (time.perf_counter() - t0) / reps:8.2f} ms/call", flush=True)

    # --- one call per step ---
    step = make_train_step(model, donate=False)
    for _ in range(3):
        state_w, mstate_w, losses = step(state, batch, mstate)
    float(losses["loss"])
    t0 = time.perf_counter()
    n1 = 15
    st, ms = state_w, mstate_w
    for _ in range(n1):
        st, ms, losses = step(st, batch, ms)
    float(losses["loss"])
    per1 = (time.perf_counter() - t0) / n1
    print(f"step x1   {1e3 * per1:8.2f} ms/step  {bs / per1:8.1f} img/s", flush=True)

    # --- K steps in one compiled scan ---
    K = args.inner

    def k_steps(st, batch, ms):
        def body(carry, _):
            st, ms = carry
            st, ms, losses = step(st, batch, ms)
            return (st, ms), losses["loss"]

        (st, ms), ls = jax.lax.scan(body, (st, ms), None, length=K)
        return st, ms, ls[-1]

    kfn = jax.jit(k_steps)
    st, ms, last = kfn(state, batch, mstate)
    float(last)
    t0 = time.perf_counter()
    for _ in range(args.outer):
        st, ms, last = kfn(st, batch, ms)
    float(last)
    perk = (time.perf_counter() - t0) / (args.outer * K)
    print(f"step x{K}  {1e3 * perk:8.2f} ms/step  {bs / perk:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
