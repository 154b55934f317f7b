"""Eval-step throughput at arbitrary resolution on the live backend.

Times the fused eval step (forward + losses + metric accumulation) with the
honest sync recipe: the MetricState chains call-to-call, and one scalar loss
fetch at the end waits for the whole sequence (block_until_ready is not
enough on relay-attached TPUs — docs/BENCH_NOTES.md). Inference holds no
activations for backward, so no remat flags exist here; measured native-res
numbers live in BENCH_NOTES "Native-res EVAL".

Usage: python scripts/dissect_eval_highres.py [--model basic|mtan|csnet]
       [--bs N] [--h H] [--w W] [--steps N]
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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vision_mtl_tpu.cfg import cityscapes_data_cfg
from vision_mtl_tpu.metrics import init_metrics
from vision_mtl_tpu.models import build_model
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_eval_step

p = argparse.ArgumentParser()
p.add_argument("--model", default="basic")
p.add_argument("--bs", type=int, default=8)
p.add_argument("--h", type=int, default=1024)
p.add_argument("--w", type=int, default=2048)
p.add_argument("--steps", type=int, default=10)
a = p.parse_args()

nc = cityscapes_data_cfg.num_classes
margs = argparse.Namespace(model_name=a.model, channel_wise_stitching=True)
model = build_model(margs, cityscapes_data_cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
batch = {
    "img": jnp.asarray(rng.uniform(size=(a.bs, a.h, a.w, 3)).astype(np.float32)),
    "mask": jnp.asarray(rng.integers(0, nc, size=(a.bs, a.h, a.w)).astype(np.int32)),
    "depth": jnp.asarray(rng.uniform(0.05, 1.0, size=(a.bs, a.h, a.w, 1)).astype(np.float32)),
}
state = create_train_state(model, jax.random.key(0), batch["img"], lr=5e-4)
step = make_eval_step(model)
m = init_metrics(nc)
for _ in range(2):
    m, losses = step(state, batch, m)
float(losses["loss"])
t0 = time.perf_counter()
for _ in range(a.steps):
    m, losses = step(state, batch, m)   # mstate chains -> honest sync
float(losses["loss"])
dt = time.perf_counter() - t0
print(f"{a.model} eval {a.h}x{a.w} bs{a.bs}: {a.bs*a.steps/dt:.2f} img/s ({dt/a.steps*1000:.1f} ms/step)")
