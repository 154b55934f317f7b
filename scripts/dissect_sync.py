"""Measure the per-step host-sync cost in the run_pipe logging pattern.

Three variants over device-resident batches (basic model, 128x256 bf16,
bs 128 — bench.py's flagship config), K timed steps each:

  nosync : dispatch all K steps, one scalar fetch at the end (bench.py style
           — the framework's ceiling)
  eager  : device_get(losses) immediately after each dispatch (run_pipe's
           pre-round-3 behavior — host serializes against completion)
  lagged : device_get(step N) only after step N+1 was dispatched (run_pipe's
           round-3 behavior)

Honest sync on the axon relay = scalar fetch from the end of the dependency
chain (block_until_ready does not block here — CLAUDE.md).

Usage: python scripts/dissect_sync.py [--steps 30] [--batch_size 128]
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

from vision_mtl_tpu.metrics import init_metrics
from vision_mtl_tpu.models.basic import BasicMTLModel
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_train_step


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    bs, h, w = args.batch_size, args.height, args.width
    model = BasicMTLModel(
        segm_classes=19, decoder_first_channel=540, dtype=jnp.bfloat16
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((bs, h, w, 3)), lr=5e-4
    )
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 19, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(
            rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)
        ),
    }
    batch = jax.device_put(batch)
    step = make_train_step(model, donate=False)

    # compile + settle
    mstate = init_metrics(19)
    st, ms, ls = step(state, batch, mstate)
    _ = float(ls["loss"])
    for _ in range(3):
        st, ms, ls = step(st, batch, ms)
    _ = float(ls["loss"])

    def run(variant: str) -> float:
        s, m = st, init_metrics(19)
        pending = None
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s, m, losses = step(s, batch, m)
            if variant == "eager":
                jax.device_get(losses)
            elif variant == "lagged":
                if pending is not None:
                    jax.device_get(pending)
                pending = losses
        if pending is not None:
            jax.device_get(pending)
        _ = float(losses["loss"])  # end-of-chain sync for all variants
        dt = time.perf_counter() - t0
        return bs * args.steps / dt

    for variant in ("nosync", "eager", "lagged", "nosync", "eager", "lagged"):
        ips = run(variant)
        print(f"{variant:7s}: {ips:8.1f} img/s")


if __name__ == "__main__":
    main()
