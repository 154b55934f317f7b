"""Measure whether buffer donation changes train-step throughput.

run_pipe's step donates state+mstate (argnums 0,2 — train/step.py); bench.py
measures with donate=False. On TPU, donation lets XLA reuse the input
buffers for outputs — expected to save HBM *capacity* (no double-buffered
params/moments), not bandwidth: outputs are written either way, so the
hypothesis is ~0 throughput delta. This script closes that loop with a
measurement (basic model, bench.py's flagship config).

Honest sync on the axon relay = scalar fetch from the end of the dependency
chain (block_until_ready does not block here — CLAUDE.md).

Usage: python scripts/dissect_donate.py [--steps 30] [--batch_size 128]
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
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "img": jnp.asarray(
                rng.uniform(size=(bs, h, w, 3)).astype(np.float32)
            ),
            "mask": jnp.asarray(
                rng.integers(0, 19, size=(bs, h, w)).astype(np.int32)
            ),
            "depth": jnp.asarray(
                rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)
            ),
        }
    )

    steps = {
        "donate=False": make_train_step(model, donate=False),
        "donate=True": make_train_step(model, donate=True),
    }

    def run(name: str) -> float:
        # fresh state per round: donation consumes the previous one
        st = create_train_state(
            model, jax.random.key(0), jnp.zeros((bs, h, w, 3)), lr=5e-4
        )
        ms = init_metrics(19)
        step = steps[name]
        st, ms, ls = step(st, batch, ms)  # compile + settle
        _ = float(ls["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, ms, ls = step(st, batch, ms)
        _ = float(ls["loss"])  # end-of-chain sync
        return bs * args.steps / (time.perf_counter() - t0)

    for name in (
        "donate=False",
        "donate=True",
        "donate=False",
        "donate=True",
    ):
        print(f"{name:13s}: {run(name):8.1f} img/s")


if __name__ == "__main__":
    main()
