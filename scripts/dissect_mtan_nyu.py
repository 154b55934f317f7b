"""Root-cause MTAN's INVERTED batch-size law at the NYUv2 shape
(VERDICT r4 #2): at 256x256/14-class, measured throughput FALLS with batch
size (bs8 118.8 / bs16 118.2 / bs32 108 / bs48 97 img/s; bs>=64 OOM) — the
opposite of the 128x256 law and of the batch-dim pixel-rate law.

Hypothesis under test: near the HBM ceiling XLA's automatic HLO
rematerialization kicks in, so the COMPILED program's FLOPs/image grow
with bs (recompute), while peak-memory stays pinned at the capacity line.
The compiled executable answers this directly:

  * cost_analysis()["flops"] / bs  — flops per image actually compiled;
  * memory_analysis() peak bytes   — how close to the 16GB HBM line;
  * measured img/s (honest sync)   — the throughput law itself.

Usage: python scripts/dissect_mtan_nyu.py [--shape nyuv2|cityscapes]
           [--bss 8,16,32,48] [--steps 10]
Prints one JSON line per bs; record conclusions in docs/BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="nyuv2", choices=["nyuv2", "cityscapes"])
    p.add_argument("--bss", default="8,16,32,48")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--eval_only", action="store_true",
                   help="dissect the eval (fwd-only) program instead")
    p.add_argument("--remat_shared", action="store_true")
    p.add_argument("--remat_attention", action="store_true")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models.mtan import MTANMiniUnet
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_eval_step, make_train_step

    if args.shape == "nyuv2":
        h = w = 256
        num_classes = 14
    else:
        h, w = 128, 256
        num_classes = 19

    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": num_classes},
        task_subnets_hidden_channels=128,
        encoder_first_channel=32,
        encoder_num_channels=4,
        remat_shared=args.remat_shared,
        remat_attention=args.remat_attention,
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    for bs_s in args.bss.split(","):
        bs = int(bs_s)
        batch = {
            "img": jnp.asarray(
                rng.uniform(size=(bs, h, w, 3)).astype(np.float32)
            ),
            "mask": jnp.asarray(
                rng.integers(0, num_classes, size=(bs, h, w)).astype(np.int32)
            ),
            "depth": jnp.asarray(
                rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(np.float32)
            ),
        }
        try:
            state = create_train_state(
                model, jax.random.key(0), batch["img"], lr=5e-4
            )
            if args.eval_only:
                step = make_eval_step(model)

                def run(st, b, ms):
                    ms, losses = step(st, b, ms)
                    return st, ms, losses
            else:
                step = make_train_step(
                    model, donate=False,
                    grad_accum_steps=args.grad_accum_steps,
                )
                run = step
            mstate = init_metrics(num_classes)
            # compiled-program introspection
            lowered = (
                step.lower(state, batch, mstate)
            )
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            row = {
                "bs": bs,
                "shape": f"{h}x{w}/{num_classes}c",
                "gflop_per_img": round(float(ca["flops"]) / bs / 1e9, 2),
                "logical_mb_per_img": round(
                    float(ca["bytes accessed"]) / bs / 1e6, 1
                ),
            }
            try:
                ma = compiled.memory_analysis()
                row["peak_hbm_gb"] = round(
                    (
                        ma.temp_size_in_bytes
                        + ma.argument_size_in_bytes
                        + ma.output_size_in_bytes
                        - ma.alias_size_in_bytes
                    )
                    / 1e9,
                    2,
                )
                row["temp_gb"] = round(ma.temp_size_in_bytes / 1e9, 2)
            except Exception as e:
                row["memory_analysis"] = f"unavailable: {e!r}"
            st = state
            ms = mstate
            for _ in range(args.warmup):
                st, ms, losses = run(st, batch, ms)
            float(losses["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                st, ms, losses = run(st, batch, ms)
            float(losses["loss"])
            dt = time.perf_counter() - t0
            row["img_per_s"] = round(bs * args.steps / dt, 1)
            row["step_ms"] = round(dt / args.steps * 1e3, 1)
            print(json.dumps(row))
        except Exception as e:
            print(json.dumps({"bs": bs, "failed": f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()
