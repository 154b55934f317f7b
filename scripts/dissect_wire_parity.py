"""On-chip A/B of the uint8 wire mode's device-side normalization
(VERDICT r4 #4): host float32 ``img/255`` vs device ``uint8 -> /255``
through the SAME flagship inference program on the real TPU.

The uint8 wire ships a 4x H2D win with the caveat (serve.py) that TPU
rounding of the on-device divide "is not guaranteed bit-identical" to host
normalization. This measures the actual delta on-chip:

  * segm: number of argmax flips over the batch (the only client-visible
    segmentation difference);
  * depth: max ULP distance and max |delta| between the two paths' f32
    sigmoid outputs.

Usage: python scripts/dissect_wire_parity.py [--batches 8] [--bs 32]
Writes one JSON line; record the numbers in docs/BENCH_NOTES.md and the
serve.py docstring.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.models.basic import BasicMTLModel
    from vision_mtl_tpu.serving import Predictor
    from vision_mtl_tpu.train.state import create_train_state

    model = BasicMTLModel(
        segm_classes=19, decoder_first_channel=540, dtype=jnp.bfloat16
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, args.height, args.width, 3)),
        lr=1e-3,
    )
    pred_f32 = Predictor(model, state, args.bs, args.height, args.width)
    pred_u8 = Predictor(
        model, state, args.bs, args.height, args.width, dtype=jnp.uint8
    )

    rng = np.random.default_rng(0)
    total_px = 0
    flips = 0
    max_ulp = 0
    max_abs = 0.0
    for _ in range(args.batches):
        raw = rng.integers(0, 256, size=(args.bs, args.height, args.width, 3))
        raw = raw.astype(np.uint8)
        host_norm = raw.astype(np.float32) / 255.0
        out_a = pred_f32(host_norm)
        out_b = pred_u8(raw)
        total_px += out_a["segm"].size
        flips += int((out_a["segm"] != out_b["segm"]).sum())
        da = out_a["depth"].astype(np.float32)
        db = out_b["depth"].astype(np.float32)
        ulp = np.abs(
            da.view(np.int32).astype(np.int64)
            - db.view(np.int32).astype(np.int64)
        )
        max_ulp = max(max_ulp, int(ulp.max()))
        max_abs = max(max_abs, float(np.abs(da - db).max()))

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "batches": args.batches,
                "pixels": total_px,
                "segm_argmax_flips": flips,
                "depth_max_ulp": max_ulp,
                "depth_max_abs_delta": max_abs,
            }
        )
    )


if __name__ == "__main__":
    main()
