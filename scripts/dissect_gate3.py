"""Measure VERDICT r3 hypothesis 4b: 3-pass train-mode fused gate kernel.

Times MTAN's train-mode attention-gate chain (the GateChain jnp path XLA
compiles today) against the 3-pass Pallas kernel
(ops/pallas/fused_gate.fused_attention_gate_train) at the real per-level
shapes of the flagship config (bs128, 128x256, encoder_first_channel=32,
hidden=128). Forward only — the kernel bounds the full train-step version
from above (a custom VJP would add more passes).

Timing: scan-of-K inside one compiled program + scalar fetch (the honest
sync; per-call timings through the relay carry a ~14ms dispatch floor —
docs/BENCH_NOTES.md).

Usage: python scripts/dissect_gate3.py [--bs 128] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--hidden", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.ops.pallas.fused_gate import fused_attention_gate_train

    hid = args.hidden
    eps = 1e-5

    # (label, H, W, cin, c2) for bs128 128x256 efc=32: encoder levels (gate
    # input = concat(level_in, prev_stream)), mirrored decoder levels (gate
    # input = concat(merged_skip, conv(prev)->hidden))
    shapes = [
        ("enc0", 128, 256, 3, 32),
        ("enc1", 64, 128, 64, 64),
        ("enc2", 32, 64, 128, 128),
        ("enc3", 16, 32, 256, 256),
        ("dec0", 32, 64, 256 + hid, 128),
        ("dec1", 64, 128, 128 + hid, 64),
        ("dec2", 128, 256, 64 + hid, 32),
    ]

    def jnp_chain(x, shared, w1, b1, s1, o1, w2, b2, s2, o2):
        """GateChain's train-mode jnp path (models/mtan.py) verbatim."""
        h = (
            jnp.dot(
                x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + b1
        ).astype(jnp.bfloat16)
        hf = h.astype(jnp.float32)
        m = jnp.mean(hf, axis=(0, 1, 2))
        v = jnp.var(hf, axis=(0, 1, 2))
        h = jax.nn.relu(
            ((hf - m) * jax.lax.rsqrt(v + eps) * s1 + o1).astype(jnp.bfloat16)
        )
        a = (
            jnp.dot(
                h, w2.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            + b2
        ).astype(jnp.bfloat16)
        af = a.astype(jnp.float32)
        m2 = jnp.mean(af, axis=(0, 1, 2))
        v2 = jnp.var(af, axis=(0, 1, 2))
        attn = jax.nn.sigmoid(
            ((af - m2) * jax.lax.rsqrt(v2 + eps) * s2 + o2).astype(jnp.bfloat16)
        )
        return shared * attn.astype(shared.dtype), m, v, m2, v2

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} bs={args.bs} hidden={hid} k={args.k}")
    results = {}
    for label, h, w, cin, c2 in shapes:
        x = jnp.asarray(
            rng.normal(size=(args.bs, h, w, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        shared = jnp.asarray(
            rng.normal(size=(args.bs, h, w, c2)).astype(np.float32)
        ).astype(jnp.bfloat16)
        params = [
            jnp.asarray(rng.normal(scale=0.1, size=(cin, hid)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(hid,)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 1.5, hid).astype(np.float32)),
            jnp.asarray(rng.normal(size=(hid,)).astype(np.float32)),
            jnp.asarray(rng.normal(scale=0.1, size=(hid, c2)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(c2,)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 1.5, c2).astype(np.float32)),
            jnp.asarray(rng.normal(size=(c2,)).astype(np.float32)),
        ]

        def scan_of_k(fn):
            @jax.jit
            def run(x, shared, params):
                def body(carry, _):
                    out, m, v, m2, v2 = fn(carry, shared, *params)
                    # fold the gate output back to the carry's channel
                    # count so the scan chains a real data dependency
                    nxt = carry + jnp.mean(out, axis=-1, keepdims=True).astype(
                        carry.dtype
                    )
                    return nxt, (m[0] + v[0] + m2[0] + v2[0])
                carry, sums = jax.lax.scan(
                    body, x, None, length=args.k
                )
                return jnp.sum(sums) + jnp.sum(carry[0, 0, 0]).astype(jnp.float32)
            return run

        row = {}
        for name, fn in (
            ("xla", jnp_chain),
            ("pallas3", fused_attention_gate_train),
        ):
            if name == "pallas3" and jax.default_backend() != "tpu":
                continue
            run = scan_of_k(fn)
            out = run(x, shared, params)
            float(out)  # compile + warm
            t0 = time.perf_counter()
            float(run(x, shared, params))
            dt = (time.perf_counter() - t0) / args.k * 1000.0
            row[name] = dt
            print(f"  {label:6s} {name:8s} {dt:8.3f} ms/call")
        results[label] = row

    tot_x = sum(r.get("xla", 0.0) for r in results.values())
    tot_p = sum(r.get("pallas3", 0.0) for r in results.values())
    if any("pallas3" in r for r in results.values()):
        print(
            f"total per-level sum: xla {tot_x:.2f} ms, pallas3 {tot_p:.2f} ms "
            f"({'pallas wins' if tot_p < tot_x else 'xla wins'})"
        )
    else:
        print(f"total per-level sum: xla {tot_x:.2f} ms (pallas3 needs tpu)")


if __name__ == "__main__":
    main()
