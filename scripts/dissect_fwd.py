"""Dissect the basic model's forward by stage on the live backend.

Times (honest scalar-fetch sync, device-resident input, bs128 128x256 bf16):
  encoder        — MobileNetV3-Large pyramid
  backbone       — encoder + UnetDecoder
  full(eval)     — backbone + merged heads, eval mode
  full(train)    — train mode with BN batch stats (mutable)
  decoder levels — cumulative: decoder truncated after k blocks

Usage: python scripts/dissect_fwd.py [--steps 30] [--batch_size N]
       [--height H] [--width W]
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


def timeit(fn, args, steps, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(jax.tree.leaves(out)[0]).block_until_ready()
    # honest sync: fetch a scalar reduced from the output
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_mtl_tpu.models.basic import BasicMTLModel, Backbone
    from vision_mtl_tpu.models.mobilenetv3 import MobileNetV3Encoder
    from vision_mtl_tpu.models.unet_decoder import UnetDecoder, decoder_channels

    bs, h, w = args.batch_size, args.height, args.width
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32))
    dt = jnp.bfloat16

    results = {}

    # --- encoder alone ---
    enc = MobileNetV3Encoder(dtype=dt)
    ev = enc.init(jax.random.key(0), img, False)
    enc_eval = jax.jit(lambda v, x: enc.apply(v, x, False))
    results["encoder(eval)"] = timeit(enc_eval, (ev, img), args.steps)
    feats = jax.tree.map(lambda a: a, enc_eval(ev, img))  # device-resident pyramid
    print("encoder pyramid:", [tuple(f.shape) for f in feats], flush=True)

    # --- decoder alone (on the captured pyramid) ---
    chans = decoder_channels(540, 5)
    dec = UnetDecoder(chans, dtype=dt)
    dv = dec.init(jax.random.key(0), feats, False)
    dec_eval = jax.jit(lambda v, f: dec.apply(v, f, False))
    results["decoder(eval)"] = timeit(dec_eval, (dv, feats), args.steps)

    # --- decoder truncated after k levels ---
    for k in range(1, 5):
        deck = UnetDecoder(chans[:k], dtype=dt)
        dvk = deck.init(jax.random.key(0), feats, False)
        fk = jax.jit(lambda v, f, m=deck: m.apply(v, f, False))
        results[f"decoder[:{k}](eval)"] = timeit(fk, (dvk, feats), args.steps)

    # --- full model eval + train ---
    model = BasicMTLModel(segm_classes=19, decoder_first_channel=540, dtype=dt)
    fv = model.init(jax.random.key(0), img, True)
    f_eval = jax.jit(lambda v, x: model.apply(v, x, False))
    results["full(eval)"] = timeit(f_eval, (fv, img), args.steps)
    f_train = jax.jit(
        lambda v, x: model.apply(v, x, True, mutable=["batch_stats"])[0]
    )
    results["full(train)"] = timeit(f_train, (fv, img), args.steps)

    # --- encoder train mode (BN stats cost) ---
    evt = enc.init(jax.random.key(0), img, True)
    enc_train = jax.jit(
        lambda v, x: enc.apply(v, x, True, mutable=["batch_stats"])[0]
    )
    results["encoder(train)"] = timeit(enc_train, (evt, img), args.steps)

    for k, v in results.items():
        print(f"{k:20s} {v * 1e3:8.2f} ms  {bs / v:9.1f} img/s")


if __name__ == "__main__":
    main()
