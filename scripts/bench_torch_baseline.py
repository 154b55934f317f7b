"""Measured torch-reference-equivalent baseline (same-hardware comparison).

BASELINE.md requires the PyTorch baseline to be measured, not cited; there is
no GPU in this environment, so this benchmarks BOTH frameworks on the SAME
host CPU: the torch functional BasicMTL (the parity-validated twin from
tests/test_full_model_parity.py) with eager autograd+Adam, vs this
framework's jitted train step forced onto the CPU backend. The ratio is a
hardware-independent framework-efficiency measurement; the TPU numbers in
bench.py then stack on top.

Usage: python scripts/bench_torch_baseline.py [--steps 3] [--bs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_torch(bs: int, h: int, w: int, steps: int) -> float:
    import numpy as np
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_torch_port import _rand_sd

    rng = np.random.default_rng(0)
    sd = {k: torch.tensor(v, requires_grad=True) for k, v in _rand_sd(rng).items()}

    # decoder weights (decoder_first_channel=540 trained config)
    dec_ch = [540, 270, 135, 67, 33]
    enc_ch = [960, 112, 40, 24, 16]
    dec_w = {}
    in_ch = enc_ch[0]
    for i, out_ch in enumerate(dec_ch):
        skip = enc_ch[i + 1] if i + 1 < len(enc_ch) else 0
        c_in = in_ch + skip
        for j in range(2):
            dec_w[f"b{i}c{j}"] = (torch.randn(out_ch, c_in if j == 0 else out_ch, 3, 3) * 0.02).requires_grad_()
            dec_w[f"b{i}bn{j}w"] = torch.ones(out_ch, requires_grad=True)
            dec_w[f"b{i}bn{j}b"] = torch.zeros(out_ch, requires_grad=True)
        in_ch = out_ch
    head_s = (torch.randn(19, 33, 3, 3) * 0.02).requires_grad_()
    head_d = (torch.randn(1, 33, 3, 3) * 0.02).requires_grad_()

    x = torch.rand(bs, 3, h, w)
    mask = torch.randint(0, 19, (bs, h, w))
    depth = torch.rand(bs, h, w, 1) * 0.95 + 0.05

    T = lambda k: sd[k]  # noqa: E731

    def bn_eager(z, p):
        return F.batch_norm(
            z, None, None, T(f"{p}.weight"), T(f"{p}.bias"), True, 0.1, 1e-5
        )

    from vision_mtl_tpu.models.mobilenetv3 import (
        FEATURE_TAP_AFTER_STAGE,
        MOBILENETV3_LARGE_SPECS,
    )

    def forward():
        feats = [x]
        hh = F.conv2d(x, T("conv_stem.weight"), stride=2, padding=1)
        hh = F.hardswish(bn_eager(hh, "bn1"))
        for si, stage in enumerate(MOBILENETV3_LARGE_SPECS):
            for bi, s in enumerate(stage):
                tp = f"blocks.{si}.{bi}"
                act = F.relu if s.act == "relu" else F.hardswish
                shortcut = hh
                if s.ds:
                    hh = F.conv2d(hh, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                                  padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                    hh = act(bn_eager(hh, f"{tp}.bn1"))
                    hh = F.conv2d(hh, T(f"{tp}.conv_pw.weight"))
                    hh = bn_eager(hh, f"{tp}.bn2")
                else:
                    hh = F.conv2d(hh, T(f"{tp}.conv_pw.weight"))
                    hh = act(bn_eager(hh, f"{tp}.bn1"))
                    hh = F.conv2d(hh, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                                  padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                    hh = act(bn_eager(hh, f"{tp}.bn2"))
                    if s.se:
                        se = hh.mean((2, 3), keepdim=True)
                        se = F.conv2d(se, T(f"{tp}.se.conv_reduce.weight"),
                                      T(f"{tp}.se.conv_reduce.bias"))
                        se = F.relu(se)
                        se = F.conv2d(se, T(f"{tp}.se.conv_expand.weight"),
                                      T(f"{tp}.se.conv_expand.bias"))
                        hh = hh * F.hardsigmoid(se)
                    hh = F.conv2d(hh, T(f"{tp}.conv_pwl.weight"))
                    hh = bn_eager(hh, f"{tp}.bn3")
                if s.stride == 1 and shortcut.shape[1] == hh.shape[1]:
                    hh = hh + shortcut
            if si in FEATURE_TAP_AFTER_STAGE:
                feats.append(hh)
        hh = F.conv2d(hh, T("blocks.6.0.conv.weight"))
        hh = F.hardswish(bn_eager(hh, "blocks.6.0.bn1"))
        feats.append(hh)

        z = feats[-1]
        skips = feats[1:-1][::-1]
        for i in range(5):
            z = F.interpolate(z, scale_factor=2, mode="nearest")
            if i < len(skips):
                z = torch.cat([z, skips[i]], dim=1)
            for j in range(2):
                z = F.conv2d(z, dec_w[f"b{i}c{j}"], padding=1)
                z = F.batch_norm(z, None, None, dec_w[f"b{i}bn{j}w"],
                                 dec_w[f"b{i}bn{j}b"], True, 0.1, 1e-5)
                z = F.relu(z)
        segm = F.conv2d(z, head_s, padding=1)
        d = F.conv2d(z, head_d, padding=1)
        return segm, d

    leaves = [v for v in sd.values()] + list(dec_w.values()) + [head_s, head_d]
    opt = torch.optim.Adam(leaves, lr=5e-4)

    def step():
        opt.zero_grad()
        segm, d = forward()
        loss_segm = F.cross_entropy(segm, mask)
        dp = torch.sigmoid(d).permute(0, 2, 3, 1)
        m = depth > 1e-3
        g = torch.log(dp[m]) - torch.log(depth[m])
        loss = loss_segm + 10 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return bs / dt


def bench_jax(bs: int, h: int, w: int, steps: int) -> float:
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models.basic import BasicMTLModel
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.uniform(size=(bs, h, w, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 19, size=(bs, h, w)).astype(np.int32)),
        "depth": jnp.asarray(
            (rng.uniform(size=(bs, h, w, 1)) * 0.95 + 0.05).astype(np.float32)
        ),
    }
    model = BasicMTLModel(
        segm_classes=19, decoder_first_channel=540, dtype=jnp.float32
    )
    state = create_train_state(model, jax.random.key(0), batch["img"], lr=5e-4)
    step = make_train_step(model, donate=False)
    m = init_metrics(19)
    s, m, l = step(state, batch, m)
    float(l["loss"])
    t0 = time.perf_counter()
    s = state
    for _ in range(steps):
        s, m, l = step(s, batch, m)
    float(l["loss"])
    dt = (time.perf_counter() - t0) / steps
    return bs / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--what", choices=["torch", "jax", "both"], default="both")
    args = p.parse_args()
    if args.what in ("torch", "both"):
        r = bench_torch(args.bs, args.height, args.width, args.steps)
        print(f"torch eager CPU train step: {r:.2f} images/sec")
    if args.what in ("jax", "both"):
        r = bench_jax(args.bs, args.height, args.width, args.steps)
        print(f"vision_mtl_tpu (XLA CPU) train step: {r:.2f} images/sec")
