"""Benchmark: training throughput (images/sec/chip) on Cityscapes-shaped MTL.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); "vs_baseline"
is computed against a measured PyTorch-reference estimate for its documented
hardware (single 8GB GPU): BASELINE_IMGS_PER_SEC below, derived from the
reference's workload (13.3M-param MobileNetV3-Unet, 128x256, bs 8; see
docs/BENCH_NOTES.md for the derivation). Update it if a measured torch
number becomes available.

Usage: python bench.py [--quick] [--model basic|mtan|csnet] [--batch_size N]
       python bench.py --all_models   # adds per-model rows to the JSON line
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# measured-estimate of the torch reference on its documented single-GPU
# hardware for the same workload (docs/BENCH_NOTES.md)
BASELINE_IMGS_PER_SEC = 30.0

# hardware peaks for the roofline fraction (published in the JSON line so
# the "~ON the HBM roofline" claim is driver-verified every round,
# VERDICT r4 #6). Logical bytes/flops come from XLA's compiled
# cost_analysis — the round-2 BENCH_NOTES methodology; fusion makes some
# logical bytes non-physical and lane padding some physical bytes
# non-logical, so logical-GB/s can legitimately sit slightly above the
# physical peak when the step is bandwidth-bound.
HW_PEAKS = {
    # device_kind: (HBM bytes/s, bf16 FLOP/s)
    "TPU v5 lite": (819e9, 197e12),  # v5e, public spec
}

# per-model sweet-spot batch sizes on v5e (measured bs sweeps,
# docs/BENCH_NOTES.md; basic swept round 2, mtan/csnet round 3; nyuv2
# shape swept late round 3 — mtan OOMs at bs>=64 at 256x256 and its
# throughput FALLS with bs there (bs8 118.8 / bs16 118.2 / bs32 108 /
# bs48 97 img/s); basic/csnet bs192 regress like at 128x256)
DEFAULT_TPU_BS = {
    "cityscapes": {"basic": 128, "mtan": 128, "csnet": 128},
    "nyuv2": {"basic": 128, "mtan": 16, "csnet": 128},
}


def measure(
    model_name: str,
    bs: int,
    steps: int,
    warmup: int,
    h: int,
    w: int,
    dataset: str = "cityscapes",
    fold_tail: bool = False,
    merge_heads: bool = True,
    remat_tail: int = 0,
    remat_encoder: bool = False,
    remat_attention: bool = False,
    remat_shared: bool = False,
    fold_tasks: bool = False,
    grad_accum_steps: int = 1,
    with_eval: bool = False,
    eval_steps: int = 0,
) -> dict:
    """Measured train-step throughput (images/sec/chip) on device-resident
    batches, plus XLA cost-analysis (flops / logical bytes per step) for
    the roofline fraction. Sync via a scalar fetch from the end of the
    dependency chain — on the remote-attached TPU backend block_until_ready
    can return before execution finishes, which silently turns timings into
    dispatch rates. ``with_eval`` also times the eval-path step."""
    from vision_mtl_tpu.cfg import fetch_data_cfg
    from vision_mtl_tpu.metrics import init_metrics
    from vision_mtl_tpu.models import build_model
    from vision_mtl_tpu.train.state import create_train_state
    from vision_mtl_tpu.train.step import make_train_step

    data_cfg = fetch_data_cfg(dataset)
    num_classes = data_cfg.num_classes
    model_args = argparse.Namespace(
        model_name=model_name,
        channel_wise_stitching=True,
        fold_tail=fold_tail,
        merge_heads=merge_heads,
        remat_tail=remat_tail,
        remat_encoder=remat_encoder,
        remat_attention=remat_attention,
        remat_shared=remat_shared,
        fold_tasks=fold_tasks,
    )
    model = build_model(model_args, data_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # small rotating pool of device-resident batches (isolates compute-path
    # throughput from host decode; the input pipeline is benched separately)
    pool = []
    for _ in range(2):
        pool.append(
            {
                "img": jnp.asarray(
                    rng.uniform(size=(bs, h, w, 3)).astype(np.float32)
                ),
                "mask": jnp.asarray(
                    rng.integers(0, num_classes, size=(bs, h, w)).astype(
                        np.int32
                    )
                ),
                "depth": jnp.asarray(
                    rng.uniform(0.05, 1.0, size=(bs, h, w, 1)).astype(
                        np.float32
                    )
                ),
            }
        )

    state = create_train_state(
        model, jax.random.key(0), pool[0]["img"], lr=5e-4
    )
    step = make_train_step(
        model, donate=False, grad_accum_steps=grad_accum_steps
    )
    mstate = init_metrics(num_classes)

    for i in range(warmup):
        state, mstate, losses = step(state, pool[i % 2], mstate)
    float(losses["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, mstate, losses = step(state, pool[i % 2], mstate)
    float(losses["loss"])  # losses chain through state/mstate -> full sync
    dt = time.perf_counter() - t0

    n_dev = len(jax.devices())
    out = {
        "imgs_per_sec": bs * steps / dt / n_dev,
        "step_ms": dt / steps * 1e3,
        "bs": bs,
    }
    out.update(_cost_analysis(step, state, pool[0], mstate))

    if with_eval:
        from vision_mtl_tpu.train.step import make_eval_step

        estep = make_eval_step(model)
        emstate = init_metrics(num_classes)
        for i in range(warmup):
            emstate, elosses = estep(state, pool[i % 2], emstate)
        float(elosses["loss"])
        # mstate is donated each call and chains every step; sync through
        # the (losses-consuming) metrics. The ~24ms eval step is far more
        # sensitive to relay dispatch stalls than the 65ms train step
        # (observed 10x outliers), so take the median of 3 windows.
        esteps = eval_steps or steps
        window_dts = []
        for _ in range(3):
            emstate2 = init_metrics(num_classes)
            t0 = time.perf_counter()
            for i in range(esteps):
                emstate2, elosses = estep(state, pool[i % 2], emstate2)
            float(jnp.sum(emstate2.confmat))
            window_dts.append(time.perf_counter() - t0)
        dt = float(np.median(window_dts))
        ev = {
            "imgs_per_sec": bs * esteps / dt / n_dev,
            "step_ms": dt / esteps * 1e3,
            "bs": bs,
        }
        ev.update(_cost_analysis(estep, state, pool[0], init_metrics(num_classes)))
        out["eval"] = ev
    return out


def _cost_analysis(jitted, *args) -> dict:
    """flops / logical bytes per execution from the compiled executable
    (XLA cost analysis — the BENCH_NOTES round-2 roofline methodology).
    Best-effort: {} when the backend doesn't expose it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {
            "gflop_per_step": float(ca["flops"]) / 1e9,
            "logical_gb_per_step": float(ca["bytes accessed"]) / 1e9,
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"cost_analysis unavailable: {e!r}")
        return {}


def _roofline(res: dict) -> dict:
    """Achieved TFLOP/s + logical GB/s and their fractions of the hardware
    peaks (device_kind-keyed; fractions omitted off-TPU / unknown kinds)."""
    if "gflop_per_step" not in res:
        return {}
    step_s = res["step_ms"] / 1e3
    out = {
        "gflop_per_step": round(res["gflop_per_step"], 1),
        "logical_gb_per_step": round(res["logical_gb_per_step"], 2),
        "achieved_tflops": round(res["gflop_per_step"] / step_s / 1e3, 1),
        "achieved_logical_gbps": round(
            res["logical_gb_per_step"] / step_s, 1
        ),
    }
    peaks = HW_PEAKS.get(jax.devices()[0].device_kind)
    if peaks:
        hbm_peak, mxu_peak = peaks
        out["hbm_frac"] = round(
            res["logical_gb_per_step"] * 1e9 / step_s / hbm_peak, 3
        )
        out["mxu_frac"] = round(
            res["gflop_per_step"] * 1e9 / step_s / mxu_peak, 3
        )
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--model", default="basic", choices=["basic", "mtan", "csnet"])
    p.add_argument(
        "--all_models", action="store_true",
        help="bench all three models; the official line stays the flagship "
        "(basic) value with a per_model breakdown added",
    )
    p.add_argument("--batch_size", type=int, default=0, help="0 = auto")
    p.add_argument("--steps", type=int, default=0, help="0 = auto")
    p.add_argument(
        "--dataset", default="cityscapes", choices=["cityscapes", "nyuv2"],
        help="picks num_classes (19 vs 14) and the default train shape "
        "(128x256 vs 256x256 — the reference's two headline configs)",
    )
    p.add_argument("--height", type=int, default=0, help="0 = dataset default")
    p.add_argument("--width", type=int, default=0, help="0 = dataset default")
    p.add_argument(
        "--fold_tail", action="store_true",
        help="space-to-depth folded decoder tail (exact; measured slower "
        "on v5e — see docs/BENCH_NOTES.md)",
    )
    p.add_argument(
        "--no_merge_heads", dest="merge_heads", action="store_false",
        help="disable the fused two-head conv (basic model)",
    )
    p.add_argument(
        "--remat_tail", type=int, default=0,
        help="rematerialize the final N decoder blocks (basic model) — "
        "memory opt-in; lets larger batches fit at high resolution "
        "(docs/BENCH_NOTES.md)",
    )
    p.add_argument(
        "--remat_encoder", action="store_true",
        help="rematerialize every encoder block (basic model) — the "
        "high-resolution memory opt-in (docs/BENCH_NOTES.md round-3)",
    )
    p.add_argument(
        "--remat_attention", action="store_true",
        help="rematerialize MTAN's per-task attention modules (memory "
        "opt-in — docs/BENCH_NOTES.md)",
    )
    p.add_argument(
        "--remat_shared", action="store_true",
        help="rematerialize MTAN's shared mini-Unet DoubleConvs "
        "(high-resolution memory opt-in)",
    )
    p.add_argument(
        "--fold_tasks", action="store_true",
        help="MTAN: run the per-task attention streams as one vmapped "
        "call per level (VERDICT r3 hypothesis 4a measurement)",
    )
    p.add_argument(
        "--grad_accum_steps", type=int, default=1,
        help="microbatches per optimizer step (lax.scan inside the "
        "compiled program; ghost-BN semantics) — peak activation memory "
        "scales with batch_size/grad_accum_steps",
    )
    args = p.parse_args()

    try:
        import os as _os

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    on_tpu = jax.devices()[0].platform == "tpu"
    steps = args.steps or (5 if args.quick else 30)
    warmup = 2 if args.quick else 5
    # dataset-default train shapes (reference cfg.py:103-114 / :121-142)
    if not args.height:
        args.height = 128 if args.dataset == "cityscapes" else 256
    if not args.width:
        args.width = 256 if args.dataset == "cityscapes" else 256

    def auto_bs(name: str) -> int:
        if args.batch_size:
            return args.batch_size
        return DEFAULT_TPU_BS[args.dataset][name] if on_tpu else 4

    models = ["basic", "mtan", "csnet"] if args.all_models else [args.model]
    flagship = "basic" if args.all_models else args.model
    results = {}
    for name in models:
        results[name] = measure(
            name,
            auto_bs(name),
            steps,
            warmup,
            args.height,
            args.width,
            dataset=args.dataset,
            fold_tail=args.fold_tail,
            merge_heads=args.merge_heads,
            remat_tail=args.remat_tail,
            remat_encoder=args.remat_encoder,
            remat_attention=args.remat_attention,
            remat_shared=args.remat_shared,
            fold_tasks=args.fold_tasks,
            grad_accum_steps=args.grad_accum_steps,
            # eval-path roofline for the flagship only (one extra program);
            # full step count — short eval windows are dispatch-pipeline-
            # limited through the relay (15 steps read 3991 img/s where 30
            # read ~5000+; the steady-state number needs the longer window)
            with_eval=(name == flagship),
            eval_steps=steps,
        )

    res = results[flagship]
    value = round(res["imgs_per_sec"], 2)
    payload = {
        "metric": (
            f"train images/sec/chip ({flagship}, {args.height}x{args.width} "
            f"{args.dataset} MTL, bf16, bs{auto_bs(flagship)})"
        ),
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": round(value / BASELINE_IMGS_PER_SEC, 2),
        # the reference publishes no throughput number; the baseline is a
        # derived estimate for its documented 8GB-GPU hardware, anchored by
        # a measured 1.54 img/s torch-CPU twin (docs/BENCH_NOTES.md)
        "baseline_kind": "estimated",
        "baseline_imgs_per_sec": BASELINE_IMGS_PER_SEC,
        "measured_torch_cpu_anchor_imgs_per_sec": 1.54,
        "device_kind": jax.devices()[0].device_kind,
    }
    # self-verifying roofline position (VERDICT r4 #6): fraction of the
    # HBM-bandwidth roofline the train step achieves, from XLA's own
    # cost analysis ÷ measured step time
    train_rf = _roofline(res)
    if train_rf:
        payload["roofline"] = train_rf
        if "hbm_frac" in train_rf:
            payload["roofline_frac"] = train_rf["hbm_frac"]
    if "eval" in res:
        ev = {"imgs_per_sec": round(res["eval"]["imgs_per_sec"], 2)}
        ev.update(_roofline(res["eval"]))
        payload["eval_path"] = ev
    if args.all_models:
        payload["per_model"] = {
            n: round(r["imgs_per_sec"], 2) for n, r in results.items()
        }
        pmr = {n: _roofline(r) for n, r in results.items()}
        payload["per_model_roofline"] = {n: v for n, v in pmr.items() if v}
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
