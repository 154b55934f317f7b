"""END-TO-END generalization parity vs eager torch twins (VERDICT r2 #1).

Trajectory tests pin per-step dynamics over dozens of steps; this module
closes the remaining gap to the reference's README tables by running BOTH
frameworks through the SAME full training protocol — seeded 51/13 synthetic
split, seeded per-epoch reshuffle, plateau LR on the SUMMED val loss
(patience 2, factor 0.9 — reference training_lit.py:53-55,168), train-mode
BN updating running statistics, EVAL-mode BN consuming them, padded final
val batch — and comparing the resulting validation metrics.

The jax side is the real `run_pipe` loop; the torch side mirrors it eagerly
using the twin forwards (tests/test_mtan_csnet_parity.py) with
running-stat tracking (BN_TRACK) and torch's own Adam +
ReduceLROnPlateau. Both sides start from IDENTICAL weights and consume
IDENTICAL batch streams. Metrics on both sides go through this framework's
accumulators (themselves golden-tested vs torchmetrics), so deltas isolate
model/loop dynamics.

Run as a script for the full 30-epoch protocol + CSV
(docs/assets/twin_generalization_r3.csv):

    python -m tests.test_twin_generalization [--epochs 30] [--models ...]
"""

import argparse as std_argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.test_mtan_csnet_parity as twin
from tests.test_torch_port import _rand_sd
from vision_mtl_tpu.cfg import fetch_data_cfg
from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.metrics import compute_metrics, init_metrics, update_metrics
from vision_mtl_tpu.train.loop import run_pipe
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.utils.torch_port import convert_encoder_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

NC = 7  # synthetic num_classes
LR = 5e-3
BS = 8
SEED = 11
TASKS = ["depth", "segm"]  # build_model order (pipeline parity)


# ---------------------------------------------------------------- models


def _build_jax_model(model_name):
    if model_name == "basic":
        from vision_mtl_tpu.models.basic import BasicMTLModel

        return BasicMTLModel(
            segm_classes=NC, decoder_first_channel=32, dtype=jnp.float32
        )
    if model_name == "mtan":
        from vision_mtl_tpu.models.mtan import MTANMiniUnet

        return MTANMiniUnet(
            map_tasks_to_num_channels={"depth": 1, "segm": NC},
            task_subnets_hidden_channels=8,
            encoder_first_channel=8,
            encoder_num_channels=3,
            dtype=jnp.float32,
        )
    if model_name == "csnet":
        from vision_mtl_tpu.models.cross_stitch import CSNet

        return CSNet(
            task_channels={"depth": 1, "segm": NC},
            decoder_first_channel=32,
            channel_wise_stitching=True,
            dtype=jnp.float32,
        )
    raise ValueError(model_name)


def _init_state(model_name, model, seed=0):
    """Identical-init weights for both sides; basic/csnet graft random
    timm-layout encoders (converted exactly) like the trajectory tests.
    ``seed`` varies the weight draw for the seed-ensemble study (both
    frameworks still start from the SAME weights for a given seed)."""
    rng = np.random.default_rng(37 + seed)
    state = create_train_state(
        model, jax.random.key(seed), jnp.zeros((BS, 64, 64, 3)), lr=LR
    )
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    sds = []
    if model_name == "basic":
        sds = [_rand_sd(rng)]
        enc_p, enc_s = convert_encoder_state_dict(sds[0])
        params["backbone"]["encoder"] = enc_p
        stats["backbone"]["encoder"] = enc_s
    elif model_name == "csnet":
        sds = [_rand_sd(rng), _rand_sd(rng)]
        for ti in range(2):
            enc_p, enc_s = convert_encoder_state_dict(sds[ti])
            params[f"encoders_{ti}"] = enc_p
            stats[f"encoders_{ti}"] = enc_s
    state = state.replace(params=params, batch_stats=stats)
    return state, params, stats, sds


def _datamodule(seed=0):
    return MTLDataModule(
        "synthetic", batch_size=BS, seed=SEED + seed, wire_format="f32"
    )


def _args(epochs):
    return std_argparse.Namespace(
        loss_segm_weight=1.0,
        loss_depth_weight=1.0,
        val_epoch_freq=1,
        save_epoch_freq=10_000,
        do_plot_preds=False,
        do_show_preds=False,
        batch_size=BS,
        num_workers=0,
        do_overfit=False,
        num_epochs=epochs,
    )


# ---------------------------------------------------------------- jax side


def run_jax_side(model_name, epochs, seed=0):
    model = _build_jax_model(model_name)
    state, _, _, _ = _init_state(model_name, model, seed)
    dm = _datamodule(seed)
    dm.setup()

    class _Logger:
        log_dir = "/tmp/twin_gen_jax"

        def log_metrics(self, *a, **k):
            pass

        def log_figure(self, *a, **k):
            pass

    _, epoch_metrics = run_pipe(
        _args(epochs), model, state, dm,
        num_epochs=epochs, num_classes=NC, logger=_Logger(),
    )
    return {k: list(v) for k, v in epoch_metrics["val"].items()}


# ---------------------------------------------------------------- torch side


def _to_torch_tree(tree, requires_grad):
    return jax.tree.map(
        lambda a: torch.tensor(
            np.ascontiguousarray(np.asarray(a)), requires_grad=requires_grad
        ),
        tree,
    )


def _losses_torch(out, mask_t, depth_t):
    """CE + SILog exactly as the reference computes them (lit_module.py:
    120-131, losses.py:7-36); returns (total, segm, depth) tensors."""
    loss_segm = F.cross_entropy(out["segm"], mask_t)
    dp = torch.sigmoid(out["depth"]).permute(0, 2, 3, 1)
    m = depth_t > 1e-3
    g = torch.log(dp[m]) - torch.log(depth_t[m])
    loss_depth = 10 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
    return loss_segm + loss_depth, loss_segm, loss_depth, dp


def _accumulate(mstate, out, mask_np, depth_np, losses):
    segm_pred = np.asarray(out["segm"].argmax(1).detach())
    depth_pred = np.asarray(
        torch.sigmoid(out["depth"]).permute(0, 2, 3, 1).detach()
    )
    return update_metrics(
        mstate,
        jnp.asarray(segm_pred.astype(np.int32)),
        jnp.asarray(mask_np.astype(np.int32)),
        jnp.asarray(depth_pred),
        jnp.asarray(depth_np),
        {k: jnp.float32(float(v.detach())) for k, v in losses.items()},
    )


def run_torch_side(model_name, epochs, seed=0):
    model = _build_jax_model(model_name)
    _, params_np, stats_np, sds_np = _init_state(model_name, model, seed)

    # torch ownership: encoders stay in timm layout; everything else in the
    # flax layout the twins read directly; running stats are PERSISTENT
    # torch tensors, updated in place under BN_TRACK
    sds_t = [
        {
            k: torch.tensor(np.ascontiguousarray(v), requires_grad=(
                not k.endswith(("running_mean", "running_var"))
            ))
            for k, v in sd.items()
        }
        for sd in sds_np
    ]
    if model_name == "basic":
        rest_p = {k: v for k, v in params_np.items() if k != "backbone"}
        rest_p["backbone"] = {"decoder": params_np["backbone"]["decoder"]}
        rest_s = {"backbone": {"decoder": stats_np["backbone"]["decoder"]}}
    elif model_name == "csnet":
        rest_p = {
            k: v for k, v in params_np.items() if not k.startswith("encoders_")
        }
        rest_s = {
            k: v for k, v in stats_np.items() if not k.startswith("encoders_")
        }
    else:
        rest_p, rest_s = params_np, stats_np
    tparams = _to_torch_tree(rest_p, requires_grad=True)
    tstats = _to_torch_tree(rest_s, requires_grad=False)

    trainable = [
        leaf
        for leaf in jax.tree.leaves(tparams)
        if isinstance(leaf, torch.Tensor)
    ] + [v for sd in sds_t for v in sd.values() if v.requires_grad]
    opt = torch.optim.Adam(trainable, lr=LR)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=2, factor=0.9
    )

    n_levels = 3  # mtan encoder_num_channels

    def forward(x_t):
        if model_name == "basic":
            return _torch_basic(x_t, sds_t[0], tparams, tstats)
        if model_name == "mtan":
            return twin._torch_mtan(x_t, tparams, tstats, n_levels, TASKS)
        return twin._torch_csnet(x_t, sds_t, tparams, tstats, TASKS)

    dm = _datamodule(seed)
    dm.setup()
    train_loader = dm.train_dataloader()  # ONE instance: seeded reshuffle

    val_metrics_hist = {}
    for epoch in range(epochs):
        # ---- train ----
        twin.BN_TRAIN, twin.BN_TRACK = True, True
        mstate = init_metrics(NC)
        try:
            for batch in train_loader:
                x = torch.from_numpy(batch["img"].transpose(0, 3, 1, 2))
                mask_t = torch.from_numpy(batch["mask"]).long()
                depth_t = torch.from_numpy(batch["depth"])
                opt.zero_grad()
                out = forward(x)
                loss, ls, ld, _ = _losses_torch(out, mask_t, depth_t)
                loss.backward()
                opt.step()
                mstate = _accumulate(
                    mstate, out, batch["mask"], batch["depth"],
                    {"loss": loss, "loss_segm": ls, "loss_depth": ld},
                )
        finally:
            twin.BN_TRAIN, twin.BN_TRACK = False, False

        # ---- validation (eval-mode BN over the tracked running stats) ----
        val_mstate = init_metrics(NC)
        val_loss_sum = 0.0
        with torch.no_grad():
            for batch in dm.val_dataloader():
                # padded rows are equivalent to valid-weighting (proven by
                # test_train_step.py::test_eval_padded_batch_matches_unpadded)
                n_real = int(batch["valid"].sum()) if "valid" in batch else None
                img = batch["img"][:n_real]
                mask_np = batch["mask"][:n_real]
                depth_np = batch["depth"][:n_real]
                x = torch.from_numpy(img.transpose(0, 3, 1, 2))
                out = forward(x)
                loss, ls, ld, _ = _losses_torch(
                    out, torch.from_numpy(mask_np).long(),
                    torch.from_numpy(depth_np),
                )
                val_loss_sum += float(loss)
                val_mstate = _accumulate(
                    val_mstate, out, mask_np, depth_np,
                    {"loss": loss, "loss_segm": ls, "loss_depth": ld},
                )
        vm = {k: float(v) for k, v in compute_metrics(val_mstate).items()}
        for k, v in vm.items():
            val_metrics_hist.setdefault(f"val/{k}", []).append(v)
        sched.step(val_loss_sum)
    return val_metrics_hist


def _torch_basic(x, sd, tparams, tstats):
    """BasicMTL torch twin with running-stat support: timm encoder via the
    shared stage closures + flax-layout Unet decoder (_dconv) + 3x3 heads
    (reference basic_model.py:30-51)."""
    from vision_mtl_tpu.models.mobilenetv3 import (
        FEATURE_TAP_AFTER_STAGE,
        NUM_STAGES,
    )

    stem, stage, head_enc = twin._torch_encoder_stages(x, sd)
    h = stem(x)
    feats = [x]
    for si in range(NUM_STAGES):
        h = stage(si, h)
        if si in FEATURE_TAP_AFTER_STAGE:
            feats.append(h)
    h = head_enc(h)
    feats.append(h)

    dec_p = tparams["backbone"]["decoder"]
    dec_s = tstats["backbone"]["decoder"]
    z = feats[-1]
    skips = feats[1:-1][::-1]
    n_blocks = len([k for k in dec_p if k.startswith("block_")])
    for i in range(n_blocks):
        z = F.interpolate(z, scale_factor=2, mode="nearest")
        if i < len(skips):
            z = torch.cat([z, skips[i]], dim=1)
        z = twin._dconv(z, dec_p[f"block_{i}"], dec_s[f"block_{i}"])

    out = {}
    for tn in TASKS:
        conv = tparams[f"{tn}_head"]["Conv_0"]["Conv_0"]
        out[tn] = F.conv2d(
            z, twin._conv_w(conv["kernel"]), twin._t(conv["bias"]), padding=1
        )
    return out


# ---------------------------------------------------------------- the test


# Paired-gap bounds DERIVED from the round-4 seed-ensemble study
# (docs/assets/twin_generalization_r4.csv; 5 seeds x 3 models x 30 epochs,
# both frameworks from identical weights/batches). Worst measured paired
# gap over all models: accuracy |mean|+sd = 0.0009+0.0068, loss 0.0059 +
# 0.0198, mae 0.0003+0.0008. Bounds = |mean| + 4*sd of the WORST model's
# paired gap (30-epoch divergence upper-bounds the 4-epoch test's):
ACC_BOUND = 0.0009 + 4 * 0.0068  # ~0.028  (was hand-waved 0.10)
LOSS_BOUND = 0.0059 + 4 * 0.0198  # ~0.085 absolute (was rel=0.35)
MAE_BOUND = 0.0003 + 4 * 0.0008  # ~0.0035 (was 0.02)


@pytest.mark.parametrize("model_name", ["mtan", "basic", "csnet"])
def test_generalization_parity(model_name):
    """Shortened protocol (4 epochs — the full 30-epoch seed-ensemble table
    lives in docs/assets/twin_generalization_r4.csv, produced by running
    this module as a script with --seeds): final val metrics of the two
    frameworks must agree within bounds DERIVED from the measured paired
    seed-gap spread (see constants above). The r4 study showed the paired
    jax-torch gap is 3-10x smaller than the torch-side seed spread on every
    metric — chaotic trajectory divergence, no systematic bias (this
    retired the r3 single-seed MTAN '22% loss gap' finding)."""
    epochs = 4
    jm = run_jax_side(model_name, epochs)
    tm = run_torch_side(model_name, epochs)
    jl, tl = jm["val/loss"][-1], tm["val/loss"][-1]
    ja, ta = jm["val/accuracy"][-1], tm["val/accuracy"][-1]
    jd, td = jm["val/mae"][-1], tm["val/mae"][-1]
    assert ja == pytest.approx(ta, abs=ACC_BOUND), (jm, tm)
    assert jd == pytest.approx(td, abs=MAE_BOUND), (jm, tm)
    assert jl == pytest.approx(tl, abs=LOSS_BOUND), (jm, tm)
    # and both sides actually learned (val accuracy above chance)
    assert ja > 1.5 / NC and ta > 1.5 / NC, (jm, tm)


# ---------------------------------------------------------------- script


METRICS = ("loss", "accuracy", "jaccard_index", "fbeta_score", "mae")


def main():
    """Seed-ensemble twin-generalization study (VERDICT r3 #1).

    Long-format CSV: one row per (model, seed, framework) with the final
    val metrics; stdout summarizes mean±std per model/framework plus the
    PAIRED jax-torch gap vs the torch seed spread — the statistic that
    separates systematic bias from chaotic trajectory divergence."""
    p = std_argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument(
        "--models", nargs="*", default=["basic", "mtan", "csnet"]
    )
    p.add_argument("--seeds", nargs="*", type=int, default=[0])
    p.add_argument(
        "--torch_bn_var",
        action="store_true",
        help="jax side uses torch's unbiased BN running-var update "
        "(docs/QUIRKS.md #11 ablation arm)",
    )
    p.add_argument(
        "--out", default="docs/assets/twin_generalization_r4.csv"
    )
    p.add_argument(
        "--device", default="cpu:1", help="'cpu[:N]' or 'tpu' (args.select_backend)"
    )
    args = p.parse_args()

    # as a script there is no conftest to force the CPU backend; tiny
    # shapes on the relay TPU would pay ~minutes of remote compile each
    from vision_mtl_tpu.utils.args import select_backend

    select_backend(args.device)

    if args.torch_bn_var:
        from vision_mtl_tpu.models.blocks import set_torch_bn_running_var

        set_torch_bn_running_var(True)

    rows = []  # (model, seed, framework, {metric: value})
    for name in args.models:
        for seed in args.seeds:
            print(f"=== {name} seed {seed}: jax ({args.epochs} epochs) ===")
            jm = run_jax_side(name, args.epochs, seed)
            print(f"=== {name} seed {seed}: torch ({args.epochs} epochs) ===")
            tm = run_torch_side(name, args.epochs, seed)
            rows.append(
                (name, seed, "jax", {m: jm[f"val/{m}"][-1] for m in METRICS})
            )
            rows.append(
                (name, seed, "torch", {m: tm[f"val/{m}"][-1] for m in METRICS})
            )
            print(
                name, seed,
                {m: (rows[-2][3][m], rows[-1][3][m]) for m in METRICS},
                flush=True,
            )

    with open(args.out, "w") as f:
        f.write("model,seed,framework," + ",".join(METRICS) + "\n")
        for name, seed, fw, vals in rows:
            f.write(
                f"{name},{seed},{fw},"
                + ",".join(f"{vals[m]:.6g}" for m in METRICS)
                + "\n"
            )
    print(f"wrote {args.out}")

    # summary: per-model mean±std per framework + paired-gap statistics
    for name in args.models:
        print(f"--- {name} (n={len(args.seeds)} seeds) ---")
        for m in METRICS:
            j = np.array(
                [v[m] for n_, s_, fw, v in rows if n_ == name and fw == "jax"]
            )
            t = np.array(
                [v[m] for n_, s_, fw, v in rows if n_ == name and fw == "torch"]
            )
            gap = j - t
            print(
                f"  {m:14s} jax {j.mean():.4f}±{j.std(ddof=1) if len(j) > 1 else 0:.4f}  "
                f"torch {t.mean():.4f}±{t.std(ddof=1) if len(t) > 1 else 0:.4f}  "
                f"paired gap {gap.mean():+.4f}±{gap.std(ddof=1) if len(gap) > 1 else 0:.4f}"
            )


if __name__ == "__main__":
    main()
