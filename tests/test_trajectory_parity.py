"""Multi-epoch training-TRAJECTORY parity vs an independent torch twin.

One-step gradient parity (test_full_model_parity.py) pins the derivatives;
this test pins the *dynamics*: starting from identical weights and feeding
identical batches, the flax train loop (fused jitted step: forward + CE/
SILog + Adam) and an eager torch twin (functional BasicMTL, train-mode BN,
torch.optim.Adam with the reference's hyperparameters — training_lit.py:51)
must produce matching per-step loss/accuracy/MAE trajectories across
multiple epochs. This is the strongest quality-parity evidence available
without the real datasets (no network egress), and the bridge to the
reference's README result tables (reference README.md:249-276).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.metrics import compute_metrics, init_metrics
from vision_mtl_tpu.models.basic import BasicMTLModel
from vision_mtl_tpu.train.state import create_train_state
from vision_mtl_tpu.train.step import make_train_step
from vision_mtl_tpu.utils.torch_port import convert_encoder_state_dict
from tests.test_torch_port import _rand_sd

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vision_mtl_tpu.models.mobilenetv3 import (  # noqa: E402
    FEATURE_TAP_AFTER_STAGE,
    MOBILENETV3_LARGE_SPECS,
)

NC = 5
DEC = [32, 16, 8, 4, 2]
LR = 2e-3
STEPS = 40  # 4-batch stream cycled 10 times = 10 epochs


def _torch_step_fn(sd, dec_params, dec_stats_unused, batches):
    """Eager torch twin: full BasicMTL forward (train-mode BN, no running
    stats in the normalization path — matching flax use_running_average=
    False) + CE/SILog + Adam. Weights live in their native layouts (timm
    for the encoder, flax HWIO for decoder/heads) and are permuted
    differentiably in the forward."""

    T = lambda k: sd[k]  # noqa: E731

    def bn_train(z, w, b):
        return F.batch_norm(z, None, None, w, b, True, 0.1, 1e-5)

    def conv_flax(z, kernel, bias=None, padding=1):
        return F.conv2d(z, kernel.permute(3, 2, 0, 1), bias, padding=padding)

    def forward(x):
        feats = [x]
        hh = F.conv2d(x, T("conv_stem.weight"), stride=2, padding=1)
        hh = F.hardswish(bn_train(hh, T("bn1.weight"), T("bn1.bias")))
        for si, stage in enumerate(MOBILENETV3_LARGE_SPECS):
            for bi, s in enumerate(stage):
                tp = f"blocks.{si}.{bi}"
                act = F.relu if s.act == "relu" else F.hardswish
                shortcut = hh
                if s.ds:
                    hh = F.conv2d(hh, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                                  padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                    hh = act(bn_train(hh, T(f"{tp}.bn1.weight"), T(f"{tp}.bn1.bias")))
                    hh = F.conv2d(hh, T(f"{tp}.conv_pw.weight"))
                    hh = bn_train(hh, T(f"{tp}.bn2.weight"), T(f"{tp}.bn2.bias"))
                else:
                    hh = F.conv2d(hh, T(f"{tp}.conv_pw.weight"))
                    hh = act(bn_train(hh, T(f"{tp}.bn1.weight"), T(f"{tp}.bn1.bias")))
                    hh = F.conv2d(hh, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                                  padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                    hh = act(bn_train(hh, T(f"{tp}.bn2.weight"), T(f"{tp}.bn2.bias")))
                    if s.se:
                        se = hh.mean((2, 3), keepdim=True)
                        se = F.conv2d(se, T(f"{tp}.se.conv_reduce.weight"),
                                      T(f"{tp}.se.conv_reduce.bias"))
                        se = F.relu(se)
                        se = F.conv2d(se, T(f"{tp}.se.conv_expand.weight"),
                                      T(f"{tp}.se.conv_expand.bias"))
                        hh = hh * F.hardsigmoid(se)
                    hh = F.conv2d(hh, T(f"{tp}.conv_pwl.weight"))
                    hh = bn_train(hh, T(f"{tp}.bn3.weight"), T(f"{tp}.bn3.bias"))
                if s.stride == 1 and shortcut.shape[1] == hh.shape[1]:
                    hh = hh + shortcut
            if si in FEATURE_TAP_AFTER_STAGE:
                feats.append(hh)
        hh = F.conv2d(hh, T("blocks.6.0.conv.weight"))
        hh = F.hardswish(
            bn_train(hh, T("blocks.6.0.bn1.weight"), T("blocks.6.0.bn1.bias"))
        )
        feats.append(hh)

        dec = dec_params["backbone"]["decoder"]
        z = feats[-1]
        skips = feats[1:-1][::-1]
        for i in range(len(DEC)):
            z = F.interpolate(z, scale_factor=2, mode="nearest")
            if i < len(skips):
                z = torch.cat([z, skips[i]], dim=1)
            b = dec[f"block_{i}"]
            for j in range(2):
                cb = b[f"ConvBNAct_{j}"]
                z = conv_flax(z, cb["Conv_0"]["Conv_0"]["kernel"])
                bnp = cb["BatchNorm_0"]["BatchNorm_0"]
                z = bn_train(z, bnp["scale"], bnp["bias"])
                z = F.relu(z)

        def head(name):
            conv = dec_params[name]["Conv_0"]["Conv_0"]
            return conv_flax(z, conv["kernel"], conv["bias"])

        return head("segm_head"), head("depth_head")

    trainable = [
        v for k, v in sd.items() if not k.endswith(("running_mean", "running_var"))
    ]
    trainable += [
        leaf
        for leaf in jax.tree.leaves(dec_params)
        if isinstance(leaf, torch.Tensor)
    ]
    opt = torch.optim.Adam(trainable, lr=LR)

    def step(bi):
        x, mask, depth = batches[bi]
        opt.zero_grad()
        segm, d = forward(x)
        loss_segm = F.cross_entropy(segm, mask)
        dp = torch.sigmoid(d).permute(0, 2, 3, 1)
        m = depth > 1e-3
        g = torch.log(dp[m]) - torch.log(depth[m])
        loss = loss_segm + 10 * torch.sqrt(
            torch.var(g) + 0.15 * torch.mean(g) ** 2
        )
        loss.backward()
        opt.step()
        with torch.no_grad():
            acc = float((segm.argmax(1) == mask).float().mean())
            mae = float((dp - depth).abs().mean())
        return float(loss.detach()), acc, mae

    return step


def test_training_trajectories_match():
    rng = np.random.default_rng(21)
    sd_np = _rand_sd(rng)

    # shared batch stream from the LEARNABLE synthetic dataset (smooth
    # image fields; mask/depth are functions of the image — the loss can
    # actually descend, unlike i.i.d. noise targets), resized so the
    # encoder's /32 pyramid works
    from vision_mtl_tpu.data.synthetic import SyntheticConfig, SyntheticMTLDataset

    cfg = SyntheticConfig(height=32, width=64, num_classes=NC, num_train=8)
    ds = SyntheticMTLDataset(stage="train", cfg=cfg)
    n_batches, bs = 4, 2
    batches_np = []
    for bi in range(n_batches):
        samples = [ds[bi * bs + k] for k in range(bs)]
        batches_np.append((
            np.stack([s["img"] for s in samples]).astype(np.float32),
            np.stack([s["mask"] for s in samples]).astype(np.int32),
            np.stack([s["depth"] for s in samples]).astype(np.float32),
        ))

    # ---- flax side ----
    model = BasicMTLModel(
        segm_classes=NC, decoder_first_channel=DEC[0], dtype=jnp.float32
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batches_np[0][0]), lr=LR
    )
    enc_p, enc_s = convert_encoder_state_dict(sd_np)
    params = jax.device_get(state.params)
    params["backbone"]["encoder"] = enc_p
    stats = jax.device_get(state.batch_stats)
    stats["backbone"]["encoder"] = enc_s
    state = state.replace(params=params, batch_stats=stats)

    step = make_train_step(model, donate=False)
    jbatches = [
        {"img": jnp.asarray(x), "mask": jnp.asarray(m), "depth": jnp.asarray(d)}
        for x, m, d in batches_np
    ]
    flax_traj = []
    for i in range(STEPS):
        mstate = init_metrics(NC)  # fresh per step -> per-step metrics
        state, mstate, losses = step(state, jbatches[i % n_batches], mstate)
        met = compute_metrics(mstate)
        flax_traj.append(
            (float(losses["loss"]), float(met["accuracy"]), float(met["mae"]))
        )

    # ---- torch side: same init (encoder from sd, decoder/heads from the
    # flax init), same batches ----
    sd_t = {k: torch.tensor(v, requires_grad=True) for k, v in sd_np.items()}
    dec_init = {k: v for k, v in params.items() if k != "backbone"}
    dec_init["backbone"] = {"decoder": params["backbone"]["decoder"]}
    dec_t = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True), dec_init
    )
    tbatches = [
        (
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(m).long(),
            torch.from_numpy(d),
        )
        for x, m, d in batches_np
    ]
    tstep = _torch_step_fn(sd_t, dec_t, None, tbatches)
    torch_traj = [tstep(i % n_batches) for i in range(STEPS)]

    # ---- compare trajectories (f32 both sides; divergence grows with
    # steps, so the tolerance widens late) ----
    for i, ((fl, fa, fm), (tl, ta, tm)) in enumerate(zip(flax_traj, torch_traj)):
        rel = 5e-3 if i < 8 else (2e-2 if i < 16 else 6e-2)
        assert fl == pytest.approx(tl, rel=rel), (i, flax_traj, torch_traj)
        assert fm == pytest.approx(tm, rel=max(rel * 4, 2e-2), abs=5e-3), i
        # pixel accuracy is a discrete statistic on 4096 pixels
        assert fa == pytest.approx(ta, abs=0.06), i

    # the loss must actually decrease over the run (training, not noise)
    assert flax_traj[-1][0] < flax_traj[0][0] * 0.95
    # record trajectory deltas for docs/BENCH_NOTES.md
    rels = [abs(f[0] - t[0]) / t[0] for f, t in zip(flax_traj, torch_traj)]
    print(
        f"\ntrajectory loss rel-delta: first8 max {max(rels[:8]):.2e} "
        f"mid max {max(rels[8:16]):.2e} last max {max(rels[16:]):.2e} "
        f"loss {flax_traj[0][0]:.3f}->{flax_traj[-1][0]:.3f}"
    )
