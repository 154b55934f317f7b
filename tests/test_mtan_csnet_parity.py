"""Torch golden-value parity for MTAN and CSNet (full forwards + MTAN
gradients).

Each model's forward is re-implemented functionally in torch following the
REFERENCE decomposition (mtan_model.py:12-404; cross_stitch_model.py:15-201
stitch placement/einsum + the documented re-architecture decisions of
docs/QUIRKS.md #1/#9), consuming the SAME weights as the flax model. This
pins down the gate plumbing (1x1 conv chains, sigmoid modulation), the
ConvTranspose convention, pad-concat offsets and ordering, bilinear
align_corners upsampling, stitch placement and the diagonal einsum — the
parts structural tests cannot see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.cross_stitch import CSNet
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.utils.torch_port import convert_encoder_state_dict
from tests.test_torch_port import _rand_sd

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------- helpers
# conversions pass torch tensors through with differentiable ops so the
# gradient-parity test can flow grads back to the flax-layout leaves
def _t(a):
    if isinstance(a, torch.Tensor):
        return a
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))


def _conv_w(kernel):
    """flax HWIO -> torch OIHW."""
    return _t(kernel).permute(3, 2, 0, 1)


def _convt_w(kernel):
    """flax ConvTranspose (kh,kw,in,out) -> torch (in,out,kh,kw).

    flax's ConvTranspose does not flip the kernel (lax.conv_transpose,
    transpose_kernel=False) while torch's conv_transpose2d does, so the
    spatial dims must be reversed (verified numerically)."""
    return _t(kernel).flip(0, 1).permute(2, 3, 0, 1)


# module switch: the trajectory test (test_mtan_trajectory.py) flips this to
# run the twin with train-mode BN (batch statistics, matching the flax train
# step's use_running_average=False); the forward/grad parity tests here use
# eval-mode BN against randomized running stats.
BN_TRAIN = False
# with BN_TRAIN also tracking=True: train-mode BN ADDITIONALLY updates the
# provided running-stat tensors in place (torch nn.BatchNorm training
# semantics — used by the end-to-end generalization twin loop,
# test_twin_generalization.py, whose eval epochs then consume the stats)
BN_TRACK = False


def _tracking(s) -> bool:
    return (
        BN_TRACK
        and s is not None
        and not isinstance(s, _NullStats)
    )


def _bn_eval(x, p, s):
    if BN_TRAIN:
        if _tracking(s):
            # running stats must be torch tensors (updated in place)
            return F.batch_norm(
                x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]), _t(p["bias"]),
                True, 0.1, 1e-5,
            )
        return F.batch_norm(
            x, None, None, _t(p["scale"]), _t(p["bias"]), True, 0.1, 1e-5
        )
    return F.batch_norm(
        x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]), _t(p["bias"]),
        False, 0.1, 1e-5,
    )


def _conv_bn_relu(x, p, s, pad=1):
    x = F.conv2d(x, _conv_w(p["Conv_0"]["Conv_0"]["kernel"]), padding=pad)
    x = _bn_eval(x, p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
    return F.relu(x)


def _dconv(x, p, s):
    """DoubleConv: (conv3x3 no-bias -> BN -> ReLU) x2 (reference
    model_utils.py:61-80)."""
    for j in range(2):
        x = _conv_bn_relu(x, p[f"ConvBNAct_{j}"], s[f"ConvBNAct_{j}"])
    return x


def _pad_concat(x1, x2):
    """reference concat_slightly_diff_sized_tensors (model_utils.py:46-58)."""
    dy = x2.shape[2] - x1.shape[2]
    dx = x2.shape[3] - x1.shape[3]
    x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
    return torch.cat([x2, x1], dim=1)


def _randomize_bn(variables, rng):
    """Randomize BN scale/bias and running stats so eval-mode BN actually
    exercises the affine+stats math (flax init is scale=1/bias=0/mean=0/var=1
    which would make BN a near-no-op)."""

    def rand_params(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        a = np.asarray(leaf)
        if name.startswith("scale"):
            return jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        if name.startswith("bias"):
            return jnp.asarray(rng.uniform(-0.3, 0.3, a.shape).astype(np.float32))
        return leaf

    def rand_stats(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        a = np.asarray(leaf)
        if name.startswith("mean"):
            return jnp.asarray(rng.uniform(-0.3, 0.3, a.shape).astype(np.float32))
        if name.startswith("var"):
            return jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        return leaf

    return {
        "params": jax.tree_util.tree_map_with_path(
            rand_params, variables["params"]
        ),
        "batch_stats": jax.tree_util.tree_map_with_path(
            rand_stats, variables["batch_stats"]
        ),
    }


# ---------------------------------------------------------------- MTAN twin
def _gate(x, shared, p, s):
    """GateChain: conv1x1-BN-ReLU -> conv1x1-BN-sigmoid gate * shared
    (reference mtan_model.py:31-43 enc / 105-117 dec)."""
    def bn(z, i):
        if BN_TRAIN:
            if _tracking(s):
                return F.batch_norm(
                    z, _t(s[f"mean{i}"]), _t(s[f"var{i}"]),
                    _t(p[f"scale{i}"]), _t(p[f"bias{i}"]), True, 0.1, 1e-5,
                )
            return F.batch_norm(
                z, None, None, _t(p[f"scale{i}"]), _t(p[f"bias{i}"]),
                True, 0.1, 1e-5,
            )
        return F.batch_norm(
            z, _t(s[f"mean{i}"]), _t(s[f"var{i}"]),
            _t(p[f"scale{i}"]), _t(p[f"bias{i}"]), False, 0.1, 1e-5,
        )

    w1 = _t(p["w1"]).T[:, :, None, None]
    h = F.relu(bn(F.conv2d(x, w1, _t(p["b1"])), 1))
    w2 = _t(p["w2"]).T[:, :, None, None]
    a = bn(F.conv2d(h, w2, _t(p["b2"])), 2)
    return shared * torch.sigmoid(a)


def _attn_enc(level_in, dconv_out, prev, p, s):
    """reference AttentionModuleEncoder.forward (mtan_model.py:51-83)."""
    h = level_in if prev is None else torch.cat([level_in, prev], dim=1)
    g = _gate(h, dconv_out, p["GateChain_0"], s["GateChain_0"])
    g = F.conv2d(
        g, _conv_w(p["Conv_0"]["Conv_0"]["kernel"]),
        _t(p["Conv_0"]["Conv_0"]["bias"]), padding=1,
    )
    g = _bn_eval(g, p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
    return F.max_pool2d(F.relu(g), 2)


def _attn_dec(merged, prev, conv_out, p, s):
    """reference AttentionModuleDecoder.forward (mtan_model.py:133-169)."""
    pr = F.conv2d(
        prev, _conv_w(p["Conv_0"]["Conv_0"]["kernel"]),
        _t(p["Conv_0"]["Conv_0"]["bias"]), padding=1,
    )
    pr = _bn_eval(pr, p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
    pr = F.relu(pr)
    if merged.shape[2:] != pr.shape[2:]:
        pr = F.interpolate(pr, scale_factor=2, mode="bilinear", align_corners=True)
    m = torch.cat([merged, pr], dim=1)
    g = _gate(m, conv_out, p["GateChain_0"], s["GateChain_0"])
    g = F.conv2d(
        g, _conv_w(p["Conv_1"]["Conv_0"]["kernel"]),
        _t(p["Conv_1"]["Conv_0"]["bias"]), padding=1,
    )
    g = _bn_eval(g, p["BatchNorm_1"]["BatchNorm_0"], s["BatchNorm_1"]["BatchNorm_0"])
    return F.relu(g)


class _NullStats(dict):
    """Indexable stand-in for the running-stats tree when BN_TRAIN is on
    (train-mode BN never reads running stats)."""

    def __getitem__(self, k):
        return self


def _torch_mtan(x, params, stats, n_levels, task_names):
    """reference MTANMiniUnet.forward (mtan_model.py:378-404): MTANDown with
    apply_pool=False + top-level pool, bottleneck, MTANUp with pad-concat."""
    if stats is None:
        stats = _NullStats()
    shared = x
    streams = {t: None for t in task_names}
    feats = []
    for i in range(n_levels):
        level_in = shared
        d = _dconv(level_in, params[f"enc_dconv_{i}"], stats[f"enc_dconv_{i}"])
        for ti, tn in enumerate(task_names):
            k = f"enc_attn_{i}_task{ti}"
            streams[tn] = _attn_enc(level_in, d, streams[tn], params[k], stats[k])
        feats.append(d)
        shared = F.max_pool2d(d, 2)

    shared = _dconv(shared, params["bottleneck"], stats["bottleneck"])

    for i in range(n_levels):
        up = F.conv_transpose2d(
            shared, _convt_w(params[f"dec_up_{i}"]["kernel"]),
            _t(params[f"dec_up_{i}"]["bias"]), stride=2,
        )
        merged = _pad_concat(up, feats[-(i + 1)])
        conv_out = _dconv(merged, params[f"dec_dconv_{i}"], stats[f"dec_dconv_{i}"])
        for ti, tn in enumerate(task_names):
            k = f"dec_attn_{i}_task{ti}"
            streams[tn] = _attn_dec(
                merged, streams[tn], conv_out, params[k], stats[k]
            )
        shared = conv_out

    out = {}
    for tn in task_names:
        p = params[f"head_{tn}"]["Conv_0"]
        out[tn] = F.conv2d(streams[tn], _conv_w(p["kernel"]), _t(p["bias"]))
    return out


@pytest.fixture(scope="module")
def mtan_setup():
    rng = np.random.default_rng(7)
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": 5},
        task_subnets_hidden_channels=8,
        encoder_first_channel=8,
        encoder_num_channels=3,
        dtype=jnp.float32,
    )
    x = rng.uniform(size=(2, 32, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = _randomize_bn(jax.device_get(variables), rng)
    return model, variables, x


def test_mtan_forward_matches_torch(mtan_setup):
    model, variables, x = mtan_setup
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tout = _torch_mtan(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            variables["params"],
            variables["batch_stats"],
            n_levels=3,
            task_names=["depth", "segm"],
        )
    for k in ("depth", "segm"):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-4,
            atol=2e-5,
            err_msg=k,
        )


def test_mtan_gradient_parity(mtan_setup, rng):
    """dLoss/dW agreement on representative leaves spanning the network: a
    head kernel (output end), a decoder gate weight (attention plumbing), an
    encoder gate weight (stream origin), and the first shared conv."""
    model, variables, x = mtan_setup
    from vision_mtl_tpu.losses import mtl_loss

    mask = rng.integers(0, 5, size=(2, 32, 48)).astype(np.int32)
    depth_gt = rng.uniform(0.05, 1.0, size=(2, 32, 48, 1)).astype(np.float32)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
        losses = mtl_loss(
            out["segm"],
            jax.nn.sigmoid(out["depth"]),
            jnp.asarray(mask),
            jnp.asarray(depth_gt),
        )
        return losses["loss"]

    jloss, jgrads = jax.value_and_grad(loss_fn)(variables["params"])

    tparams = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True),
        variables["params"],
    )
    tout = _torch_mtan(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        tparams,
        variables["batch_stats"],
        n_levels=3,
        task_names=["depth", "segm"],
    )
    tl_segm = F.cross_entropy(tout["segm"], torch.from_numpy(mask).long())
    dpred = torch.sigmoid(tout["depth"]).permute(0, 2, 3, 1)
    tgt = torch.from_numpy(depth_gt)
    m = tgt > 1e-3
    g = torch.log(dpred[m]) - torch.log(tgt[m])
    tl_depth = 10 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
    tloss = tl_segm + tl_depth
    tloss.backward()

    assert float(jloss) == pytest.approx(float(tloss), rel=1e-4)

    checks = [
        ("segm head kernel",
         jgrads["head_segm"]["Conv_0"]["kernel"],
         tparams["head_segm"]["Conv_0"]["kernel"].grad,
         lambda t: t.numpy()),
        ("dec gate w1",
         jgrads["dec_attn_2_task0"]["GateChain_0"]["w1"],
         tparams["dec_attn_2_task0"]["GateChain_0"]["w1"].grad,
         lambda t: t.numpy()),
        ("enc gate w2",
         jgrads["enc_attn_0_task1"]["GateChain_0"]["w2"],
         tparams["enc_attn_0_task1"]["GateChain_0"]["w2"].grad,
         lambda t: t.numpy()),
        ("first shared conv",
         jgrads["enc_dconv_0"]["ConvBNAct_0"]["Conv_0"]["Conv_0"]["kernel"],
         tparams["enc_dconv_0"]["ConvBNAct_0"]["Conv_0"]["Conv_0"]["kernel"].grad,
         lambda t: t.numpy()),
        ("conv transpose kernel",
         jgrads["dec_up_0"]["kernel"],
         tparams["dec_up_0"]["kernel"].grad,
         lambda t: t.numpy()),
    ]
    for name, jg, tg, conv in checks:
        assert tg is not None, name
        np.testing.assert_allclose(
            np.asarray(jg), conv(tg.detach()), rtol=5e-3, atol=1e-5,
            err_msg=name,
        )


# ---------------------------------------------------------------- CSNet twin
def _torch_encoder_stages(x, sd):
    """timm mobilenetv3_large_100 functional encoder, returning the stem
    output and a per-stage closure (real block semantics: residual adds and
    pooled SE — the deliberate re-architecture of the reference's leaf-module
    walk, docs/QUIRKS.md)."""
    from vision_mtl_tpu.models.mobilenetv3 import MOBILENETV3_LARGE_SPECS

    T = lambda k: _t(sd[k])  # noqa: E731

    def bn(z, p):
        if BN_TRAIN:
            if BN_TRACK:
                return F.batch_norm(
                    z, T(f"{p}.running_mean"), T(f"{p}.running_var"),
                    T(f"{p}.weight"), T(f"{p}.bias"), True, 0.1, 1e-5,
                )
            return F.batch_norm(
                z, None, None, T(f"{p}.weight"), T(f"{p}.bias"),
                True, 0.1, 1e-5,
            )
        return F.batch_norm(
            z, T(f"{p}.running_mean"), T(f"{p}.running_var"),
            T(f"{p}.weight"), T(f"{p}.bias"), False, 0.1, 1e-5,
        )

    def stem(z):
        z = F.conv2d(z, T("conv_stem.weight"), stride=2, padding=1)
        return F.hardswish(bn(z, "bn1"))

    def stage(si, h):
        for bi, s in enumerate(MOBILENETV3_LARGE_SPECS[si]):
            tp = f"blocks.{si}.{bi}"
            act = F.relu if s.act == "relu" else F.hardswish
            shortcut = h
            if s.ds:
                h = F.conv2d(h, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                             padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                h = act(bn(h, f"{tp}.bn1"))
                h = F.conv2d(h, T(f"{tp}.conv_pw.weight"))
                h = bn(h, f"{tp}.bn2")
            else:
                h = F.conv2d(h, T(f"{tp}.conv_pw.weight"))
                h = act(bn(h, f"{tp}.bn1"))
                h = F.conv2d(h, T(f"{tp}.conv_dw.weight"), stride=s.stride,
                             padding=(s.kernel - 1) // 2, groups=s.exp_ch)
                h = act(bn(h, f"{tp}.bn2"))
                if s.se:
                    se = h.mean((2, 3), keepdim=True)
                    se = F.conv2d(se, T(f"{tp}.se.conv_reduce.weight"),
                                  T(f"{tp}.se.conv_reduce.bias"))
                    se = F.relu(se)
                    se = F.conv2d(se, T(f"{tp}.se.conv_expand.weight"),
                                  T(f"{tp}.se.conv_expand.bias"))
                    h = h * F.hardsigmoid(se)
                h = F.conv2d(h, T(f"{tp}.conv_pwl.weight"))
                h = bn(h, f"{tp}.bn3")
            if s.stride == 1 and shortcut.shape[1] == h.shape[1]:
                h = h + shortcut
        return h

    def head(h):
        h = F.conv2d(h, T("blocks.6.0.conv.weight"))
        return F.hardswish(bn(h, "blocks.6.0.bn1"))

    return stem, stage, head


def _torch_csnet(x, sds, params, stats, task_names, dec_layers=5):
    """Torch twin of CSNet: per-task encoders with stitches applied after
    every stage (entry of timm blocks 1..6 — reference regex placement,
    cross_stitch_model.py:48,143-156), skips cached PRE-stitch at stage
    outputs 0,1,2,4 (reference :111-120), decoder stitch at block entry after
    the zero-pad skip merge (reference :121-134, quirk #9), diagonal einsum
    with the reference's exact subscripts (quirk #1)."""
    from vision_mtl_tpu.models.mobilenetv3 import (
        FEATURE_TAP_AFTER_STAGE,
        NUM_STAGES,
    )

    if stats is None:
        stats = _NullStats()
    n = len(task_names)
    encs = [_torch_encoder_stages(x, sds[ti]) for ti in range(n)]
    feats = [encs[ti][0](x) for ti in range(n)]
    skips = [[] for _ in range(n)]

    def stitch(key, fs):
        w = _t(params[key]["weights"])
        stacked = torch.stack(fs, dim=0)
        mixed = torch.einsum("aac,abcij->abcij", w, stacked)
        return [mixed[i] for i in range(n)]

    for s in range(NUM_STAGES):
        feats = [encs[ti][1](s, feats[ti]) for ti in range(n)]
        if s in FEATURE_TAP_AFTER_STAGE:
            for ti in range(n):
                skips[ti].append(feats[ti])
        feats = stitch(f"enc_stitches_{s}", feats)

    feats = [encs[ti][2](feats[ti]) for ti in range(n)]

    for d in range(dec_layers):
        merged = []
        for ti in range(n):
            h = feats[ti]
            if d < len(skips[ti]):
                merged.append(_pad_concat(h, skips[ti][-d - 1]))
            else:
                merged.append(F.interpolate(h, scale_factor=2, mode="nearest"))
        merged = stitch(f"dec_stitches_{d}", merged)
        out = []
        for ti in range(n):
            p = params[f"decoders_{ti}_{d}"]
            s_ = stats[f"decoders_{ti}_{d}"]
            out.append(_dconv(merged[ti], p, s_))
        feats = out

    res = {}
    for ti, tn in enumerate(task_names):
        p = params[f"heads_{ti}"]["Conv_0"]["Conv_0"]
        res[tn] = F.conv2d(
            feats[ti], _conv_w(p["kernel"]), _t(p["bias"]), padding=1
        )
    return res


def test_csnet_forward_matches_torch():
    rng = np.random.default_rng(13)
    model = CSNet(
        task_channels={"depth": 1, "segm": 5},
        decoder_first_channel=32,
        channel_wise_stitching=True,
        dtype=jnp.float32,
    )
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.key(1), jnp.asarray(x), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]
    # graft independent random timm-layout encoders into both task nets
    sds = [_rand_sd(rng), _rand_sd(rng)]
    for ti in range(2):
        enc_p, enc_s = convert_encoder_state_dict(sds[ti])
        params[f"encoders_{ti}"] = enc_p
        stats[f"encoders_{ti}"] = enc_s

    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        tout = _torch_csnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            sds,
            params,
            stats,
            ["depth", "segm"],
        )
    for k in ("depth", "segm"):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-3,
            atol=2e-4,
            err_msg=k,
        )


def test_csnet_gradient_parity():
    """dLoss/dW agreement for CSNet's distinctive leaves: a channel-wise
    stitch weight (the diagonal einsum's gradient only flows to W[t,t,:]),
    a decoder conv kernel, and a task head kernel."""
    rng = np.random.default_rng(17)
    model = CSNet(
        task_channels={"depth": 1, "segm": 5},
        decoder_first_channel=32,
        channel_wise_stitching=True,
        dtype=jnp.float32,
    )
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.key(1), jnp.asarray(x), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]
    sds = [_rand_sd(rng), _rand_sd(rng)]
    for ti in range(2):
        enc_p, enc_s = convert_encoder_state_dict(sds[ti])
        params[f"encoders_{ti}"] = enc_p
        stats[f"encoders_{ti}"] = enc_s

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": stats}, jnp.asarray(x), train=False
        )
        return (
            jnp.sum(out["segm"].astype(jnp.float32) ** 2)
            + jnp.sum(out["depth"].astype(jnp.float32) ** 2)
        )

    jloss, jgrads = jax.value_and_grad(loss_fn)(params)

    tparams = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True), params
    )
    tout = _torch_csnet(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        sds,
        tparams,
        stats,
        ["depth", "segm"],
    )
    tloss = sum((v**2).sum() for v in tout.values())
    tloss.backward()
    assert float(jloss) == pytest.approx(float(tloss.detach()), rel=1e-4)

    checks = [
        ("dec stitch 0 weights",
         jgrads["dec_stitches_0"]["weights"],
         tparams["dec_stitches_0"]["weights"].grad),
        ("enc stitch 2 weights",
         jgrads["enc_stitches_2"]["weights"],
         tparams["enc_stitches_2"]["weights"].grad),
        ("decoder conv kernel",
         jgrads["decoders_0_4"]["ConvBNAct_0"]["Conv_0"]["Conv_0"]["kernel"],
         tparams["decoders_0_4"]["ConvBNAct_0"]["Conv_0"]["Conv_0"]["kernel"].grad),
        ("segm head kernel",
         jgrads["heads_1"]["Conv_0"]["Conv_0"]["kernel"],
         tparams["heads_1"]["Conv_0"]["Conv_0"]["kernel"].grad),
    ]
    for name, jg, tg in checks:
        assert tg is not None, name
        np.testing.assert_allclose(
            np.asarray(jg), tg.detach().numpy(), rtol=5e-3, atol=1e-4,
            err_msg=name,
        )
    # diagonal-only semantics (quirk #1): off-diagonal stitch entries get
    # ZERO gradient — tasks do not mix through the einsum
    g = np.asarray(jgrads["enc_stitches_2"]["weights"])
    assert np.all(g[0, 1] == 0) and np.all(g[1, 0] == 0)
    assert np.any(g[0, 0] != 0) and np.any(g[1, 1] != 0)
