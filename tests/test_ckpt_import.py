"""Full reference-checkpoint import (utils/ckpt_import.py).

Strategy: build state_dicts in the REFERENCE's exact key layout (schemas
documented in the module docstring, cited to reference file:line), import
them, and compare the Flax forward against a torch forward DRIVEN DIRECTLY
FROM THE STATE_DICT — so a wrong key mapping or value transform in the
importer shows up as a numeric mismatch, not a silently-consistent pair.

For MTAN the source state_dict comes from real torch nn.Module replicas
using the reference's attribute names (mtan_model.py:12-404), so torch's own
ModuleList/ModuleDict/Sequential naming mechanics produce the keys — that
validates the importer's key-string construction against torch itself.
For basic/csnet the smp-internal sub-layouts (Conv2dReLU/SegmentationHead
indices, smp==0.3.3) are pinned by the documented schema.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.basic import BasicMTLModel
from vision_mtl_tpu.models.cross_stitch import CSNet
from vision_mtl_tpu.models.mtan import MTANMiniUnet
from vision_mtl_tpu.utils.ckpt_import import (
    convert_basic_state_dict,
    find_reference_checkpoint,
    import_reference_checkpoint,
)
from tests.test_torch_port import _rand_sd, _torch_forward
from tests.test_mtan_csnet_parity import _pad_concat, _torch_encoder_stages

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _zeros_variables(model, x):
    """Concrete zero-filled variables with the model's init structure (no
    forward execution — the importer replaces every leaf and verifies
    completeness)."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.asarray(x), train=False)
    )
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


# ------------------------------------------------------------- sd builders
def _rand_conv(rng, cout, cin, k):
    return rng.normal(scale=0.1, size=(cout, cin, k, k)).astype(np.float32)


def _rand_bn_sd(rng, sd, prefix, c):
    sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(scale=0.1, size=c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.normal(scale=0.1, size=c).astype(
        np.float32
    )
    sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(7, np.int64)


def _rand_smp_decoder_sd(rng, prefix, head_ch, skip_chs, channels):
    """smp 0.3.3 UnetDecoder keys: blocks.{i}.conv{1,2}.{0=conv,1=bn}."""
    sd = {}
    ins = [head_ch] + list(channels[:-1])
    skips = list(skip_chs) + [0] * (len(channels) - len(skip_chs))
    for i, (ci, si, co) in enumerate(zip(ins, skips, channels)):
        for j, cin in ((1, ci + si), (2, co)):
            sd[f"{prefix}.blocks.{i}.conv{j}.0.weight"] = _rand_conv(
                rng, co, cin, 3
            )
            _rand_bn_sd(rng, sd, f"{prefix}.blocks.{i}.conv{j}.1", co)
    return sd


SKIP_CHS = (112, 40, 24, 16)  # mobilenetv3 taps at /2,/4,/8,/16
HEAD_CH = 960


def _rand_basic_sd(rng, channels, segm_classes):
    sd = {
        f"backbone.encoder.model.{k}": v for k, v in _rand_sd(rng).items()
    }
    sd.update(
        _rand_smp_decoder_sd(rng, "backbone.decoder", HEAD_CH, SKIP_CHS, channels)
    )
    for head, co in (("segm_head", segm_classes), ("depth_head", 1)):
        sd[f"{head}.0.weight"] = _rand_conv(rng, co, channels[-1], 3)
        sd[f"{head}.0.bias"] = rng.normal(scale=0.1, size=co).astype(np.float32)
    return sd


# --------------------------------------------------- sd-driven torch twins
def _sd_bn(x, sd, prefix):
    return F.batch_norm(
        x,
        _t(sd[f"{prefix}.running_mean"]),
        _t(sd[f"{prefix}.running_var"]),
        _t(sd[f"{prefix}.weight"]),
        _t(sd[f"{prefix}.bias"]),
        False,
        0.1,
        1e-5,
    )


def _sd_conv_bn_relu(x, sd, prefix):
    """smp Conv2dReLU: {prefix}.0 = bias-free conv3x3, {prefix}.1 = BN."""
    x = F.conv2d(x, _t(sd[f"{prefix}.0.weight"]), padding=1)
    return F.relu(_sd_bn(x, sd, f"{prefix}.1"))


def _sd_smp_decoder(feats, sd, prefix, num_blocks):
    x = feats[-1]
    skips = feats[1:-1][::-1]
    for i in range(num_blocks):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if i < len(skips):
            x = torch.cat([x, skips[i]], dim=1)
        x = _sd_conv_bn_relu(x, sd, f"{prefix}.blocks.{i}.conv1")
        x = _sd_conv_bn_relu(x, sd, f"{prefix}.blocks.{i}.conv2")
    return x


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def test_basic_import_forward_parity():
    rng = np.random.default_rng(31)
    channels = [32, 16, 8, 4, 2]
    sd = _rand_basic_sd(rng, channels, segm_classes=5)
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)

    model = BasicMTLModel(
        segm_classes=5, decoder_first_channel=32, dtype=jnp.float32
    )
    variables = import_reference_checkpoint(
        "basic", sd, _zeros_variables(model, x)
    )
    out = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats = _torch_forward(tx, _strip(sd, "backbone.encoder.model."))
        dec = _sd_smp_decoder(feats, sd, "backbone.decoder", len(channels))
        tout = {
            k: F.conv2d(
                dec, _t(sd[f"{k}_head.0.weight"]), _t(sd[f"{k}_head.0.bias"]),
                padding=1,
            )
            for k in ("segm", "depth")
        }
    for k in ("segm", "depth"):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-3,
            atol=1e-4,
        )


# ----------------------------------------------------------- MTAN replicas
class _RefDoubleConv(nn.Module):
    """Reference model_utils.py:61-80 attribute layout."""

    def __init__(self, cin, cout):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )

    def forward(self, x):
        return self.double_conv(x)


class _RefAttnEnc(nn.Module):
    """Reference mtan_model.py:12-83 attribute layout."""

    def __init__(self, c_in, c_shared2, c_out, c_prev, hidden):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in + c_prev, hidden, 1)
        self.bn1 = nn.BatchNorm2d(hidden)
        self.conv2 = nn.Conv2d(hidden, c_shared2, 1)
        self.bn2 = nn.BatchNorm2d(c_shared2)
        self.conv3 = nn.Conv2d(c_shared2, c_out, 3, padding=1)
        self.bn3 = nn.BatchNorm2d(c_out)

    def forward(self, shared1, shared2, prev):
        h = shared1 if prev is None else torch.cat([shared1, prev], dim=1)
        h = F.relu(self.bn1(self.conv1(h)))
        a = torch.sigmoid(self.bn2(self.conv2(h)))
        g = F.relu(self.bn3(self.conv3(shared2 * a)))
        return F.max_pool2d(g, 2)


class _RefAttnDec(nn.Module):
    """Reference mtan_model.py:86-169 attribute layout (conv3/bn3 is the
    PREV-stream conv; conv_out/bn_out the output conv)."""

    def __init__(self, c_merged, c_shared2, c_out, c_prev, hidden):
        super().__init__()
        self.conv1 = nn.Conv2d(c_merged + hidden, hidden, 1)
        self.bn1 = nn.BatchNorm2d(hidden)
        self.conv2 = nn.Conv2d(hidden, c_shared2, 1)
        self.bn2 = nn.BatchNorm2d(c_shared2)
        self.conv3 = nn.Conv2d(c_prev, hidden, 3, padding=1)
        self.bn3 = nn.BatchNorm2d(hidden)
        self.conv_out = nn.Conv2d(c_shared2, c_out, 3, padding=1)
        self.bn_out = nn.BatchNorm2d(c_out)

    def forward(self, conv1_shared, prev, conv2_shared):
        p = F.relu(self.bn3(self.conv3(prev)))
        if p.shape[2:] != conv1_shared.shape[2:]:
            p = F.interpolate(
                p, scale_factor=2, mode="bilinear", align_corners=True
            )
        h = torch.cat([conv1_shared, p], dim=1)
        h = F.relu(self.bn1(self.conv1(h)))
        a = torch.sigmoid(self.bn2(self.conv2(h)))
        return F.relu(self.bn_out(self.conv_out(conv2_shared * a)))


class _RefDown(nn.Module):
    def __init__(self, cin, cout, attns):
        super().__init__()
        self.dconv = _RefDoubleConv(cin, cout)
        self.pool = nn.Identity()  # reference builds with apply_pool=False
        self.task_attn_modules = attns

    def forward(self, x, prevs):
        d = self.dconv(x)
        outs = [
            m(x, d, prevs[i] if prevs is not None else None)
            for i, m in enumerate(self.task_attn_modules)
        ]
        return d, outs


class _RefUp(nn.Module):
    def __init__(self, cin, cout, attns):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cin // 2, 2, stride=2)
        self.conv = _RefDoubleConv(cin, cout)
        self.task_attn_modules = attns

    def forward(self, x1, x2, prevs):
        x1 = self.up(x1)
        merged = _pad_concat(x1, x2)  # cat([skip, up]) — model_utils.py:57
        c = self.conv(merged)
        outs = [
            m(merged, prevs[i], c)
            for i, m in enumerate(self.task_attn_modules)
        ]
        return c, outs


class _RefMiniUnet(nn.Module):
    """Reference MTANMiniUnet attribute layout (mtan_model.py:246-404):
    enc_layers/dec_layers hold the shared convs AND the per-task attention
    ModuleLists; heads live in the map_tasks_to_heads ModuleDict."""

    def __init__(self, tasks, first=8, levels=4, hidden=16):
        super().__init__()
        enc_out = [first * 2**i for i in range(levels)]
        enc_in = [3] + enc_out[:-1]
        dec_out = enc_out[::-1]
        dec_in = [enc_out[-1] * 2] + dec_out[:-1]
        dec_prev = [enc_out[-1]] + dec_out[:-1]
        nt = len(tasks)
        self.enc_layers = nn.ModuleList(
            [
                _RefDown(
                    enc_in[i],
                    enc_out[i],
                    nn.ModuleList(
                        [
                            _RefAttnEnc(
                                enc_in[i],
                                enc_out[i],
                                enc_out[i],
                                0 if i == 0 else enc_out[i - 1],
                                hidden,
                            )
                            for _ in range(nt)
                        ]
                    ),
                )
                for i in range(levels)
            ]
        )
        self.bottleneck = _RefDoubleConv(enc_out[-1], enc_out[-1] * 2)
        self.dec_layers = nn.ModuleList(
            [
                _RefUp(
                    dec_in[i],
                    dec_out[i],
                    nn.ModuleList(
                        [
                            _RefAttnDec(
                                dec_in[i],
                                dec_out[i],
                                dec_out[i],
                                dec_prev[i],
                                hidden,
                            )
                            for _ in range(nt)
                        ]
                    ),
                )
                for i in range(levels)
            ]
        )
        self.pool = nn.MaxPool2d(2)
        self.map_tasks_to_heads = nn.ModuleDict(
            {t: nn.Conv2d(dec_out[-1], c, 1) for t, c in tasks.items()}
        )

    def forward(self, x):
        prevs = None
        feats = []
        h = x
        for lay in self.enc_layers:
            h, prevs = lay(h, prevs)
            feats.append(h)
            h = self.pool(h)
        h = self.bottleneck(h)
        for i, lay in enumerate(self.dec_layers):
            h, prevs = lay(h, feats[-(i + 1)], prevs)
        return {
            t: head(prevs[i])
            for i, (t, head) in enumerate(self.map_tasks_to_heads.items())
        }


def _randomize_module(m, rng):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                c = mod.weight.shape[0]
                mod.weight.copy_(_t(rng.uniform(0.5, 1.5, c).astype(np.float32)))
                mod.bias.copy_(_t(rng.normal(scale=0.1, size=c).astype(np.float32)))
                mod.running_mean.copy_(
                    _t(rng.normal(scale=0.1, size=c).astype(np.float32))
                )
                mod.running_var.copy_(
                    _t(rng.uniform(0.5, 1.5, c).astype(np.float32))
                )
            elif isinstance(mod, (nn.Conv2d, nn.ConvTranspose2d)):
                mod.weight.copy_(
                    _t(
                        rng.normal(
                            scale=0.1, size=tuple(mod.weight.shape)
                        ).astype(np.float32)
                    )
                )
                if mod.bias is not None:
                    mod.bias.copy_(
                        _t(
                            rng.normal(
                                scale=0.1, size=tuple(mod.bias.shape)
                            ).astype(np.float32)
                        )
                    )


def test_mtan_import_forward_parity():
    rng = np.random.default_rng(17)
    tasks = {"depth": 1, "segm": 5}
    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16).eval()
    _randomize_module(replica, rng)
    sd = {k: v.detach().numpy() for k, v in replica.state_dict().items()}

    x = rng.uniform(size=(1, 32, 48, 3)).astype(np.float32)
    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    # real reference checkpoints carry the Lightning-wrapper 'model.' prefix
    # (MTLModule.state_dict(), pipeline_utils.py:150-155) — the importer
    # must normalize it away
    wrapped = {f"model.{k}": v for k, v in sd.items()}
    variables = import_reference_checkpoint(
        "mtan", wrapped, _zeros_variables(model, x)
    )
    out = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        tout = replica(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for k in tasks:
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-3,
            atol=1e-4,
        )


# ---------------------------------------------------------------- CSNet
STAGE_CHS = (16, 24, 40, 80, 112, 160)


def _rand_csnet_sd(rng, channels, segm_classes, channel_wise):
    sd = {}
    for task, co in (("depth", 1), ("segm", segm_classes)):
        for k, v in _rand_sd(rng).items():
            sd[f"models.{task}.0.encoder.model.{k}"] = v
        sd.update(
            _rand_smp_decoder_sd(
                rng, f"models.{task}.0.decoder", HEAD_CH, SKIP_CHS, channels
            )
        )
        sd[f"models.{task}.1.0.weight"] = _rand_conv(rng, co, channels[-1], 3)
        sd[f"models.{task}.1.0.bias"] = rng.normal(
            scale=0.1, size=co
        ).astype(np.float32)
    dec_in = [HEAD_CH] + list(channels[:-1])
    # SKIP_CHS is already in decoder-consumption order (skips[-d-1]):
    # d=0 merges the /16 tap (112ch), d=3 the /2 tap (16ch)
    dec_stitch = [
        dec_in[d] + (SKIP_CHS[d] if d < len(SKIP_CHS) else 0)
        for d in range(len(channels))
    ]
    names = [
        (f"0_encoder_model_blocks_{k}", STAGE_CHS[k - 1]) for k in range(1, 7)
    ] + [(f"0_decoder_blocks_{d}", dec_stitch[d]) for d in range(len(channels))]
    for name, c in names:
        shape = (2, 2, c) if channel_wise else (2, 2)
        sd[f"cross_stitch_layers.{name}.weights"] = rng.uniform(
            size=shape
        ).astype(np.float32)
    return sd


def _sd_torch_csnet(x, sd, task_names, channels, channel_wise):
    """sd-driven torch CSNet forward (stitch placement per reference
    cross_stitch_model.py:102-157; semantics parity with the flax model is
    established separately by tests/test_mtan_csnet_parity.py)."""
    from vision_mtl_tpu.models.mobilenetv3 import (
        FEATURE_TAP_AFTER_STAGE,
        NUM_STAGES,
    )

    n = len(task_names)
    encs = [
        _torch_encoder_stages(x, _strip(sd, f"models.{t}.0.encoder.model."))
        for t in task_names
    ]
    feats = [encs[ti][0](x) for ti in range(n)]
    skips = [[] for _ in range(n)]

    def stitch(name, fs):
        w = _t(sd[f"cross_stitch_layers.{name}.weights"])
        stacked = torch.stack(fs, dim=0)
        eq = "aac,abcij->abcij" if channel_wise else "aa,abcij->abcij"
        mixed = torch.einsum(eq, w, stacked)
        return [mixed[i] for i in range(n)]

    for s in range(NUM_STAGES):
        feats = [encs[ti][1](s, feats[ti]) for ti in range(n)]
        if s in FEATURE_TAP_AFTER_STAGE:
            for ti in range(n):
                skips[ti].append(feats[ti])
        feats = stitch(f"0_encoder_model_blocks_{s + 1}", feats)

    feats = [encs[ti][2](feats[ti]) for ti in range(n)]

    for d in range(len(channels)):
        merged = []
        for ti in range(n):
            h = feats[ti]
            if d < len(skips[ti]):
                merged.append(_pad_concat(h, skips[ti][-d - 1]))
            else:
                merged.append(
                    F.interpolate(h, scale_factor=2, mode="nearest")
                )
        merged = stitch(f"0_decoder_blocks_{d}", merged)
        feats = [
            _sd_conv_bn_relu(
                _sd_conv_bn_relu(
                    merged[ti],
                    sd,
                    f"models.{task_names[ti]}.0.decoder.blocks.{d}.conv1",
                ),
                sd,
                f"models.{task_names[ti]}.0.decoder.blocks.{d}.conv2",
            )
            for ti in range(n)
        ]

    return {
        t: F.conv2d(
            feats[ti],
            _t(sd[f"models.{t}.1.0.weight"]),
            _t(sd[f"models.{t}.1.0.bias"]),
            padding=1,
        )
        for ti, t in enumerate(task_names)
    }


@pytest.mark.parametrize("channel_wise", [True, False], ids=["cw", "lw"])
def test_csnet_import_forward_parity(channel_wise):
    rng = np.random.default_rng(23)
    channels = [32, 16, 8, 4, 2]
    sd = _rand_csnet_sd(rng, channels, segm_classes=5, channel_wise=channel_wise)
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)

    model = CSNet(
        task_channels={"depth": 1, "segm": 5},
        decoder_first_channel=32,
        channel_wise_stitching=channel_wise,
        dtype=jnp.float32,
    )
    variables = import_reference_checkpoint(
        "csnet", sd, _zeros_variables(model, x)
    )
    out = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        tout = _sd_torch_csnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            sd,
            ("depth", "segm"),
            channels,
            channel_wise,
        )
    for k in ("depth", "segm"):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-3,
            atol=1e-4,
        )


# ------------------------------------------------------------ error paths
def test_import_missing_key_diff():
    rng = np.random.default_rng(5)
    sd = _rand_basic_sd(rng, [32, 16, 8, 4, 2], segm_classes=5)
    del sd["backbone.decoder.blocks.2.conv1.0.weight"]
    sd["totally.unrelated.weight"] = np.zeros(3, np.float32)
    model = BasicMTLModel(
        segm_classes=5, decoder_first_channel=32, dtype=jnp.float32
    )
    x = np.zeros((1, 64, 96, 3), np.float32)
    with pytest.raises(ValueError) as ei:
        import_reference_checkpoint("basic", sd, _zeros_variables(model, x))
    msg = str(ei.value)
    assert "backbone.decoder.blocks.2.conv1.0.weight" in msg
    assert "totally.unrelated.weight" in msg


def test_import_architecture_mismatch():
    """A channel-wise csnet checkpoint loaded into a layer-wise model must
    fail with a shape diff, not restore silently (the legacy-run-dir hazard
    documented in docs/QUIRKS.md)."""
    rng = np.random.default_rng(7)
    channels = [32, 16, 8, 4, 2]
    sd = _rand_csnet_sd(rng, channels, segm_classes=5, channel_wise=True)
    model = CSNet(
        task_channels={"depth": 1, "segm": 5},
        decoder_first_channel=32,
        channel_wise_stitching=False,
        dtype=jnp.float32,
    )
    x = np.zeros((1, 64, 96, 3), np.float32)
    with pytest.raises(ValueError, match="weights"):
        import_reference_checkpoint("csnet", sd, _zeros_variables(model, x))


def test_restore_session_errors_without_session_artifact(tmp_path):
    """A reference dir holding only model_{e}.pt must fail --resume_dir with
    a message naming the missing session file (not an unrelated Orbax
    error), and a direct .pt without model_ naming must say why."""
    from vision_mtl_tpu.train.checkpoint import restore_session
    from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
    from vision_mtl_tpu.train.state import create_train_state

    tasks = {"depth": 1, "segm": 5}
    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16)
    torch.save(
        {"model": {f"model.{k}": v for k, v in replica.state_dict().items()}},
        tmp_path / "model_3.pt",
    )
    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 48, 3)), lr=1e-3
    )
    with pytest.raises(ValueError, match="session_3.pt"):
        restore_session(state, ReduceLROnPlateau(), str(tmp_path))
    (tmp_path / "best.pt").write_bytes((tmp_path / "model_3.pt").read_bytes())
    with pytest.raises(ValueError, match="weights-only"):
        restore_session(
            state, ReduceLROnPlateau(), str(tmp_path / "best.pt")
        )


def test_convert_basic_records_consumption():
    rng = np.random.default_rng(11)
    sd = _rand_basic_sd(rng, [32, 16, 8, 4, 2], segm_classes=5)
    _, _, rec = convert_basic_state_dict(sd)
    assert not rec.missing
    assert rec.unused() == []  # num_batches_tracked is ignorable


def test_restore_state_from_reference_torch_dir(tmp_path):
    """The --ckpt_dir / eval-harness path: a dir holding the REFERENCE's own
    torch ``model_{e}.pt`` warm-starts through restore_state, latest epoch
    picked like the reference's regex (pipeline_utils.py:217-238)."""
    from vision_mtl_tpu.train.checkpoint import restore_state
    from vision_mtl_tpu.train.state import create_train_state

    rng = np.random.default_rng(41)
    tasks = {"depth": 1, "segm": 5}
    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16).eval()
    _randomize_module(replica, rng)
    # the reference's actual save format: {"model": MTLModule.state_dict()}
    # where the MTLModule's single child is `model`, so every inner key is
    # 'model.'-prefixed (pipeline_utils.py:150-155, training_lit.py:173)
    def ref_save(rep, path):
        torch.save(
            {"model": {f"model.{k}": v for k, v in rep.state_dict().items()}},
            path,
        )

    ref_save(replica, tmp_path / "model_2.pt")
    # a decoy older epoch with different weights: epoch selection must pick 2
    _randomize_module(replica, np.random.default_rng(999))
    ref_save(replica, tmp_path / "model_1.pt")
    sd2 = {
        k[len("model."):]: v.numpy()
        for k, v in torch.load(tmp_path / "model_2.pt", map_location="cpu")[
            "model"
        ].items()
    }

    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    x = np.zeros((1, 32, 48, 3), np.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(x), lr=1e-3
    )
    state = restore_state(state, str(tmp_path))
    expected = import_reference_checkpoint(
        "mtan", sd2, _zeros_variables(model, x)
    )
    for got, want in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(expected["params"])
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_restore_session_from_reference_torch_pair(tmp_path):
    """Continue-training migration: the reference's model_{e}.pt +
    session_{e}.pt pair resumes here with the exact Adam moments, lr,
    plateau scheduler state and epoch (reference save_ckpt,
    pipeline_utils.py:150-163)."""
    from vision_mtl_tpu.train.checkpoint import restore_session
    from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
    from vision_mtl_tpu.train.state import create_train_state, get_lr
    from vision_mtl_tpu.utils.ckpt_import import _FWD

    _convt_kernel = _FWD["convt"]
    import optax

    rng = np.random.default_rng(43)
    tasks = {"depth": 1, "segm": 5}
    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16).train()
    _randomize_module(replica, rng)

    opt = torch.optim.Adam(replica.parameters(), lr=5e-4)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=2, factor=0.9
    )
    x = torch.from_numpy(
        rng.uniform(size=(1, 3, 32, 48)).astype(np.float32)
    )
    for _ in range(3):
        opt.zero_grad()
        out = replica(x)
        (out["depth"].square().mean() + out["segm"].square().mean()).backward()
        opt.step()
    sched.step(1.0)
    sched.step(2.0)  # worse -> num_bad_epochs becomes 1

    # reference save format (pipeline_utils.py:150-163): module-level keys
    torch.save(
        {"model": {f"model.{k}": v for k, v in replica.state_dict().items()}},
        tmp_path / "model_4.pt",
    )
    torch.save(
        {
            "optimizer": opt.state_dict(),
            "scheduler": sched.state_dict(),
            "epoch": 4,
        },
        tmp_path / "session_4.pt",
    )

    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 48, 3)), lr=1e-3
    )
    scheduler = ReduceLROnPlateau(patience=5, factor=0.5)
    state, scheduler, start_epoch = restore_session(
        state, scheduler, str(tmp_path)
    )

    assert start_epoch == 5
    assert int(state.step) == 3
    assert abs(get_lr(state) - 5e-4) < 1e-9
    assert scheduler.patience == 2 and abs(scheduler.factor - 0.9) < 1e-9
    assert scheduler.num_bad_epochs == 1 and abs(scheduler.best - 1.0) < 1e-9

    # moments landed on the right leaves with the weight's own transform:
    # check a ConvTranspose kernel (the flip+transpose case) and its count
    adam = [
        s
        for s in jax.tree_util.tree_leaves(
            state.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert len(adam) == 1
    torch_mu = opt.state_dict()["state"]
    order = [
        k
        for k in replica.state_dict()
        if not any(
            k.endswith(s)
            for s in (".running_mean", ".running_var", ".num_batches_tracked")
        )
    ]
    idx = order.index("dec_layers.0.up.weight")
    np.testing.assert_allclose(
        np.asarray(adam[0].mu["dec_up_0"]["kernel"]),
        _convt_kernel(torch_mu[idx]["exp_avg"].numpy()),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(adam[0].nu["dec_up_0"]["kernel"]),
        _convt_kernel(torch_mu[idx]["exp_avg_sq"].numpy()),
        rtol=1e-6,
    )


# ------------------------------------------------------------------ export
def _models_for_roundtrip():
    return {
        "basic": (
            BasicMTLModel(
                segm_classes=5, decoder_first_channel=32, dtype=jnp.float32
            ),
            (1, 64, 96, 3),
        ),
        "mtan": (
            MTANMiniUnet(
                map_tasks_to_num_channels={"depth": 1, "segm": 5},
                task_subnets_hidden_channels=16,
                encoder_first_channel=8,
                encoder_num_channels=4,
                dtype=jnp.float32,
            ),
            (1, 32, 48, 3),
        ),
        "csnet": (
            CSNet(
                task_channels={"depth": 1, "segm": 5},
                decoder_first_channel=32,
                channel_wise_stitching=True,
                dtype=jnp.float32,
            ),
            (1, 64, 96, 3),
        ),
    }


@pytest.mark.parametrize("name", ["basic", "mtan", "csnet"])
def test_export_import_roundtrip(name):
    """export -> import is the identity on every param and BN stat: import
    and export derive from the same declarative mapping, so this pins both
    directions (and every layout transform's inverse) at once."""
    from vision_mtl_tpu.utils.ckpt_import import export_reference_checkpoint

    model, shape = _models_for_roundtrip()[name]
    rng = np.random.default_rng(57)
    base = _zeros_variables(model, np.zeros(shape, np.float32))
    variables = jax.tree.map(
        lambda z: jnp.asarray(
            rng.normal(scale=0.5, size=z.shape).astype(np.float32)
        ),
        base,
    )
    sd = export_reference_checkpoint(name, variables)
    back = import_reference_checkpoint(name, sd, base)
    for col in ("params", "batch_stats"):
        for got, want in zip(
            jax.tree.leaves(back[col]), jax.tree.leaves(variables[col])
        ):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_export_loads_into_torch_replica_strict():
    """Exported MTAN checkpoints satisfy torch's own strict load_state_dict
    against a module with the reference's attribute layout, and the torch
    forward then matches the flax forward — the train-on-TPU, deploy-in-torch
    path."""
    from vision_mtl_tpu.utils.ckpt_import import export_reference_checkpoint

    rng = np.random.default_rng(59)
    tasks = {"depth": 1, "segm": 5}
    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    x = rng.uniform(size=(1, 32, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.key(3), jnp.asarray(x), train=False)
    from tests.test_mtan_csnet_parity import _randomize_bn

    variables = _randomize_bn(
        {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables["batch_stats"]),
        },
        rng,
    )
    # default export is module-level (the Lightning-wrapper layout the
    # reference's own load consumes, pipeline_utils.py:29)
    sd_module = export_reference_checkpoint("mtan", variables)
    assert all(k.startswith("model.") for k in sd_module)
    sd = export_reference_checkpoint("mtan", variables, module_level=False)
    assert {f"model.{k}" for k in sd} == set(sd_module)

    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16).eval()
    replica.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tout = replica(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for k in tasks:
        np.testing.assert_allclose(
            np.asarray(out[k]),
            tout[k].numpy().transpose(0, 2, 3, 1),
            rtol=2e-3,
            atol=1e-4,
        )


def test_export_script_from_orbax_run_dir(tmp_path):
    """scripts/export_torch_ckpt.py: an Orbax run dir trained here exports
    to a torch .pt that strict-loads into the reference-layout module."""
    import argparse
    import importlib.util

    from vision_mtl_tpu.train.checkpoint import log_args, save_ckpt
    from vision_mtl_tpu.train.plateau import ReduceLROnPlateau
    from vision_mtl_tpu.train.state import create_train_state

    tasks = {"depth": 1, "segm": 5}
    model = MTANMiniUnet(
        map_tasks_to_num_channels=tasks,
        task_subnets_hidden_channels=16,
        encoder_first_channel=8,
        encoder_num_channels=4,
        dtype=jnp.float32,
    )
    state = create_train_state(
        model, jax.random.key(5), jnp.zeros((1, 32, 48, 3)), lr=1e-3
    )
    save_ckpt(state, ReduceLROnPlateau(), 0, str(tmp_path))
    log_args(
        argparse.Namespace(model_name="mtan", dataset_name="synthetic"),
        str(tmp_path / "train_args.yaml"),
    )

    import os as _os

    spec = importlib.util.spec_from_file_location(
        "export_torch_ckpt",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(__file__)),
            "scripts",
            "export_torch_ckpt.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main([str(tmp_path)])
    assert out.endswith("model_0.pt")

    replica = _RefMiniUnet(tasks, first=8, levels=4, hidden=16)
    sd = torch.load(out, map_location="cpu")["model"]
    # script output is module-level (reference-loadable); strip for the bare
    # replica
    replica.load_state_dict(
        {k[len("model."):]: v for k, v in sd.items()}, strict=True
    )
    np.testing.assert_allclose(
        sd["model.map_tasks_to_heads.segm.weight"].numpy()[:, :, 0, 0],
        np.asarray(state.params["head_segm"]["Conv_0"]["kernel"])[0, 0].T,
        rtol=1e-6,
    )


def test_optax_adam_matches_torch_update():
    """Given equal params/moments/count/grad, one optax.adam step equals one
    torch Adam step — the contract the session import relies on."""
    import optax

    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    g = rng.normal(size=(4, 3)).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=1e-3)
    # preload torch moments via two warmup steps with recorded grads
    warm = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(2)]
    for w in warm:
        opt.zero_grad()
        tp.grad = torch.from_numpy(w.copy())
        opt.step()
    st = opt.state_dict()["state"][0]

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    ostate = tx.init(jnp.asarray(tp.detach().numpy()))

    def preload(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jnp.asarray(
                    int(np.asarray(st["step"])), node.count.dtype
                ),
                mu=jnp.asarray(st["exp_avg"].numpy()),
                nu=jnp.asarray(st["exp_avg_sq"].numpy()),
            )
        return node

    ostate = jax.tree_util.tree_map(
        preload,
        ostate,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
    )
    params = jnp.asarray(tp.detach().numpy())
    updates, _ = tx.update(jnp.asarray(g), ostate, params)
    jres = np.asarray(optax.apply_updates(params, updates))

    tp.grad = torch.from_numpy(g.copy())
    opt.step()
    np.testing.assert_allclose(jres, tp.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_find_reference_checkpoint(tmp_path):
    assert find_reference_checkpoint(str(tmp_path)) is None
    (tmp_path / "model_3.pt").write_bytes(b"x")
    (tmp_path / "model_10.pt").write_bytes(b"x")
    (tmp_path / "session_10.pt").write_bytes(b"x")
    assert find_reference_checkpoint(str(tmp_path)).endswith("model_10.pt")
    assert find_reference_checkpoint(str(tmp_path / "nope")) is None
