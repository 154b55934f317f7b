"""Numerical parity of the Flax MobileNetV3-Large encoder vs torch.

Builds a random timm-layout state_dict, runs an independent torch functional
implementation of mobilenetv3_large_100 (conv/BN/SE/hardswish semantics per
timm), converts the same weights with utils.torch_port, and asserts the Flax
encoder reproduces every pyramid tap. This validates conv padding (incl.
stride-2), BN eval semantics, SE gating, residuals, and tap positions —
i.e., that ported imagenet weights behave identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.models.blocks import make_divisible
from vision_mtl_tpu.models.mobilenetv3 import (
    MOBILENETV3_LARGE_SPECS,
    MobileNetV3Encoder,
)
from vision_mtl_tpu.utils.torch_port import (
    apply_imagenet_backbone,
    convert_encoder_state_dict,
)

torch = pytest.importorskip("torch")


def _rand_sd(rng):
    """Random state_dict in timm mobilenetv3_large_100 key layout."""
    sd = {}

    def conv(key, out_c, in_c, k):
        sd[key] = rng.normal(scale=0.1, size=(out_c, in_c, k, k)).astype(
            np.float32
        )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(scale=0.1, size=c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(scale=0.1, size=c).astype(
            np.float32
        )
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32
        )

    conv("conv_stem.weight", 16, 3, 3)
    bn("bn1", 16)
    in_c = 16
    for si, stage in enumerate(MOBILENETV3_LARGE_SPECS):
        for bi, s in enumerate(stage):
            tp = f"blocks.{si}.{bi}"
            if s.ds:
                conv(f"{tp}.conv_dw.weight", s.exp_ch, 1, s.kernel)
                bn(f"{tp}.bn1", s.exp_ch)
                conv(f"{tp}.conv_pw.weight", s.out_ch, s.exp_ch, 1)
                bn(f"{tp}.bn2", s.out_ch)
            else:
                conv(f"{tp}.conv_pw.weight", s.exp_ch, in_c, 1)
                bn(f"{tp}.bn1", s.exp_ch)
                conv(f"{tp}.conv_dw.weight", s.exp_ch, 1, s.kernel)
                bn(f"{tp}.bn2", s.exp_ch)
                if s.se:
                    rd = make_divisible(s.exp_ch * 0.25)
                    conv(f"{tp}.se.conv_reduce.weight", rd, s.exp_ch, 1)
                    sd[f"{tp}.se.conv_reduce.bias"] = rng.normal(
                        scale=0.1, size=rd
                    ).astype(np.float32)
                    conv(f"{tp}.se.conv_expand.weight", s.exp_ch, rd, 1)
                    sd[f"{tp}.se.conv_expand.bias"] = rng.normal(
                        scale=0.1, size=s.exp_ch
                    ).astype(np.float32)
                conv(f"{tp}.conv_pwl.weight", s.out_ch, s.exp_ch, 1)
                bn(f"{tp}.bn3", s.out_ch)
            in_c = s.out_ch
    conv("blocks.6.0.conv.weight", 960, 160, 1)
    bn("blocks.6.0.bn1", 960)
    return sd


def _torch_forward(x, sd):
    """Independent torch functional forward (timm semantics)."""
    import torch.nn.functional as F

    T = lambda k: torch.from_numpy(sd[k])  # noqa: E731

    def bn(x, p):
        return F.batch_norm(
            x,
            T(f"{p}.running_mean"),
            T(f"{p}.running_var"),
            T(f"{p}.weight"),
            T(f"{p}.bias"),
            False,
            0.1,
            1e-5,
        )

    hs = F.hardswish
    feats = [x]
    h = F.conv2d(x, T("conv_stem.weight"), stride=2, padding=1)
    h = hs(bn(h, "bn1"))
    taps = {0, 1, 2, 4}
    for si, stage in enumerate(MOBILENETV3_LARGE_SPECS):
        for bi, s in enumerate(stage):
            tp = f"blocks.{si}.{bi}"
            act = F.relu if s.act == "relu" else hs
            shortcut = h
            if s.ds:
                h = F.conv2d(
                    h,
                    T(f"{tp}.conv_dw.weight"),
                    stride=s.stride,
                    padding=(s.kernel - 1) // 2,
                    groups=s.exp_ch,
                )
                h = act(bn(h, f"{tp}.bn1"))
                h = F.conv2d(h, T(f"{tp}.conv_pw.weight"))
                h = bn(h, f"{tp}.bn2")
            else:
                h = F.conv2d(h, T(f"{tp}.conv_pw.weight"))
                h = act(bn(h, f"{tp}.bn1"))
                h = F.conv2d(
                    h,
                    T(f"{tp}.conv_dw.weight"),
                    stride=s.stride,
                    padding=(s.kernel - 1) // 2,
                    groups=s.exp_ch,
                )
                h = act(bn(h, f"{tp}.bn2"))
                if s.se:
                    se = h.mean((2, 3), keepdim=True)
                    se = F.conv2d(
                        se,
                        T(f"{tp}.se.conv_reduce.weight"),
                        T(f"{tp}.se.conv_reduce.bias"),
                    )
                    se = F.relu(se)
                    se = F.conv2d(
                        se,
                        T(f"{tp}.se.conv_expand.weight"),
                        T(f"{tp}.se.conv_expand.bias"),
                    )
                    h = h * F.hardsigmoid(se)
                h = F.conv2d(h, T(f"{tp}.conv_pwl.weight"))
                h = bn(h, f"{tp}.bn3")
            if s.stride == 1 and shortcut.shape[1] == h.shape[1]:
                h = h + shortcut
        if si in taps:
            feats.append(h)
    h = F.conv2d(h, T("blocks.6.0.conv.weight"))
    h = hs(bn(h, "blocks.6.0.bn1"))
    feats.append(h)
    return feats


def test_encoder_matches_torch(rng):
    sd = _rand_sd(rng)
    x = rng.uniform(size=(2, 3, 64, 96)).astype(np.float32)  # NCHW for torch

    with torch.no_grad():
        torch_feats = _torch_forward(torch.from_numpy(x), sd)

    model = MobileNetV3Encoder(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 64, 96, 3)), train=False
    )
    enc_params, enc_stats = convert_encoder_state_dict(sd)
    variables = {"params": enc_params, "batch_stats": enc_stats}
    flax_feats = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )

    assert len(torch_feats) == len(flax_feats) == 6
    for i, (tf, ff) in enumerate(zip(torch_feats, flax_feats)):
        tf = tf.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            tf, np.asarray(ff), rtol=1e-4, atol=1e-4, err_msg=f"tap {i}"
        )


def test_apply_imagenet_backbone_grafts(rng, tmp_path):
    sd = _rand_sd(rng)
    npz = tmp_path / "mobilenetv3_large_100.npz"
    np.savez(npz, **sd)

    from vision_mtl_tpu.models.basic import BasicMTLModel

    model = BasicMTLModel(
        segm_classes=5, decoder_first_channel=32, dtype=jnp.float32
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params, stats, loaded = apply_imagenet_backbone(
        variables["params"],
        variables["batch_stats"],
        "basic",
        weights_path=str(npz),
    )
    assert loaded
    got = params["backbone"]["encoder"]["conv_stem"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(sd["conv_stem.weight"], (2, 3, 1, 0))
    )


def test_apply_imagenet_backbone_missing_file_is_graceful(capsys):
    params = {"backbone": {"encoder": {}}}
    stats = {"backbone": {"encoder": {}}}
    p2, s2, loaded = apply_imagenet_backbone(
        params, stats, "basic", weights_path="/nonexistent/w.npz"
    )
    assert not loaded
    assert "training from scratch" in capsys.readouterr().out


def test_fetch_script_saves_converter_ready_npz(rng, tmp_path, monkeypatch):
    """scripts/fetch_imagenet_weights.py: fetched state_dict lands as the
    npz the converter auto-discovers; offline hosts get an actionable
    error."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "fetch_imagenet_weights",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "fetch_imagenet_weights.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(v) for k, v in _rand_sd(rng).items()}
    monkeypatch.setattr(mod, "_state_dict_via_timm", lambda: sd)
    out = tmp_path / "mobilenetv3_large_100.npz"
    monkeypatch.setattr(sys, "argv", ["fetch", "--out", str(out)])
    mod.main()
    assert out.exists()
    from vision_mtl_tpu.utils.torch_port import load_state_dict_file

    loaded = load_state_dict_file(str(out))
    np.testing.assert_allclose(
        loaded["conv_stem.weight"], sd["conv_stem.weight"].numpy()
    )

    # offline: both sources fail -> actionable SystemExit naming --from_file
    def boom():
        raise OSError("no egress")

    monkeypatch.setattr(mod, "_state_dict_via_timm", boom)
    monkeypatch.setattr(mod, "_state_dict_via_hub", boom)
    out2 = tmp_path / "w2.npz"
    monkeypatch.setattr(sys, "argv", ["fetch", "--out", str(out2)])
    with pytest.raises(SystemExit, match="from_file"):
        mod.main()

    # --from_file: a local torch .pth converts with no network and no timm
    # (the supported offline "(P)" route — docs/MIGRATION.md)
    pth = tmp_path / "mobilenetv3_large_100_ra-f55367f5.pth"
    torch.save({k: v for k, v in sd.items()}, str(pth))
    out3 = tmp_path / "w3.npz"
    monkeypatch.setattr(
        sys, "argv", ["fetch", "--from_file", str(pth), "--out", str(out3)]
    )
    mod.main()
    loaded3 = load_state_dict_file(str(out3))
    np.testing.assert_allclose(
        loaded3["conv_stem.weight"], sd["conv_stem.weight"].numpy()
    )


def test_converter_golden_digest(tmp_path):
    """Fixed-weight golden fixture: the converter's output on a
    DETERMINISTIC state_dict must never drift (layout mapping is part of
    the checkpoint-compat contract — reference utils/model_utils.py:25-34).
    The digest covers every converted leaf (params + batch stats) in
    path-sorted order."""
    import hashlib

    rng = np.random.default_rng(12345)
    sd = _rand_sd(rng)
    params, stats = convert_encoder_state_dict(sd)
    h = hashlib.sha256()
    for tree in (params, stats):
        for path, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(tree)[0],
            key=lambda kv: str(kv[0]),
        ):
            h.update(str(path).encode())
            h.update(
                np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes()
            )
    assert h.hexdigest() == (
        "f9d00b71b5cc2908dfd872e9d16f82b091bd8d7e30941b15f2f1d51ff0766e72"
    )
