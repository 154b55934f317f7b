"""Torch/timm weight porting for the MobileNetV3-Large encoder.

The reference's "(P)" configs use imagenet-pretrained timm weights via smp
(reference utils/pipeline_utils.py:85-98, README "HS (P)"). There is no JAX
distribution of those weights, so this module converts a
``mobilenetv3_large_100`` state_dict (timm key layout — the layout inside
smp's timm-mobilenetv3 encoder, prefix-stripped) into our Flax param /
batch_stats trees. Conversion is exact: torch-style conv padding and BN
semantics in models/blocks.py make the ported encoder numerically identical
(tests/test_torch_port.py asserts allclose on all pyramid taps).

Weight sources (any one):
  * ``vision_mtl_tpu/weights/mobilenetv3_large_100.npz`` — numpy archive of
    the state_dict (key -> array);
  * a torch ``.pt``/``.pth`` checkpoint path (loaded with torch if present).

This container has no network egress; when no file is found the loader
warns and returns the randomly-initialized params unchanged.
"""

from __future__ import annotations

import os
import typing as t

import numpy as np

from vision_mtl_tpu.models.mobilenetv3 import MOBILENETV3_LARGE_SPECS

Tree = t.Dict[str, t.Any]

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "weights")
DEFAULT_WEIGHTS = os.path.join(WEIGHTS_DIR, "mobilenetv3_large_100.npz")


def _set(tree: Tree, path: t.Sequence[str], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_encoder_state_dict(
    sd: t.Mapping[str, np.ndarray]
) -> t.Tuple[Tree, Tree]:
    """timm mobilenetv3_large_100 state_dict -> (params, batch_stats) trees
    for models.mobilenetv3.MobileNetV3Encoder."""
    params: Tree = {}
    stats: Tree = {}

    def port_bn(torch_prefix: str, flax_path: t.Sequence[str]) -> None:
        _set(params, list(flax_path) + ["scale"], np.asarray(sd[f"{torch_prefix}.weight"]))
        _set(params, list(flax_path) + ["bias"], np.asarray(sd[f"{torch_prefix}.bias"]))
        _set(stats, list(flax_path) + ["mean"], np.asarray(sd[f"{torch_prefix}.running_mean"]))
        _set(stats, list(flax_path) + ["var"], np.asarray(sd[f"{torch_prefix}.running_var"]))

    def port_conv(
        torch_key: str, flax_path: t.Sequence[str], bias: bool = False
    ) -> None:
        _set(params, list(flax_path) + ["kernel"], _conv_kernel(np.asarray(sd[torch_key])))
        if bias:
            bias_key = torch_key.rsplit(".", 1)[0] + ".bias"
            _set(params, list(flax_path) + ["bias"], np.asarray(sd[bias_key]))

    # stem
    port_conv("conv_stem.weight", ["conv_stem", "Conv_0"])
    port_bn("bn1", ["_stem_bn"])

    # block stages
    for si, stage in enumerate(MOBILENETV3_LARGE_SPECS):
        for bi, spec in enumerate(stage):
            tp = f"blocks.{si}.{bi}"
            fp = f"stages_{si}_{bi}"
            if spec.ds:
                # DepthwiseSeparable: conv_dw/bn1, conv_pw/bn2
                port_conv(f"{tp}.conv_dw.weight", [fp, "Conv_0", "Conv_0"])
                port_bn(f"{tp}.bn1", [fp, "BatchNorm_0", "BatchNorm_0"])
                port_conv(f"{tp}.conv_pw.weight", [fp, "Conv_1", "Conv_0"])
                port_bn(f"{tp}.bn2", [fp, "BatchNorm_1", "BatchNorm_0"])
            else:
                # InvertedResidual: conv_pw/bn1, conv_dw/bn2, [se], conv_pwl/bn3
                port_conv(f"{tp}.conv_pw.weight", [fp, "Conv_0", "Conv_0"])
                port_bn(f"{tp}.bn1", [fp, "BatchNorm_0", "BatchNorm_0"])
                port_conv(f"{tp}.conv_dw.weight", [fp, "Conv_1", "Conv_0"])
                port_bn(f"{tp}.bn2", [fp, "BatchNorm_1", "BatchNorm_0"])
                if spec.se:
                    port_conv(
                        f"{tp}.se.conv_reduce.weight",
                        [fp, "SqueezeExcite_0", "Conv_0", "Conv_0"],
                        bias=True,
                    )
                    port_conv(
                        f"{tp}.se.conv_expand.weight",
                        [fp, "SqueezeExcite_0", "Conv_1", "Conv_0"],
                        bias=True,
                    )
                port_conv(f"{tp}.conv_pwl.weight", [fp, "Conv_2", "Conv_0"])
                port_bn(f"{tp}.bn3", [fp, "BatchNorm_2", "BatchNorm_0"])

    # conv head == timm blocks.6.0 (ConvBnAct)
    port_conv("blocks.6.0.conv.weight", ["conv_head", "Conv_0"])
    port_bn("blocks.6.0.bn1", ["_head_bn"])
    return params, stats


def load_state_dict_file(path: str) -> t.Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu")
    # unwrap common containers: lightning-style {"state_dict": ...} and the
    # reference's own save format {"model": state_dict} (reference
    # utils/pipeline_utils.py:150-155)
    for wrapper in ("state_dict", "model"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _strip_prefix(sd: t.Dict[str, np.ndarray]) -> t.Dict[str, np.ndarray]:
    """Strip smp/timm wrapper prefixes like 'encoder.model.' or 'model.'."""
    for prefix in ("encoder.model.", "model.", ""):
        if any(k.startswith(prefix + "conv_stem") for k in sd):
            return {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
    return sd


def _merge(dst: Tree, src: Tree) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst[k], v)
        else:
            assert dst[k].shape == np.asarray(v).shape, (
                k, dst[k].shape, np.asarray(v).shape
            )
            dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)


def apply_imagenet_backbone(
    params: Tree,
    batch_stats: Tree,
    model_name: str,
    weights_path: t.Optional[str] = None,
) -> t.Tuple[Tree, Tree, bool]:
    """Graft converted encoder weights into a model's param trees.

    Encoder subtree locations: basic -> params["backbone"]["encoder"];
    csnet -> params["encoders_{i}"] per task. MTAN has no imagenet backbone
    (custom mini-Unet — matches the reference, which trains MTAN from
    scratch). Returns (params, batch_stats, loaded?).
    """
    path = weights_path or DEFAULT_WEIGHTS
    alt = path.replace(".npz", ".pth")
    if not os.path.exists(path) and os.path.exists(alt):
        path = alt
    if not os.path.exists(path):
        print(
            f"[torch_port] no imagenet weights at {path}; training from "
            f"scratch (zero-egress environment — place a timm "
            f"mobilenetv3_large_100 state_dict there to enable)."
        )
        return params, batch_stats, False

    sd = _strip_prefix(load_state_dict_file(path))
    enc_params, enc_stats = convert_encoder_state_dict(sd)

    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    if model_name == "basic":
        _merge(params["backbone"]["encoder"], enc_params)
        _merge(batch_stats["backbone"]["encoder"], enc_stats)
    elif model_name == "csnet":
        i = 0
        while f"encoders_{i}" in params:
            _merge(params[f"encoders_{i}"], enc_params)
            _merge(batch_stats[f"encoders_{i}"], enc_stats)
            i += 1
    else:
        print(f"[torch_port] model {model_name} has no imagenet backbone")
        return params, batch_stats, False
    print(f"[torch_port] loaded imagenet backbone from {path}")
    return params, batch_stats, True
