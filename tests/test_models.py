"""Model structure tests: output contracts, param counts aligned to the
reference's ~13.3M claim (reference README.md:134), stitch-unit inventory.

Uses jax.eval_shape so no compilation/compute happens (fast on CPU)."""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_mtl_tpu.cfg import cityscapes_data_cfg
from vision_mtl_tpu.models import build_model
from vision_mtl_tpu.models.basic import BasicMTLModel
from vision_mtl_tpu.models.cross_stitch import CSNet
from vision_mtl_tpu.models.mtan import MTANMiniUnet


def _param_count(model, x_shape=(1, 64, 64, 3)):
    x = jnp.zeros(x_shape, jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    return n, shapes


def _out_shapes(model, shapes, x_shape=(1, 64, 64, 3)):
    x = jnp.zeros(x_shape, jnp.float32)
    return jax.eval_shape(lambda v: model.apply(v, x, train=False), shapes)


def test_basic_param_count_and_contract():
    model = BasicMTLModel(segm_classes=19, decoder_first_channel=540)
    n, shapes = _param_count(model)
    assert 13.0e6 < n < 13.8e6, n
    out = _out_shapes(model, shapes)
    assert set(out) == {"segm", "depth"}
    assert out["segm"].shape == (1, 64, 64, 19)
    assert out["depth"].shape == (1, 64, 64, 1)


def test_mtan_param_count_and_contract():
    model = MTANMiniUnet(
        map_tasks_to_num_channels={"depth": 1, "segm": 19},
        task_subnets_hidden_channels=128,
        encoder_first_channel=32,
        encoder_num_channels=4,
    )
    n, shapes = _param_count(model)
    assert 12.8e6 < n < 13.8e6, n
    out = _out_shapes(model, shapes)
    assert out["segm"].shape == (1, 64, 64, 19)
    assert out["depth"].shape == (1, 64, 64, 1)


def test_csnet_param_count_and_stitches():
    model = CSNet(task_channels={"depth": 1, "segm": 19})
    n, shapes = _param_count(model)
    assert 12.9e6 < n < 13.9e6, n
    params = shapes["params"]
    stitch_keys = [k for k in params if "stitch" in k.lower()]
    # 6 encoder + 5 decoder stitch units (reference stitch placement)
    assert len(stitch_keys) == 11, sorted(stitch_keys)
    # channel-wise weights: (T, T, C) with the reference channel widths
    widths = sorted(
        params[k]["weights"].shape[2] for k in stitch_keys
    )
    assert widths == sorted([16, 24, 40, 80, 112, 160, 1072, 296, 152, 80, 32])
    out = _out_shapes(model, shapes)
    assert out["segm"].shape == (1, 64, 64, 19)
    assert out["depth"].shape == (1, 64, 64, 1)


def test_csnet_scalar_stitching():
    model = CSNet(task_channels={"depth": 1, "segm": 19}, channel_wise_stitching=False)
    _, shapes = _param_count(model)
    stitch_keys = [k for k in shapes["params"] if "stitch" in k.lower()]
    for k in stitch_keys:
        assert shapes["params"][k]["weights"].shape == (2, 2)


def test_build_model_registry():
    for name in ("basic", "mtan", "csnet"):
        args = argparse.Namespace(model_name=name, channel_wise_stitching=True)
        model = build_model(args, cityscapes_data_cfg)
        assert model is not None
    with pytest.raises(NotImplementedError):
        build_model(argparse.Namespace(model_name="nope"), cityscapes_data_cfg)


def test_csnet_upsample_skips_non_divisible_input():
    """upsample_skips must handle inputs not divisible by 32: the 2x
    nearest upsample can land a pixel off the skip (ceil-strided encoder)
    and is cropped/padded to the skip's exact size."""
    import jax
    import jax.numpy as jnp

    from vision_mtl_tpu.models.cross_stitch import CSNet

    model = CSNet(
        task_channels={"depth": 1, "segm": 5},
        decoder_first_channel=16,
        channel_wise_stitching=False,
        upsample_skips=True,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 144, 160, 3))
    out = jax.eval_shape(
        lambda: model.init_with_output(jax.random.key(0), x, train=False)[0]
    )
    assert out["segm"].shape == (1, 144, 160, 5)
    assert out["depth"].shape == (1, 144, 160, 1)


def test_get_joint_layer_names_inventory():
    # parity shim for reference model_utils.py:83-97: one stitch-eligible
    # position per encoder stage + per decoder block, forward order,
    # matching the 11 stitch units CSNet actually instantiates
    from vision_mtl_tpu.models.cross_stitch import get_joint_layer_names

    names = get_joint_layer_names()
    assert len(names) == 11
    assert names[0].startswith("encoder.") and names[-1].startswith("decoder.")
    assert [n for n in names if "encoder" in n] == [
        f"encoder.stage{i}" for i in range(6)
    ]
