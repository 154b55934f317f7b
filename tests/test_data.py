"""Data layer: synthetic datasets, datamodule splits, loader batching/padding,
mesh spec parsing."""

import numpy as np
import pytest

from vision_mtl_tpu.data.datamodule import MTLDataModule
from vision_mtl_tpu.data.loader import DataLoader
from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset
from vision_mtl_tpu.parallel.mesh import create_mesh, parse_mesh_shape


def test_synthetic_sample_contract():
    ds = SyntheticMTLDataset(stage="train")
    s = ds[0]
    assert s["img"].shape == (64, 64, 3) and s["img"].dtype == np.float32
    assert s["mask"].shape == (64, 64) and s["mask"].dtype == np.int32
    assert s["depth"].shape == (64, 64, 1) and s["depth"].dtype == np.float32
    # deterministic per index
    s2 = ds[0]
    np.testing.assert_array_equal(s["img"], s2["img"])


def test_benchmark_batch():
    ds = SyntheticMTLDataset(stage="train")
    b = ds.load_benchmark_batch()
    assert b["img"].shape == (4, 64, 64, 3)
    assert b["mask"].shape == (4, 64, 64)
    assert b["depth"].shape == (4, 64, 64, 1)


def test_datamodule_split_seeded():
    dm1 = MTLDataModule("synthetic", batch_size=4, seed=11)
    dm1.setup()
    dm2 = MTLDataModule("synthetic", batch_size=4, seed=11)
    dm2.setup()
    assert dm1.data_train.indices == dm2.data_train.indices
    assert len(dm1.data_train) == int(64 * 0.8)
    assert len(dm1.data_val) == 64 - int(64 * 0.8)
    # train/val are disjoint
    assert not set(dm1.data_train.indices) & set(dm1.data_val.indices)

    dm3 = MTLDataModule("synthetic", batch_size=4, seed=12)
    dm3.setup()
    assert dm3.data_train.indices != dm1.data_train.indices


def test_datamodule_overfit_mode():
    dm = MTLDataModule("synthetic", batch_size=4, do_overfit=True)
    dm.setup()
    assert len(dm.data_train) == 4
    assert dm.data_train is dm.data_val
    assert dm.data_test is dm.data_train
    assert dm.data_predict is dm.data_train


def test_train_loader_drops_ragged_last():
    ds = SyntheticMTLDataset(stage="train")  # 64 samples
    dl = DataLoader(ds, batch_size=10, shuffle=True, seed=0, drop_last=True)
    batches = list(dl)
    assert len(batches) == 6
    assert all(b["img"].shape[0] == 10 for b in batches)
    # reshuffles across epochs
    b1 = list(dl)[0]["img"]
    assert not np.array_equal(batches[0]["img"], b1)


def test_eval_loader_pads_last():
    ds = SyntheticMTLDataset(stage="val")  # 16 samples
    dl = DataLoader(ds, batch_size=5, pad_last=True)
    batches = list(dl)
    assert len(batches) == 4
    last = batches[-1]
    assert last["img"].shape[0] == 5
    np.testing.assert_array_equal(last["valid"], [1, 0, 0, 0, 0])
    for b in batches[:-1]:
        np.testing.assert_array_equal(b["valid"], np.ones(5))


def test_loader_threaded_matches_serial():
    ds = SyntheticMTLDataset(stage="val")
    serial = list(DataLoader(ds, batch_size=4))
    threaded = list(DataLoader(ds, batch_size=4, num_workers=4))
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["img"], b["img"])


def test_parse_mesh_shape():
    assert parse_mesh_shape("data:-1", 8) == {"data": 8}
    assert parse_mesh_shape("data:4,spatial:2", 8) == {"data": 4, "spatial": 2}
    assert parse_mesh_shape("data:-1,spatial:2", 8) == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        parse_mesh_shape("data:3", 8)
    with pytest.raises(ValueError):
        parse_mesh_shape("data:-1,spatial:-1", 8)


def test_create_mesh_axes():
    mesh = create_mesh("data:4,spatial:2")
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2


def test_resize_matches_torch_antialiased_bilinear(rng):
    """The host-side resize (PIL) must match torch's antialias=True bilinear
    — the kernel torchvision's Resize applies in the reference NYUv2
    transform (reference cfg.py:144-155). Measured float-epsilon equal."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from vision_mtl_tpu.cfg import ResizeSpec
    from vision_mtl_tpu.data.transforms import resize_depth, resize_image

    spec = ResizeSpec(height=64, width=96)
    img = rng.uniform(size=(120, 160, 3)).astype(np.float32)
    ours = resize_image(img, spec)
    ref = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1))[None],
        size=(64, 96),
        mode="bilinear",
        antialias=True,
        align_corners=False,
    )[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    d = rng.uniform(0, 10.0, size=(120, 160)).astype(np.float32)
    ours_d = resize_depth(d, spec, bilinear=True)
    ref_d = F.interpolate(
        torch.from_numpy(d)[None, None], size=(64, 96),
        mode="bilinear", antialias=True,
    )[0, 0].numpy()
    np.testing.assert_allclose(ours_d, ref_d, atol=2e-4)  # values in [0,10]


def test_val_split_uses_test_transform(tmp_path, monkeypatch):
    """Quirk #5 for real: the val Subset must run the TEST transform (the
    reference's Subset-attribute write silently leaves the train one).
    Uses a fake cityscapes tree — the synthetic dataset ignores transforms."""
    from vision_mtl_tpu.cfg import ResizeSpec, cityscapes_data_cfg

    rng = np.random.default_rng(2)
    h, w, n = 16, 24, 10
    for sub in ("image", "label", "depth"):
        (tmp_path / "train" / sub).mkdir(parents=True)
    for i in range(n):
        np.save(tmp_path / "train" / "image" / f"{i:03d}.npy",
                rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32))
        np.save(tmp_path / "train" / "label" / f"{i:03d}.npy",
                rng.integers(-1, 19, size=(h, w)).astype(np.int64))
        np.save(tmp_path / "train" / "depth" / f"{i:03d}.npy",
                rng.uniform(0, 1, size=(h, w)).astype(np.float32))
    monkeypatch.setattr(cityscapes_data_cfg, "data_dir", str(tmp_path))

    dm = MTLDataModule(
        "cityscapes",
        train_transform=None,              # raw 16x24
        test_transform=ResizeSpec(8, 12),
        batch_size=2,
    )
    dm.setup("fit")
    assert dm.data_train[0]["img"].shape[:2] == (16, 24)
    assert dm.data_val[0]["img"].shape[:2] == (8, 12)
    # same seeded index split: full disjoint coverage
    assert len(dm.data_train) + len(dm.data_val) == n


def test_do_overfit_stage_test_only():
    """setup('test') with do_overfit must materialize the overfit subset
    (previously data_test was assigned a still-None data_train)."""
    dm = MTLDataModule("synthetic", do_overfit=True, batch_size=2)
    dm.setup("test")
    batch = next(iter(dm.test_dataloader()))
    assert batch["img"].shape[0] == 2


def test_loader_invariants_property_sweep():
    """Property sweep over loader configurations: batch count/shapes, the
    pad 'valid' mask, seeded-shuffle determinism, and skip_batches ==
    suffix of the full iteration — for every (bs, shuffle, mode, skip)
    combination."""
    import itertools

    import numpy as np

    from vision_mtl_tpu.data.loader import DataLoader
    from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset

    ds = SyntheticMTLDataset(stage="train")
    n = len(ds)
    for bs, shuffle, mode in itertools.product(
        (1, 7, 8), (False, True), ("drop", "pad", "plain")
    ):
        kw = dict(
            batch_size=bs,
            shuffle=shuffle,
            seed=5,
            drop_last=mode == "drop",
            pad_last=mode == "pad",
        )
        full = list(DataLoader(ds, **kw))
        if mode == "drop":
            assert len(full) == n // bs
            assert all(b["img"].shape[0] == bs for b in full)
        else:
            assert len(full) == (n + bs - 1) // bs
        if mode == "pad":
            assert all(b["img"].shape[0] == bs for b in full)
            tail = full[-1]["valid"]
            assert tail.sum() == (n % bs or bs)
        # deterministic: a same-seed loader reproduces the epoch exactly
        again = list(DataLoader(ds, **kw))
        for a, b in zip(full, again):
            np.testing.assert_array_equal(a["img"], b["img"])
        # skip == suffix, for every legal skip depth
        for skip in (1, len(full) - 1, len(full)):
            lo = DataLoader(ds, **kw)
            lo.skip_batches = skip
            tail_batches = list(lo)
            assert len(tail_batches) == len(full) - skip
            for got, want in zip(tail_batches, full[skip:]):
                np.testing.assert_array_equal(got["img"], want["img"])
