"""CityscapesDataset on a synthetic on-disk npy tree: python vs native path
equivalence, datamodule integration, loader usage."""

import numpy as np
import pytest

from vision_mtl_tpu.data.cityscapes import CityscapesDataset
from vision_mtl_tpu.data.loader import DataLoader
from vision_mtl_tpu.data import native


@pytest.fixture(scope="module")
def cs_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    rng = np.random.default_rng(3)
    h, w = 128, 256
    for stage, n in (("train", 6), ("val", 4)):
        for sub in ("image", "label", "depth"):
            (root / stage / sub).mkdir(parents=True)
        for i in range(n):
            img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
            mask = rng.integers(-1, 19, size=(h, w)).astype(np.int64)
            depth = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
            np.save(root / stage / "image" / f"{i:04d}.npy", img)
            np.save(root / stage / "label" / f"{i:04d}.npy", mask)
            np.save(root / stage / "depth" / f"{i:04d}.npy", depth)
    return str(root)


def test_sample_contract(cs_tree):
    ds = CityscapesDataset(stage="train", data_base_dir=cs_tree)
    assert len(ds) == 6
    s = ds[0]
    assert s["img"].shape == (128, 256, 3) and s["img"].dtype == np.float32
    assert s["mask"].shape == (128, 256) and s["mask"].dtype == np.int32
    assert s["depth"].shape == (128, 256, 1)
    # ignore fold-in: no -1 left, max <= 18
    assert s["mask"].min() >= 0 and s["mask"].max() <= 18


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_batch_matches_python(cs_tree):
    ds = CityscapesDataset(stage="train", data_base_dir=cs_tree)
    idxs = [0, 2, 4]
    batch = ds.load_batch(idxs)
    for j, i in enumerate(idxs):
        s = ds[i]
        np.testing.assert_allclose(batch["img"][j], s["img"], rtol=1e-6)
        np.testing.assert_array_equal(batch["mask"][j], s["mask"])
        np.testing.assert_allclose(
            batch["depth"][j], s["depth"], rtol=1e-6
        )


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_loader_uses_native_path(cs_tree, monkeypatch):
    ds = CityscapesDataset(stage="val", data_base_dir=cs_tree)
    calls = {"native": 0}
    orig = ds.load_batch

    def counting(idxs):
        calls["native"] += 1
        return orig(idxs)

    monkeypatch.setattr(ds, "load_batch", counting)
    batches = list(DataLoader(ds, batch_size=2))
    assert len(batches) == 2
    assert calls["native"] == 2
    assert batches[0]["img"].shape == (2, 128, 256, 3)
