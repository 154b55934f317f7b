"""NYUv2 loader on a synthetic on-disk PNG tree: normalization semantics
(uint8 img /255, mask un-scaling quirk, uint16 depth /1e4 /max_depth,
antialiased label resize), download gating."""

import numpy as np
import pytest
from PIL import Image

from vision_mtl_tpu.cfg import ResizeSpec
from vision_mtl_tpu.data.nyuv2 import NYUv2


@pytest.fixture(scope="module")
def nyu_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyuv2")
    rng = np.random.default_rng(5)
    h, w = 48, 64
    for stage, n in (("train", 5), ("test", 3)):
        for part in ("rgb", "seg13", "depth"):
            (root / f"{stage}_{part}").mkdir(parents=True)
        for i in range(n):
            name = f"{i + 1:04d}.png"
            rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            seg = rng.integers(0, 14, size=(h, w)).astype(np.uint8)
            depth_m = rng.uniform(0.5, 9.9, size=(h, w))
            depth16 = (depth_m * 1e4).astype(np.uint16)
            Image.fromarray(rgb).save(root / f"{stage}_rgb" / name)
            Image.fromarray(seg).save(root / f"{stage}_seg13" / name)
            Image.fromarray(depth16).save(root / f"{stage}_depth" / name)
    return str(root)


def test_sample_contract_no_resize(nyu_tree):
    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=None)
    assert len(ds) == 5
    s = ds[0]
    assert s["img"].shape == (48, 64, 3)
    assert s["img"].dtype == np.float32
    assert 0.0 <= s["img"].min() and s["img"].max() <= 1.0
    assert s["mask"].shape == (48, 64) and s["mask"].dtype == np.int32
    assert 0 <= s["mask"].min() and s["mask"].max() <= 13
    assert s["depth"].shape == (48, 64, 1)
    # depth: uint16/1e4 -> meters, then /max_depth(10) -> [0,1]
    assert 0.0 < s["depth"].max() <= 1.0


def test_mask_values_preserved_without_resize(nyu_tree):
    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=None)
    raw = ds.load_raw_sample(0)
    s = ds.prepare_sample(raw)
    np.testing.assert_array_equal(s["mask"], raw["mask"].astype(np.int32))


def test_resize_transform(nyu_tree):
    spec = ResizeSpec(32, 32, antialias=True)
    ds = NYUv2(stage="test", data_base_dir=nyu_tree, transforms=spec)
    s = ds[0]
    assert s["img"].shape == (32, 32, 3)
    assert s["mask"].shape == (32, 32)
    assert s["depth"].shape == (32, 32, 1)
    # mask labels remain in-range despite the bilinear label resize quirk
    assert 0 <= s["mask"].min() and s["mask"].max() <= 13


def test_cache_batch_matches_python_path(nyu_tree):
    """The memmap cache path (load_batch) is byte-identical to the
    per-sample Python path for every stream."""
    from vision_mtl_tpu.data.nyu_cache import build_cache

    spec = ResizeSpec(32, 32, antialias=True)
    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
    assert ds.load_batch([0, 1]) is None  # no cache yet -> python fallback
    # build_cache resets the latched cache-miss probe: the SAME instance
    # must pick up the fresh cache on its next load_batch
    build_cache(ds)
    idxs = [3, 0, 2]
    batch = ds.load_batch(idxs)
    assert batch is not None
    for j, i in enumerate(idxs):
        s = ds[i]
        np.testing.assert_array_equal(batch["img"][j], s["img"])
        np.testing.assert_array_equal(batch["mask"][j], s["mask"])
        np.testing.assert_array_equal(batch["depth"][j], s["depth"])
    assert batch["mask"].dtype == np.int32
    assert batch["img"].dtype == np.float32

    # build is idempotent: second call reuses the valid cache
    import os

    meta = os.path.join(
        nyu_tree, "_cache", "train_32x32_v1", "meta.json"
    )
    mtime = os.path.getmtime(meta)
    build_cache(ds)
    assert os.path.getmtime(meta) == mtime


def test_cache_rejected_when_stale(nyu_tree):
    """A cache built under different max_depth (or any meta mismatch) is
    never silently used."""
    from vision_mtl_tpu.data.nyu_cache import build_cache, open_cache

    spec = ResizeSpec(32, 32, antialias=True)
    ds = NYUv2(stage="test", data_base_dir=nyu_tree, transforms=spec)
    build_cache(ds)
    assert open_cache(ds) is not None
    other = NYUv2(
        stage="test", data_base_dir=nyu_tree, transforms=spec, max_depth=5.0
    )
    assert open_cache(other) is None
    assert other.load_batch([0]) is None


def test_cache_rejected_when_source_regenerated(nyu_tree):
    """Rewriting a source PNG IN PLACE (same filename — e.g. a regenerated
    synthetic tree or a corrected data drop) must invalidate the cache:
    meta.json carries a size+mtime source fingerprint (round-5 fix; the
    filename-only sha1 kept serving stale arrays)."""
    import os
    import time

    from PIL import Image

    from vision_mtl_tpu.data.nyu_cache import build_cache, cache_valid

    spec = ResizeSpec(32, 32, antialias=True)
    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
    build_cache(ds)
    assert cache_valid(ds)
    # overwrite one rgb png with different content, same name
    fn = ds.filenames[0]
    path = os.path.join(nyu_tree, "train_rgb", fn)
    rng = np.random.default_rng(99)
    time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    Image.fromarray(
        rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
    ).save(path)
    assert not cache_valid(ds)
    # a fresh dataset instance falls back to the python path, then rebuild
    ds2 = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
    assert ds2.load_batch([0]) is None
    build_cache(ds2)
    assert cache_valid(ds2)
    batch = ds2.load_batch([0])
    np.testing.assert_array_equal(batch["img"][0], ds2[0]["img"])


def test_cache_loader_integration(nyu_tree):
    """DataLoader picks up the cached load_batch automatically and yields
    the same batches as the per-sample path."""
    from vision_mtl_tpu.data.loader import DataLoader
    from vision_mtl_tpu.data.nyu_cache import build_cache

    spec = ResizeSpec(32, 32, antialias=True)
    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
    build_cache(ds)

    class _NoBatch:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def __getitem__(self, i):
            return self._inner[i]

    kw = dict(batch_size=2, shuffle=True, seed=7, drop_last=True)
    cached = list(DataLoader(ds, **kw))
    plain = list(DataLoader(_NoBatch(ds), **kw))
    assert len(cached) == len(plain) == 2
    for b1, b2 in zip(cached, plain):
        for k in ("img", "mask", "depth"):
            np.testing.assert_array_equal(b1[k], b2[k])


def test_missing_data_raises(tmp_path):
    with pytest.raises(RuntimeError, match="Dataset not complete"):
        NYUv2(stage="train", data_base_dir=str(tmp_path / "nope"))


def test_download_without_network_raises_actionable(tmp_path):
    from vision_mtl_tpu.data.nyuv2 import _fetch

    with pytest.raises(RuntimeError, match="Place the"):
        _fetch("http://192.0.2.1/never.tgz", str(tmp_path))


def test_benchmark_idxs_defined():
    assert NYUv2.benchmark_idxs == [647, 584, 169, 768]


def test_load_via_native_fallback(nyu_tree, monkeypatch):
    """With PIL absent the loader falls back to the native PNG decoder and
    produces identical samples."""
    import vision_mtl_tpu.data.nyuv2 as nyu_mod
    from vision_mtl_tpu.data import native

    if not native.available():
        pytest.skip("native lib not built")
    ds_pil = nyu_mod.NYUv2(stage="train", data_base_dir=str(nyu_tree))
    s_pil = ds_pil.load_raw_sample(0)
    monkeypatch.setattr(nyu_mod, "Image", None)
    ds_nat = nyu_mod.NYUv2(stage="train", data_base_dir=str(nyu_tree))
    s_nat = ds_nat.load_raw_sample(0)
    for k in ("img", "mask", "depth"):
        np.testing.assert_array_equal(
            np.asarray(s_pil[k], np.float32),
            np.asarray(s_nat[k], np.float32),
            err_msg=k,
        )


def test_extract_machinery_offline(tmp_path):
    """The download/extract helpers (reference nyuv2.py:199-345) minus the
    network: tgz unpack, rename-by-split, folder replace, and h5py .mat ->
    uint16 depth PNG extraction."""
    import os
    import tarfile

    import h5py
    from PIL import Image

    import vision_mtl_tpu.data.nyuv2 as nyu

    # tgz unpack + rename (reference rgb archives name files a_b_0001.png)
    src = tmp_path / "payload"
    src.mkdir()
    for i in (1, 2):
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(
            src / f"nyu_rgb_{i:04d}.png"
        )
    tgz = tmp_path / "nyu_train_rgb.tgz"
    with tarfile.open(tgz, "w:gz") as tar:
        tar.add(src, arcname=".")
    nyu._unpack(str(tgz))
    unpacked = tmp_path / "nyu_train_rgb"
    dst = tmp_path / "train_rgb"
    nyu._replace_folder(str(unpacked), str(dst))
    nyu._rename_files(str(dst), lambda x: x.split("_")[2])
    assert sorted(os.listdir(dst)) == ["0001.png", "0002.png"]

    # .mat depth extraction: train/test split by rgb ids, meters*1e4 uint16,
    # transposed (the .mat stores W,H)
    mat = tmp_path / "depths.mat"
    rng = np.random.default_rng(3)
    depths = rng.uniform(0, 6.5, size=(2, 6, 5)).astype(np.float32)  # (N,W,H)
    with h5py.File(mat, "w") as f:
        f.create_dataset("depths", data=depths)
    nyu._create_depth_files(str(mat), str(tmp_path), train_ids={"0001"})
    tr = np.array(Image.open(tmp_path / "train_depth" / "0001.png"))
    te = np.array(Image.open(tmp_path / "test_depth" / "0002.png"))
    assert tr.dtype == np.uint16 and tr.shape == (5, 6)
    np.testing.assert_array_equal(tr, (depths[0] * 1e4).astype(np.uint16).T)
    np.testing.assert_array_equal(te, (depths[1] * 1e4).astype(np.uint16).T)


def test_cache_concurrent_builders_serialize(nyu_tree):
    """Concurrent build_cache calls (every process of a pod launch under
    VMTL_BUILD_NYU_CACHE=1, or tuning threads) must serialize on the build
    lock — two live writers would truncate each other's .tmp memmaps and
    the torn arrays still pass the metadata-only validity probe. force=True
    makes every builder actually write, maximizing overlap without the
    lock."""
    import threading

    from vision_mtl_tpu.data.nyu_cache import build_cache

    spec = ResizeSpec(24, 24, antialias=True)
    errs = []

    def build():
        try:
            ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
            build_cache(ds, force=True)
        except BaseException as e:  # surfaced after join
            errs.append(e)

    threads = [threading.Thread(target=build) for _ in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    ds = NYUv2(stage="train", data_base_dir=nyu_tree, transforms=spec)
    batch = ds.load_batch(list(range(len(ds))))
    assert batch is not None
    for i in range(len(ds)):
        s = ds[i]
        np.testing.assert_array_equal(batch["img"][i], s["img"])
        np.testing.assert_array_equal(batch["mask"][i], s["mask"])
        np.testing.assert_array_equal(batch["depth"][i], s["depth"])
