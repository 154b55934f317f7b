"""NYUv2 MTL dataset (13-class labels + depth + optional surface normals).

Mirrors the reference loader (data_modules/nyuv2.py:21-357): PNG folders
``{stage}_{rgb,seg13,depth[,sn]}`` keyed by shared filenames; images /255;
masks carry the uint8-PNG auto-scaling un-scaling quirk (x255 when <=1 after
normalization — quirk #7); depth PNGs are uint16 meters*1e4 -> /1e4 then
/max_depth; everything resized 256x256 with antialiased bilinear (including
the label map — the reference applies the same torchvision transform to all
streams; reproduced, docs/QUIRKS.md).

The download/extract machinery reproduces the reference's 4 sources (RGB
tgz, seg13 tgz, surface-normal zip, depth .mat via h5py). This container has
no network egress — downloads raise a clear error unless the archives are
already on disk, in which case extraction proceeds.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import typing as t
import urllib.request
import zipfile

import numpy as np

try:
    from PIL import Image
except ImportError:  # native zlib PNG decoder covers the load path
    Image = None

from vision_mtl_tpu.cfg import nyuv2_data_cfg as data_cfg
from vision_mtl_tpu.data.base import UNSET, MTLDataset, Sample
from vision_mtl_tpu.data.transforms import resize_depth, resize_image, resize_mask


class NYUv2(MTLDataset):
    benchmark_idxs: t.List[int] = [647, 584, 169, 768]

    def __init__(
        self,
        stage: str = "train",
        data_base_dir: t.Optional[str] = None,
        download: bool = False,
        use_sn: bool = False,
        transforms: t.Any = UNSET,
        max_depth: t.Optional[float] = None,
    ):
        assert stage in ("train", "test"), "stage must be either train or test"
        # config fields resolve at call time (not import time) so edits to
        # the cfg singleton — e.g. a CLI-pointed data dir — take effect.
        # An explicit `transforms` (incl. None) applies to both stages
        # (reference single-transform constructor, nyuv2.py:44-57); the
        # default binds each stage to its own cfg field.
        if data_base_dir is None:
            data_base_dir = data_cfg.data_dir
        super().__init__(
            stage=stage,
            data_base_dir=data_base_dir,
            max_depth=max_depth if max_depth is not None else data_cfg.max_depth,
            train_transform=data_cfg.train_transform
            if transforms is UNSET
            else transforms,
            test_transform=data_cfg.test_transform
            if transforms is UNSET
            else transforms,
        )
        self.use_sn = use_sn

        if download:
            self.download()

        if not self._check_exists():
            raise RuntimeError(
                "Dataset not complete. You can use download=True to download it"
            )

        self.filenames = sorted(
            os.listdir(os.path.join(data_base_dir, f"{self.stage}_rgb"))
        )

        # preprocessed-cache fast path (data/nyu_cache.py): raw PNG decode is
        # ~60x slower than device compute; a valid cache serves prepared
        # batches at memcpy rate. None until first load_batch call.
        self._cache: t.Optional[t.Dict[str, np.ndarray]] = None
        self._cache_checked = False
        if os.environ.get("VMTL_BUILD_NYU_CACHE") == "1" and not use_sn:
            from vision_mtl_tpu.data.nyu_cache import build_cache

            build_cache(self)

    def __len__(self) -> int:
        return len(self.filenames)

    def load_batch(self, idxs: t.Sequence[int]) -> t.Optional[Sample]:
        """Batched load from the preprocessed memmap cache (byte-identical
        to the per-sample Python path by construction — nyu_cache.py); None
        when no valid cache exists (caller falls back to per-sample)."""
        if self.use_sn:
            return None  # normals aren't cached; per-sample path handles them
        if not self._cache_checked:
            from vision_mtl_tpu.data.nyu_cache import open_cache

            self._cache = open_cache(self)
            self._cache_checked = True
        if self._cache is None:
            return None
        order = np.asarray(idxs, np.int64)
        return {
            "img": np.asarray(self._cache["img"][order]),
            "mask": self._cache["mask"][order].astype(np.int32),
            "depth": np.asarray(self._cache["depth"][order]),
        }

    def _folder(self, name: str) -> str:
        return os.path.join(self.data_base_dir, f"{self.stage}_{name}")

    def load_raw_sample(self, idx: int) -> Sample:
        fn = self.filenames[idx]

        def read(folder: str) -> np.ndarray:
            path = os.path.join(self._folder(folder), fn)
            # PIL first: both PIL and the native decoder are zlib-inflate
            # bound and measured within ~10% of each other (480x640: rgb
            # 8.6 vs 11.4 ms, seg13 3.2 vs 3.1, depth16 6.0 vs 6.7 —
            # docs/BENCH_NOTES.md), so the native path is the no-PIL
            # fallback rather than the default
            if Image is not None:
                return np.array(Image.open(path))
            from vision_mtl_tpu.data import native

            if native.available():
                return native.read_png(path)
            raise RuntimeError("neither PIL nor the native PNG decoder is available")

        img = read("rgb")
        mask = read("seg13")
        depth = read("depth")
        sample: Sample = {"img": img, "mask": mask, "depth": depth}
        if self.use_sn:
            # same PIL-or-native fallback as the main streams (a bare
            # Image.open would crash PIL-less hosts that the native decoder
            # otherwise covers)
            sample["normals"] = read("sn")
        return sample

    def prepare_sample(self, raw_sample: Sample, transform: t.Any = None) -> Sample:
        img = raw_sample["img"].astype(np.float32)
        mask = raw_sample["mask"].astype(np.float32)
        depth = raw_sample["depth"].astype(np.float32)
        normals = raw_sample.get("normals")

        # torchvision ToTensor scales uint8 to [0,1]; reproduce then resize
        # with antialiased bilinear for all streams (reference nyuv2.py:109-114)
        if img.max() > 1.0:
            img = img / 255.0
        mask = mask / 255.0  # uint8 PNG auto-scaling (ToTensor)
        if transform is not None:
            img = resize_image(img, transform)
            mask = resize_mask(mask, transform, bilinear=True)
            depth = resize_depth(depth, transform, bilinear=True)
            if normals is not None:
                normals = resize_image(normals.astype(np.float32) / 255.0, transform)

        # un-scaling quirk (reference nyuv2.py:123-126)
        if mask.max() <= 1.0:
            mask = mask * 255.0
        mask = np.round(mask).astype(np.int32)

        depth = depth.astype(np.float32) / 1e4  # uint16 png: meters * 1e4
        depth = self.normalize_depth(depth)
        if depth.ndim == 2:
            depth = depth[..., None]

        sample: Sample = {
            "img": img.astype(np.float32),
            "mask": mask,
            "depth": depth,
        }
        if normals is not None:
            sample["normals"] = normals.astype(np.float32)
        return sample

    # ---------------- download machinery ----------------

    def _check_exists(self) -> bool:
        parts = ["rgb", "seg13", "depth"] + (["sn"] if self.use_sn else [])
        for split in ("train", "test"):
            for part in parts:
                if not os.path.exists(
                    os.path.join(self.data_base_dir, f"{split}_{part}")
                ):
                    return False
        return True

    def download(self) -> None:
        if self._check_exists():
            return
        os.makedirs(self.data_base_dir, exist_ok=True)
        download_rgb(self.data_base_dir)
        download_seg(self.data_base_dir)
        download_depth(self.data_base_dir)
        if self.use_sn:
            download_sn(self.data_base_dir)
        print("Done!")


def _fetch(url: str, root: str) -> str:
    """Download url into root (raises a clear error without network)."""
    dst = os.path.join(root, url.split("/")[-1].split("?")[0])
    if os.path.exists(dst):
        return dst
    try:
        urllib.request.urlretrieve(url, dst)
    except Exception as e:  # zero-egress container: actionable message
        raise RuntimeError(
            f"Could not download {url} (no network egress?). Place the "
            f"archive at {dst} manually and re-run."
        ) from e
    return dst


def _unpack(file: str) -> None:
    path = file.rsplit(".", 1)[0]
    if file.endswith(".tgz"):
        with tarfile.open(file, "r:gz") as tar:
            tar.extractall(path)
    elif file.endswith(".zip"):
        with zipfile.ZipFile(file, "r") as zf:
            zf.extractall(path)


def _rename_files(folder: str, rename_func: t.Callable[[str], str]) -> None:
    for old in os.listdir(folder):
        shutil.move(
            os.path.join(folder, old), os.path.join(folder, rename_func(old))
        )


def _replace_folder(src: str, dst: str) -> None:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.move(src, dst)


def download_rgb(root: str) -> None:
    train_url = "http://www.doc.ic.ac.uk/~ahanda/nyu_train_rgb.tgz"
    test_url = "http://www.doc.ic.ac.uk/~ahanda/nyu_test_rgb.tgz"

    def _proc(url: str, dst: str) -> None:
        if os.path.exists(dst):
            return
        tar = _fetch(url, root)
        _unpack(tar)
        _replace_folder(tar.rstrip(".tgz"), dst)
        _rename_files(dst, lambda x: x.split("_")[2])

    _proc(train_url, os.path.join(root, "train_rgb"))
    _proc(test_url, os.path.join(root, "test_rgb"))


def download_seg(root: str) -> None:
    base = "https://github.com/ankurhanda/nyuv2-meta-data/raw/master"
    train_url = f"{base}/train_labels_13/nyuv2_train_class13.tgz"
    test_url = f"{base}/test_labels_13/nyuv2_test_class13.tgz"

    def _proc(url: str, dst: str) -> None:
        if os.path.exists(dst):
            return
        tar = _fetch(url, root)
        _unpack(tar)
        _replace_folder(tar.rstrip(".tgz"), dst)
        _rename_files(dst, lambda x: x.split("_")[3])

    _proc(train_url, os.path.join(root, "train_seg13"))
    _proc(test_url, os.path.join(root, "test_seg13"))


def download_sn(root: str) -> None:
    url = "https://www.dropbox.com/s/dn5sxhlgml78l03/nyu_normals_gt.zip?dl=1"
    train_dst = os.path.join(root, "train_sn")
    test_dst = os.path.join(root, "test_sn")
    if os.path.exists(train_dst) and os.path.exists(test_dst):
        return
    tar = _fetch(url, root)
    _unpack(tar)
    if not os.path.exists(train_dst):
        _replace_folder(os.path.join(root, "nyu_normals_gt", "train"), train_dst)
        _rename_files(train_dst, lambda x: x[1:])
    if not os.path.exists(test_dst):
        _replace_folder(os.path.join(root, "nyu_normals_gt", "test"), test_dst)
        _rename_files(test_dst, lambda x: x[1:])
    shutil.rmtree(os.path.join(root, "nyu_normals_gt"), ignore_errors=True)


def download_depth(
    root: str,
    url: str = (
        "http://horatio.cs.nyu.edu/mit/silberman/nyu_depth_v2/"
        "nyu_depth_v2_labeled.mat"
    ),
) -> None:
    """Extract per-image uint16 depth PNGs (meters*1e4) from the official
    labelled-dataset .mat (reference nyuv2.py:270-345)."""
    train_dst = os.path.join(root, "train_depth")
    test_dst = os.path.join(root, "test_depth")
    if os.path.exists(train_dst) and os.path.exists(test_dst):
        return
    mat = _fetch(url, root)
    train_ids = {
        f.split(".")[0] for f in os.listdir(os.path.join(root, "train_rgb"))
    }
    _create_depth_files(mat, root, train_ids)


def _create_depth_files(mat_file: str, root: str, train_ids: t.Set[str]) -> None:
    import h5py

    os.makedirs(os.path.join(root, "train_depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "test_depth"), exist_ok=True)
    depths = h5py.File(mat_file, "r")["depths"]
    for i in range(len(depths)):
        img = (depths[i] * 1e4).astype(np.uint16).T
        id_ = str(i + 1).zfill(4)
        folder = "train" if id_ in train_ids else "test"
        Image.fromarray(img).save(
            os.path.join(root, f"{folder}_depth", id_ + ".png")
        )
