"""Cityscapes MTL dataset (pre-processed Kaggle .npy triples).

Mirrors the reference loader (data_modules/cityscapes.py:11-104):
``{data_dir}/{stage}/{image,label,depth}/*.npy`` with images already in
[0,1], labels with ignore id -1 folded into ``num_classes-1`` (quirk #3,
reproduced), inverse depth in [0,1]. Resize: bilinear for images, nearest for
mask/depth (albumentations semantics).
"""

from __future__ import annotations

import glob
import typing as t

import numpy as np

from vision_mtl_tpu.cfg import cityscapes_data_cfg as data_cfg
from vision_mtl_tpu.data.base import UNSET, MTLDataset, Sample
from vision_mtl_tpu.data.transforms import resize_depth, resize_image, resize_mask


class CityscapesDataset(MTLDataset):
    benchmark_idxs: t.List[int] = [955, 2279, 1878, 2325]

    def __init__(
        self,
        stage: str,
        data_base_dir: t.Optional[str] = None,
        transforms: t.Any = UNSET,
        max_depth: t.Optional[float] = None,
    ):
        # config fields resolve at call time (not import time) so edits to
        # the cfg singleton — e.g. a CLI-pointed data dir — take effect.
        # An explicit `transforms` (incl. None) applies to both stages,
        # matching the reference's single-transform constructor
        # (cityscapes.py:14-28); the default binds each stage to its own
        # cfg field.
        super().__init__(
            stage=stage,
            data_base_dir=data_base_dir
            if data_base_dir is not None
            else data_cfg.data_dir,
            max_depth=max_depth if max_depth is not None else data_cfg.max_depth,
            train_transform=data_cfg.train_transform
            if transforms is UNSET
            else transforms,
            test_transform=data_cfg.test_transform
            if transforms is UNSET
            else transforms,
        )
        self.paths = self.parse_paths()

    def __len__(self) -> int:
        return len(self.paths["img"])

    def parse_paths(self) -> t.Dict[str, t.List[str]]:
        base_dir = f"{self.data_base_dir}/{self.stage}"
        dir_name_to_key = {"image": "img", "label": "mask", "depth": "depth"}
        dict_paths: t.Dict[str, t.List[str]] = {
            v: sorted(glob.glob(f"{base_dir}/{k}/*.npy"))
            for k, v in dir_name_to_key.items()
        }
        if not dict_paths["img"]:
            raise FileNotFoundError(
                f"No cityscapes npy files under {base_dir}/image — expected "
                f"the preprocessed Kaggle layout "
                f"{{data_dir}}/{{stage}}/{{image,label,depth}}/*.npy "
                f"(see README 'Data layout')."
            )
        assert (
            len(dict_paths["img"])
            == len(dict_paths["mask"])
            == len(dict_paths["depth"])
        ), {k: len(v) for k, v in dict_paths.items()}
        return dict_paths

    def load_batch(self, idxs: t.Sequence[int]) -> t.Optional[Sample]:
        """Native C++ batched decode+resize+collate (data/native.py); None
        when the library isn't built (caller falls back to per-sample
        Python). Resize is identity for on-disk 128x256 data, so results are
        bit-exact vs the Python path there."""
        from vision_mtl_tpu.data import native

        if not native.available():
            return None
        spec = self.transform
        oh = spec.height if spec else data_cfg.height
        ow = spec.width if spec else data_cfg.width
        return native.load_cityscapes_batch(
            [self.paths["img"][i] for i in idxs],
            [self.paths["mask"][i] for i in idxs],
            [self.paths["depth"][i] for i in idxs],
            oh,
            ow,
            ignore_value=-1,
            remap_to=data_cfg.num_classes - 1,
            depth_div=1.0,
        )

    def load_raw_sample(self, idx: int) -> Sample:
        img = np.load(self.paths["img"][idx])
        assert img.max() <= 1.0
        mask = np.load(self.paths["mask"][idx])
        depth = np.load(self.paths["depth"][idx])
        return {"img": img, "mask": mask, "depth": depth}

    def prepare_sample(self, raw_sample: Sample, transform: t.Any = None) -> Sample:
        img = raw_sample["img"]
        mask = raw_sample["mask"].copy()
        depth = raw_sample["depth"]

        # ignore label fold-in (reference cityscapes.py:42)
        mask[mask == -1] = data_cfg.num_classes - 1

        if transform is not None:
            img = resize_image(img, transform)
            mask = resize_mask(mask, transform)
            depth = resize_depth(depth, transform)

        img = img.astype(np.float32)
        mask = mask.astype(np.int32)
        depth = depth.astype(np.float32)
        depth = self.normalize_depth(depth)
        if depth.ndim == 2:
            depth = depth[..., None]
        return {"img": img, "mask": mask, "depth": depth}
