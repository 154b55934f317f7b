"""Datamodule: dataset construction, splits, benchmark batch, loaders.

Mirrors the reference MTLDataModule (lit_datamodule.py:15-127): 0.8/0.2 train
split, ``do_overfit`` (train=val=test=predict=first batch), benchmark batch
with graceful failure, holdout split as test/predict ("val" stage for
cityscapes, "test" for nyuv2). Deliberate fix (quirk #8): the split is a
SEEDED permutation (cfg.seed, default 11) — the reference's random_split is
unseeded despite defining seed=11.
"""

from __future__ import annotations

import typing as t

import numpy as np

from vision_mtl_tpu.cfg import cfg
from vision_mtl_tpu.data.base import MTLDataset, Subset
from vision_mtl_tpu.data.loader import DataLoader


def _make_dataset(dataset_name: str, stage: str, transforms: t.Any) -> MTLDataset:
    if dataset_name == "cityscapes":
        from vision_mtl_tpu.data.cityscapes import CityscapesDataset

        return CityscapesDataset(stage=stage, transforms=transforms)
    if dataset_name == "nyuv2":
        from vision_mtl_tpu.data.nyuv2 import NYUv2

        return NYUv2(stage=stage, transforms=transforms)
    if dataset_name == "synthetic":
        from vision_mtl_tpu.data.synthetic import SyntheticMTLDataset

        return SyntheticMTLDataset(stage=stage, transforms=transforms)
    raise ValueError(f"Unknown dataset name {dataset_name}")


def configure_host_sharded_loading(datamodule: t.Any, mesh: t.Any) -> None:
    """Pick the multi-process loader mode for ``mesh``: row-sliced
    host-sharded decoding when processes span only the data axis (each host
    decodes 1/process_count of every batch), full-batch decoding otherwise
    (spatial/model process-spanning shards are not row ranges — see
    parallel/multihost.global_batch_from_local). Call before creating
    loaders; no-op single-process or without a mesh."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return
    from vision_mtl_tpu.parallel.mesh import process_spanning_axes

    if set(process_spanning_axes(mesh)) - {"data"}:
        datamodule.shard_rows = False


class MTLDataModule:
    def __init__(
        self,
        dataset_name: str,
        train_transform: t.Any = None,
        test_transform: t.Any = None,
        train_size: float = cfg.data.train_size,
        batch_size: int = cfg.data.batch_size,
        num_workers: int = cfg.data.num_workers,
        shuffle_train: bool = cfg.data.shuffle_train,
        do_overfit: bool = False,
        seed: int = cfg.seed,
        wire_format: t.Optional[str] = None,
    ):
        if wire_format is None:
            from vision_mtl_tpu.cfg import fetch_data_cfg

            wire_format = fetch_data_cfg(dataset_name).wire_format
        self.wire_format = wire_format
        self.dataset_name = dataset_name
        self.train_transform = train_transform
        self.test_transform = test_transform
        self.train_size = train_size
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle_train = shuffle_train
        self.do_overfit = do_overfit
        self.seed = seed
        # multi-process loader mode — see DataLoader.shard_rows; flipped to
        # False by configure_host_sharded_loading for meshes whose
        # process-spanning axes are not just 'data'
        self.shard_rows = True

        self.data_train: t.Any = None
        self.data_val: t.Any = None
        self.data_test: t.Any = None
        self.data_predict: t.Any = None
        self.benchmark_batch: t.Optional[t.Dict[str, np.ndarray]] = None

    def setup(self, stage: t.Optional[str] = None) -> None:
        data_train = _make_dataset(
            self.dataset_name, "train", self.train_transform
        )
        try:
            self.benchmark_batch = data_train.load_benchmark_batch()
        except Exception as e:
            print("Failed to load benchmark batch: ", e)
            self.benchmark_batch = None

        if stage in ("fit", None) or (self.do_overfit and self.data_train is None):
            if self.do_overfit:
                overfit = Subset(data_train, range(self.batch_size))
                self.data_train = self.data_val = overfit
            else:
                n = len(data_train)
                train_len = int(n * self.train_size)
                order = np.random.default_rng(self.seed).permutation(n)
                self.data_train = Subset(data_train, order[:train_len])
                # val runs the TEST transform: a second dataset instance
                # over the same seeded indices. (The reference tries the
                # same and silently fails — it sets .transforms on the
                # Subset, not the dataset, lit_datamodule.py:67-74; quirk
                # #5 fixes it for real. Equal transforms make it a no-op.)
                data_eval = _make_dataset(
                    self.dataset_name, "train", self.test_transform
                )
                self.data_val = Subset(data_eval, order[train_len:])

        val_stage_name = "val" if self.dataset_name == "cityscapes" else "test"
        if stage in ("test", None):
            self.data_test = (
                self.data_train
                if self.do_overfit
                else _make_dataset(
                    self.dataset_name, val_stage_name, self.test_transform
                )
            )
        if stage in ("predict", None):
            self.data_predict = (
                self.data_train
                if self.do_overfit
                else _make_dataset(
                    self.dataset_name, val_stage_name, self.test_transform
                )
            )

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self.data_train,
            batch_size=self.batch_size,
            shuffle=self.shuffle_train,
            seed=self.seed,
            drop_last=True,
            num_workers=self.num_workers,
            wire_format=self.wire_format,
            shard_rows=self.shard_rows,
        )

    def _eval_loader(self, dataset: t.Any) -> DataLoader:
        return DataLoader(
            dataset,
            batch_size=self.batch_size,
            shuffle=False,
            drop_last=False,
            pad_last=True,
            num_workers=self.num_workers,
            wire_format=self.wire_format,
            shard_rows=self.shard_rows,
        )

    def val_dataloader(self) -> DataLoader:
        return self._eval_loader(self.data_val)

    def test_dataloader(self) -> DataLoader:
        return self._eval_loader(self.data_test)

    def predict_dataloader(self) -> DataLoader:
        return self._eval_loader(self.data_predict)
