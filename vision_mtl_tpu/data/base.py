"""Dataset base: host-side decode producing NHWC numpy samples.

Sample contract (consumed by the jitted steps):
  img:   (H, W, 3) float32
  mask:  (H, W)    int32
  depth: (H, W, 1) float32  — trailing channel dim is load-bearing: the
         reference's SILog only works with (B,H,W,1) targets (docs/QUIRKS.md)

Mirrors the reference MTLDataset (data_modules/common_ds.py:7-50):
stage-keyed transform choice, a standing 4-sample benchmark batch, and
max>1-gated depth normalization.
"""

from __future__ import annotations

import typing as t

import numpy as np

Sample = t.Dict[str, np.ndarray]

# sentinel for "use the config default, resolved at call time" — lets an
# explicit None mean "no transform" while cfg-singleton edits (e.g. the
# CLI's --data_dir / transform overrides) still take effect (shared by the
# dataset constructors)
UNSET: t.Any = object()


class MTLDataset:
    benchmark_idxs: t.Optional[t.List[int]] = None

    def __init__(
        self,
        stage: str,
        data_base_dir: str,
        max_depth: float,
        train_transform: t.Any = None,
        test_transform: t.Any = None,
    ):
        self.data_base_dir = data_base_dir
        self.train_transform = train_transform
        self.test_transform = test_transform
        self.stage = stage
        self.max_depth = max_depth
        self.transform = train_transform if stage == "train" else test_transform

    def __len__(self) -> int:
        raise NotImplementedError

    def load_raw_sample(self, idx: int) -> Sample:
        raise NotImplementedError

    def prepare_sample(self, raw_sample: Sample, transform: t.Any = None) -> Sample:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Sample:
        return self.prepare_sample(self.load_raw_sample(idx), self.transform)

    def load_benchmark_batch(self) -> t.Optional[Sample]:
        """Stack the fixed benchmark samples into a standing eval batch
        (reference common_ds.py:31-45)."""
        if self.benchmark_idxs is None:
            return None
        batch: t.Dict[str, t.List[np.ndarray]] = {"img": [], "mask": [], "depth": []}
        for idx in self.benchmark_idxs:
            sample = self.prepare_sample(
                self.load_raw_sample(idx), self.test_transform
            )
            for k in batch:
                batch[k].append(sample[k])
        return {k: np.stack(v, axis=0) for k, v in batch.items()}

    def normalize_depth(self, depth: np.ndarray) -> np.ndarray:
        """Divide by max_depth iff values exceed 1 (reference
        common_ds.py:47-50)."""
        if depth.max() > 1.0:
            depth = depth / self.max_depth
        return depth


class Subset:
    """Index-restricted view of a dataset (torch.utils.data.Subset analog)."""

    def __init__(self, dataset: MTLDataset, indices: t.Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> Sample:
        return self.dataset[self.indices[idx]]

    def load_batch(self, idxs: t.Sequence[int]) -> t.Optional[Sample]:
        """Delegate native batched loading with translated indices."""
        inner = getattr(self.dataset, "load_batch", None)
        if inner is None:
            return None
        return inner([self.indices[i] for i in idxs])
