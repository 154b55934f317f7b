"""Debug helpers (reference utils/utils.py:61-67)."""

from __future__ import annotations

import typing as t

import numpy as np


def print_sample_stats(sample: t.Dict[str, t.Any]) -> None:
    """Print shape/range/median/dtype per sample key
    (reference print_sample_stats)."""
    for k in sample:
        arr = np.asarray(sample[k])
        print(k)
        print(f"{arr.shape=}")
        print(f"{arr.min()=} {arr.max()=}")
        print(f" {np.median(arr)=} {arr.dtype=}")
        print("-" * 10)
