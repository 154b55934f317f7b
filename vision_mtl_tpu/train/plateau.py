"""Host-side ReduceLROnPlateau with torch semantics.

The reference steps torch's scheduler on the SUMMED validation loss with
patience=2, factor=0.9 (training_lit.py:53-55, :168 — quirk #4; the
patience=5/factor=0.95 variant in configure_optimizers is dead code under the
manual loop). LR lives in the optimizer state (see state.set_lr), so this is
pure host logic between epochs — nothing recompiles.
"""

from __future__ import annotations

import dataclasses
import typing as t


@dataclasses.dataclass
class ReduceLROnPlateau:
    patience: int = 2
    factor: float = 0.9
    threshold: float = 1e-4  # torch default, relative mode
    min_lr: float = 0.0

    best: float = float("inf")
    num_bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the monitored value; returns the (possibly reduced) lr."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return lr

    def state_dict(self) -> t.Dict[str, t.Any]:
        return {
            "patience": self.patience,
            "factor": self.factor,
            "threshold": self.threshold,
            "min_lr": self.min_lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d: t.Dict[str, t.Any]) -> None:
        for k, v in d.items():
            setattr(self, k, v)
