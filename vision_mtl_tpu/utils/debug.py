"""Debug helpers (reference utils/utils.py:52-67)."""

from __future__ import annotations

import typing as t

import numpy as np


def get_module_by_name(tree: t.Any, access_string: str) -> t.Any:
    """Fetch a nested entry from a params/variables pytree by dotted path,
    e.g. ``get_module_by_name(params, "encoder.block_0.conv.kernel")``.

    The JAX re-interpretation of the reference's ``get_module_by_name``
    (utils/utils.py:52-58), which walked ``nn.Module`` attributes: Flax
    state is a pytree of dicts, so the lookup walks mapping keys (falling
    back to attributes for dataclass-like nodes). Raises ``KeyError`` with
    the failing path segment — unlike ``reduce(getattr, ...)``, which
    surfaces an unhelpful AttributeError mid-chain."""
    node = tree
    seen: t.List[str] = []
    for name in access_string.split("."):
        seen.append(name)
        if isinstance(node, t.Mapping):
            if name not in node:
                raise KeyError(
                    f"{'.'.join(seen)!r} not in tree (available: "
                    f"{sorted(node)[:10]})"
                )
            node = node[name]
        elif hasattr(node, name):
            node = getattr(node, name)
        else:
            raise KeyError(
                f"{'.'.join(seen)!r}: node of type {type(node).__name__} "
                f"has no key/attribute {name!r}"
            )
    return node


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
