#!/usr/bin/env python
"""Export a run trained HERE back into the reference's torch checkpoint
format (``model_{e}.pt`` holding ``{"model": state_dict}`` — reference
utils/pipeline_utils.py:150-155), so weights trained on TPU drop into an
existing torch serving/eval stack unchanged.

Usage:
    python scripts/export_torch_ckpt.py <run_dir> [--epoch N] [--out PATH]

``run_dir`` is one of this framework's run directories (Orbax ``model_{e}``
artifacts + ``train_args.yaml``). The architecture comes from the run's own
train_args.yaml. Output defaults to ``<run_dir>/model_{e}.pt`` (``.npz``
written instead when torch is unavailable).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> str:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--epoch", type=int, default=None, help="default: latest")
    p.add_argument("--out", default=None, help="default: <run_dir>/model_{e}.pt")
    args = p.parse_args(argv)

    from vision_mtl_tpu.train.checkpoint import (
        _latest_epoch,
        load_args,
        load_ckpt_model,
    )
    from vision_mtl_tpu.utils.ckpt_import import save_reference_checkpoint

    args_path = os.path.join(args.run_dir, "train_args.yaml")
    if not os.path.exists(args_path):
        raise SystemExit(
            f"{args.run_dir} has no train_args.yaml — cannot determine the "
            "architecture to export (pass a run dir written by training.main)"
        )
    run_args = load_args(args_path)
    epoch = args.epoch if args.epoch is not None else _latest_epoch(args.run_dir, "model")
    variables = load_ckpt_model(args.run_dir, epoch)

    try:
        import torch  # noqa: F401

        ext = ".pt"
    except ImportError:
        ext = ".npz"
    out = args.out or os.path.join(args.run_dir, f"model_{epoch}{ext}")
    save_reference_checkpoint(out, run_args.model_name, variables)
    print(f"Exported {run_args.model_name} epoch {epoch} -> {out}")
    return out


if __name__ == "__main__":
    main()
