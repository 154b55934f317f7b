"""Dataset smoke + sample visualization — replaces the reference's
``cityscapes_sample.ipynb`` / ``nyuv2_sample.ipynb`` notebooks.

Usage: python examples/dataset_samples.py --dataset_name synthetic \
           [--out samples.png] [--n 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--dataset_name",
        default="synthetic",
        choices=["cityscapes", "nyuv2", "synthetic"],
    )
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default="samples.png")
    args = p.parse_args()

    from vision_mtl_tpu.cfg import fetch_data_cfg
    from vision_mtl_tpu.data.datamodule import _make_dataset
    from vision_mtl_tpu.vis import plot_sample

    data_cfg = fetch_data_cfg(args.dataset_name)
    ds = _make_dataset(args.dataset_name, "train", data_cfg.train_transform)
    print(f"{args.dataset_name}: {len(ds)} train samples")
    s = ds[0]
    for k, v in s.items():
        print(f"  {k}: shape={v.shape} dtype={v.dtype} "
              f"min={v.min():.3f} max={v.max():.3f}")

    import matplotlib.pyplot as plt

    for i in range(min(args.n, len(ds))):
        fig = plot_sample(**ds[i])
        out = args.out.replace(".png", f"_{i}.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
