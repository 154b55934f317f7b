"""Fetch the imagenet-pretrained mobilenetv3_large_100 backbone weights.

The reference's "(P)" configs warm-start the encoder from timm imagenet
weights via smp (reference utils/pipeline_utils.py:85-98). This container
has no network egress, so the exact, parity-tested converter
(vision_mtl_tpu/utils/torch_port.py — tests/test_torch_port.py) ships
without a weights artifact. Run THIS script once on any egress-enabled
host; it downloads the timm checkpoint and saves the state_dict as the
``.npz`` archive the converter auto-discovers:

    python scripts/fetch_imagenet_weights.py
    # -> vision_mtl_tpu/weights/mobilenetv3_large_100.npz

Then ``--backbone_weights imagenet`` works everywhere (copy the npz to
offline hosts). Sources tried in order:
  1. ``--from_file <path>`` — a LOCAL timm checkpoint you already have
     (``.pth``/``.bin`` torch state_dict or an ``.npz``); no network or
     timm needed. The supported route for "(P)" parity on offline hosts:
     download ``mobilenetv3_large_100_ra-f55367f5.pth`` anywhere, drop the
     file, run this (docs/MIGRATION.md).
  2. timm (``timm.create_model('mobilenetv3_large_100', pretrained=True)``)
  3. torch.hub direct URL of the same checkpoint (no timm needed)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# timm's registered checkpoint for mobilenetv3_large_100 (same artifact smp
# pulls in the reference)
HUB_URL = (
    "https://github.com/huggingface/pytorch-image-models/releases/download/"
    "v0.1-weights/mobilenetv3_large_100_ra-f55367f5.pth"
)


def _state_dict_via_timm():
    import timm

    model = timm.create_model("mobilenetv3_large_100", pretrained=True)
    return model.state_dict()


def _state_dict_via_hub():
    import torch

    return torch.hub.load_state_dict_from_url(HUB_URL, map_location="cpu")


def main() -> None:
    from vision_mtl_tpu.utils.torch_port import DEFAULT_WEIGHTS, WEIGHTS_DIR

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=DEFAULT_WEIGHTS)
    p.add_argument("--force", action="store_true")
    p.add_argument(
        "--from_file",
        default=None,
        help="local timm mobilenetv3_large_100 checkpoint (.pth/.bin torch "
        "state_dict or .npz) — converts without network or timm installed",
    )
    args = p.parse_args()

    if os.path.exists(args.out) and not args.force:
        print(f"{args.out} already exists (use --force to refetch)")
        return

    sd = None
    errors = []
    if args.from_file:
        from vision_mtl_tpu.utils.torch_port import load_state_dict_file

        sd = load_state_dict_file(args.from_file)
        print(f"loaded local state_dict {args.from_file} ({len(sd)} tensors)")
    else:
        for name, fn in (("timm", _state_dict_via_timm), ("torch.hub", _state_dict_via_hub)):
            try:
                sd = fn()
                print(f"fetched state_dict via {name} ({len(sd)} tensors)")
                break
            except Exception as e:
                errors.append(f"{name}: {type(e).__name__}: {e}")
    if sd is None:
        raise SystemExit(
            "Could not fetch weights (no network egress?):\n  "
            + "\n  ".join(errors)
            + f"\nEither pass --from_file <local checkpoint> or place a "
            f"mobilenetv3_large_100 state_dict at {args.out} (or .pth) "
            f"manually."
        )

    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    os.makedirs(os.path.dirname(out) or WEIGHTS_DIR, exist_ok=True)
    arrays = {
        k: np.asarray(v if isinstance(v, np.ndarray) else v.detach().cpu().numpy())
        for k, v in sd.items()
    }
    np.savez(out, **arrays)
    print(f"saved {len(arrays)} arrays -> {out}")

    # smoke the converter against the fresh artifact
    from vision_mtl_tpu.utils.torch_port import (
        _strip_prefix,
        convert_encoder_state_dict,
        load_state_dict_file,
    )

    params, stats = convert_encoder_state_dict(
        _strip_prefix(load_state_dict_file(out))
    )
    n = sum(int(np.asarray(x).size) for x in _leaves(params))
    print(f"converter smoke ok: {n:,} encoder params ported")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
