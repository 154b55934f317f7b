"""Pipeline configuration.

Dataclass equivalents of the reference's class-attribute config singletons
(reference: vision_mtl/cfg.py:21-210), with the same field names and defaults
so that CLI/config surfaces match. Differences (deliberate, documented in
docs/QUIRKS.md):

  * transforms are declarative ``ResizeSpec`` records executed by the input
    pipeline (host decode -> resize -> normalize) instead of albumentations /
    torchvision Compose objects;
  * the RNG seed (11, reference cfg.py:194) is actually applied — the
    reference defines it but never uses it (quirk #8);
  * ``device`` defaults to "tpu" rather than "cuda".

Secrets still come from an optional ``.env`` file (comet credentials), and
tracking auto-disables when they are absent (reference cfg.py:30-34).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import typing as t
from pathlib import Path

import numpy as np

root_dir = Path(__file__).parent
repo_root = root_dir.parent


def _load_dotenv(path: Path) -> None:
    """Tiny .env loader (sensitive data is never committed; reference uses
    python-dotenv, cfg.py:17-18)."""
    if not path.exists():
        return
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        v = v.strip()
        # python-dotenv (the reference's loader) strips matching quotes —
        # KEY="value" must yield value, not "value"
        if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
            v = v[1:-1]
        os.environ.setdefault(k.strip(), v)


_load_dotenv(root_dir / ".env")


@dataclasses.dataclass
class ResizeSpec:
    """Declarative resize transform: images bilinear, masks nearest.

    Replaces A.Resize / torchvision Resize (reference cfg.py:103-114,144-155).
    ``antialias`` mirrors torchvision's antialiased bilinear used for NYUv2.
    """

    height: int
    width: int
    antialias: bool = False


@dataclasses.dataclass
class ModelConfig:
    encoder_name: str = "mobilenetv3_large_100"
    encoder_weights: t.Optional[str] = "imagenet"


@dataclasses.dataclass
class BasicModelConfig(ModelConfig):
    encoder_name: str = "mobilenetv3_large_100"


@dataclasses.dataclass
class LoggerConfig:
    api_key: t.Optional[str] = dataclasses.field(
        default_factory=lambda: os.environ.get("comet_api_key")
    )
    username: t.Optional[str] = dataclasses.field(
        default_factory=lambda: os.environ.get("comet_username")
    )
    project_name: str = "vision-mtl"
    disabled: bool = dataclasses.field(init=False)

    def __post_init__(self) -> None:
        self.disabled = self.api_key is None or self.username is None


@dataclasses.dataclass
class DataConfig:
    dataset_name: str = ""

    data_dir: str = str(root_dir / "data")
    batch_size: int = 4
    num_workers: int = 0
    pin_memory: bool = True
    drop_last: bool = True
    shuffle_train: bool = True
    train_size: float = 0.8

    height: int = 0
    width: int = 0

    # segmentation
    num_classes: int = 0
    class_names: t.List[str] = dataclasses.field(default_factory=list)

    # depth estimation
    max_depth: float = 1.0

    # transforms (declarative; executed by the data pipeline)
    train_transform: t.Optional[ResizeSpec] = None
    test_transform: t.Optional[ResizeSpec] = None

    # host->device wire format: "f32" (exact) or "compact" (uint8 images /
    # uint16 depth, decoded on device — 4x fewer H2D bytes; see
    # data/loader.compress_batch for the quantization bounds)
    wire_format: str = "f32"


def _cityscapes_class_names() -> t.List[str]:
    # reference cfg.py:72-93 — 19 classes + trailing "artifact" entry that
    # shares id 18 with "bicycle"'s successor (ignore fold-in, quirk #3).
    return [
        "road", "sidewalk", "building", "wall", "fence", "pole",
        "traffic light", "traffic sign", "vegetation", "terrain", "sky",
        "person", "rider", "car", "truck", "bus", "train", "motorcycle",
        "bicycle", "artifact",
    ]


@dataclasses.dataclass
class CityscapesConfig(DataConfig):
    dataset_name: str = "cityscapes"
    data_dir: str = str(root_dir / "data" / "cityscapes")
    benchmark_batch_path: str = str(root_dir / "data" / "cityscapes" / "benchmark_batch.npz")

    height: int = 128
    width: int = 256

    num_classes: int = 19
    class_names: t.List[str] = dataclasses.field(default_factory=_cityscapes_class_names)

    max_depth: float = 1.0

    batch_size: int = 8
    num_workers: int = 4
    wire_format: str = "compact"

    norm_mean: t.Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: t.Tuple[float, float, float] = (0.229, 0.224, 0.225)

    train_transform: ResizeSpec = dataclasses.field(
        default_factory=lambda: ResizeSpec(128, 256)
    )
    test_transform: ResizeSpec = dataclasses.field(
        default_factory=lambda: ResizeSpec(128, 256)
    )


def _nyuv2_class_names() -> t.List[str]:
    return [
        "background", "bed", "books", "ceiling", "chair", "floor",
        "furniture", "objects", "painting", "sofa", "table", "tv",
        "wall", "window",
    ]


@dataclasses.dataclass
class NYUv2Config(DataConfig):
    dataset_name: str = "nyuv2"
    data_dir: str = str(root_dir / "data" / "nyuv2")

    # native size; the transform resizes to 256x256 (reference cfg.py:144-155)
    height: int = 480
    width: int = 640

    num_classes: int = 13 + 1
    class_names: t.List[str] = dataclasses.field(default_factory=_nyuv2_class_names)

    max_depth: float = 10.0

    train_transform: ResizeSpec = dataclasses.field(
        default_factory=lambda: ResizeSpec(256, 256, antialias=True)
    )
    test_transform: ResizeSpec = dataclasses.field(
        default_factory=lambda: ResizeSpec(256, 256, antialias=True)
    )


@dataclasses.dataclass
class VisConfig:
    # reference cfg.py:158-182 — 20-color RGB palette for mask overlays
    rgb_palette: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array(
            [
                [63, 171, 212], [109, 137, 117], [24, 83, 42], [148, 77, 185],
                [122, 139, 58], [32, 126, 85], [17, 164, 215], [124, 39, 146],
                [161, 239, 20], [40, 81, 119], [149, 34, 38], [166, 224, 205],
                [134, 100, 230], [123, 157, 137], [11, 5, 225], [60, 84, 80],
                [173, 186, 12], [199, 91, 22], [170, 124, 184], [119, 102, 69],
            ]
        )
    )


@dataclasses.dataclass
class PipelineConfig:
    model: ModelConfig = dataclasses.field(default_factory=BasicModelConfig)
    logger: LoggerConfig = dataclasses.field(default_factory=LoggerConfig)
    vis: VisConfig = dataclasses.field(default_factory=VisConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    device: str = "tpu"

    debug: bool = False
    seed: int = 11

    # precision policy: params/stats f32, matmul/conv compute bf16
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    # run-dir root; VMTL_LOG_ROOT redirects it (tests, shared-filesystem
    # pods where every process must resolve the same absolute root)
    log_root_dir: Path = dataclasses.field(
        default_factory=lambda: Path(
            os.environ.get("VMTL_LOG_ROOT", str(root_dir / "lightning_logs"))
        )
    )

    def update_fields_with_args(self, args: argparse.Namespace) -> None:
        """Update config fields from parsed CLI args (reference cfg.py:198-204)."""
        for k, v in vars(args).items():
            if k in ("model", "logger", "vis", "data"):
                continue
            if hasattr(self, k):
                setattr(self, k, v)


cityscapes_data_cfg = CityscapesConfig()
nyuv2_data_cfg = NYUv2Config()

cfg = PipelineConfig()


def fetch_data_cfg(dataset_name: str) -> DataConfig:
    """Resolve a dataset name to its config singleton
    (reference utils/pipeline_utils.py:288-294)."""
    if dataset_name == "cityscapes":
        return cityscapes_data_cfg
    if dataset_name == "nyuv2":
        return nyuv2_data_cfg
    if dataset_name == "synthetic":
        from vision_mtl_tpu.data.synthetic import synthetic_data_cfg

        return synthetic_data_cfg
    raise ValueError(f"Unknown dataset name {dataset_name}")
