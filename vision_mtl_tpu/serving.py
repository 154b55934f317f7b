"""Serving: ahead-of-time-compiled inference with a stable artifact format.

The reference has no serving story (its inference is the predict loop). For
production deployment this module provides:

  * ``Predictor`` — an AOT-compiled fixed-shape inference callable (no trace
    on first request), with automatic padding of ragged final batches;
  * ``export_model`` / ``load_exported`` — portable serialized StableHLO
    artifacts via ``jax.export`` (runnable on any machine with compatible
    runtime, no Python model code needed);
  * ``latency_bench`` — p50/p95/p99 request latency measurement (synced via
    output fetch — see docs/BENCH_NOTES.md on why block_until_ready is not
    enough on relay-attached TPUs).
"""

from __future__ import annotations

import time
import typing as t

import jax
import jax.numpy as jnp
import numpy as np

from vision_mtl_tpu.train.state import TrainState
from vision_mtl_tpu.train.step import postprocess_raw_out


def _predict_fn(model: t.Any):
    def fn(params, batch_stats, img):
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        post = postprocess_raw_out(out)
        return {
            "segm": post["segm_predictions"],
            "depth": post["depth_predictions"],
        }

    return fn


class Predictor:
    """Fixed-shape AOT-compiled predictor.

    With a ``mesh``, the compiled program shards the request batch over the
    mesh's data (and spatial) axes and replicates the weights — multi-chip
    batch-parallel serving through the same call surface (GSPMD inserts the
    conv halo exchanges; outputs come back replicated for host fetch).
    """

    def __init__(
        self,
        model: t.Any,
        state: TrainState,
        batch_size: int,
        height: int,
        width: int,
        channels: int = 3,
        dtype: t.Any = jnp.float32,
        mesh: t.Any = None,
    ):
        self.batch_size = batch_size
        self.shape = (batch_size, height, width, channels)
        self._params = state.params
        self._stats = state.batch_stats
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vision_mtl_tpu.parallel.mesh import batch_sharding

            rep = NamedSharding(mesh, P())
            img_sharding = jax.tree.leaves(
                batch_sharding(
                    mesh, {"img": jax.ShapeDtypeStruct(self.shape, dtype)}
                )
            )[0]
            self._params = jax.device_put(self._params, rep)
            self._stats = jax.device_put(self._stats, rep)
            fn = jax.jit(
                _predict_fn(model),
                in_shardings=(rep, rep, img_sharding),
                out_shardings=rep,
            )
        else:
            fn = jax.jit(_predict_fn(model))
        sample = jax.ShapeDtypeStruct(self.shape, dtype)
        p_shape = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._params
        )
        s_shape = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._stats
        )
        self._compiled = fn.lower(p_shape, s_shape, sample).compile()

    def __call__(self, imgs: np.ndarray) -> t.Dict[str, np.ndarray]:
        n = imgs.shape[0]
        if n > self.batch_size:
            raise ValueError(
                f"batch {n} exceeds compiled batch size {self.batch_size}"
            )
        if n == 0:
            raise ValueError(
                "empty request: need at least one image to pad from"
            )
        if n < self.batch_size:
            pad = np.repeat(imgs[-1:], self.batch_size - n, axis=0)
            imgs = np.concatenate([imgs, pad], axis=0)
        out = self._compiled(self._params, self._stats, jnp.asarray(imgs))
        host = jax.device_get(out)
        return {k: v[:n] for k, v in host.items()}


def export_model(
    model: t.Any,
    state: TrainState,
    batch_size: int,
    height: int,
    width: int,
    path: str,
    dtype: t.Any = jnp.float32,
) -> None:
    """Serialize the inference function (weights baked in) as a portable
    jax.export artifact."""
    from jax import export as jax_export

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)

    base = _predict_fn(model)

    def fn(img):
        return base(params, stats, img)

    exported = jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, height, width, 3), dtype)
    )
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> t.Callable[[np.ndarray], t.Dict[str, np.ndarray]]:
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def fn(imgs: np.ndarray) -> t.Dict[str, np.ndarray]:
        return jax.device_get(exported.call(jnp.asarray(imgs)))

    return fn


def latency_bench(
    predictor: t.Callable[[np.ndarray], t.Any],
    imgs: np.ndarray,
    n: int = 50,
    warmup: int = 3,
) -> t.Dict[str, float]:
    for _ in range(warmup):
        predictor(imgs)
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = predictor(imgs)
        # device_get inside predictor forces completion
        del out
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat.sort()
    return {
        "p50_ms": lat[len(lat) // 2],
        "p95_ms": lat[int(len(lat) * 0.95)],
        "p99_ms": lat[min(int(len(lat) * 0.99), len(lat) - 1)],
        "mean_ms": sum(lat) / len(lat),
    }
