"""Serving: ahead-of-time-compiled inference with a stable artifact format.

The reference has no serving story (its inference is the predict loop). For
production deployment this module provides:

  * ``Predictor`` — an AOT-compiled fixed-shape inference callable (no trace
    on first request), with automatic padding of ragged final batches;
  * ``BatchingServer`` — a dynamic micro-batching front end: concurrent
    single-image requests are coalesced into statically-shaped batches
    (bucketed AOT programs — the TPU answer to dynamic request load) and
    demultiplexed back to per-request futures;
  * ``export_model`` / ``load_exported`` — portable serialized StableHLO
    artifacts via ``jax.export`` (runnable on any machine with compatible
    runtime, no Python model code needed);
  * ``latency_bench`` — p50/p95/p99 request latency measurement (synced via
    output fetch — see docs/BENCH_NOTES.md on why block_until_ready is not
    enough on relay-attached TPUs).
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
import time
import typing as t

import jax
import jax.numpy as jnp
import numpy as np

from vision_mtl_tpu.train.state import TrainState
from vision_mtl_tpu.train.step import postprocess_raw_out


def _predict_fn(model: t.Any, compact_out: bool = False):
    """``compact_out`` shrinks the response wire format: segm argmax as
    uint8 (lossless — every supported head has <=255 classes) and depth as
    float16 (~3 decimal digits; depth lives in [0,1] after the sigmoid).
    Cuts the per-image D2H payload ~2.7x (256KB -> 96KB at 128x256; the
    full request wire shrinks 655KB -> 197KB with uint8 input), which is
    the binding bound for relay-attached serving (BENCH_NOTES r5)."""

    def fn(params, batch_stats, img):
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        post = postprocess_raw_out(out)
        segm = post["segm_predictions"]
        depth = post["depth_predictions"]
        if compact_out:
            segm = segm.astype(jnp.uint8)
            depth = depth.astype(jnp.float16)
        return {"segm": segm, "depth": depth}

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
        compact_out: bool = False,
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
                _predict_fn(model, compact_out),
                in_shardings=(rep, rep, img_sharding),
                out_shardings=rep,
            )
        else:
            fn = jax.jit(_predict_fn(model, compact_out))
        sample = jax.ShapeDtypeStruct(self.shape, dtype)
        p_shape = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._params
        )
        s_shape = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._stats
        )
        self._compiled = fn.lower(p_shape, s_shape, sample).compile()

    def dispatch(self, imgs: np.ndarray) -> t.Tuple[t.Any, int]:
        """Enqueue the compiled program and return ``(device_out, n)``
        WITHOUT waiting for completion or fetching outputs — pair with
        :meth:`fetch`. Lets a caller overlap device compute with the
        host-side output transfer of the previous batch (the transfer
        dominates request latency on relay-attached hosts)."""
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
        return self._compiled(self._params, self._stats, jnp.asarray(imgs)), n

    def fetch(self, out: t.Any, n: int) -> t.Dict[str, np.ndarray]:
        """Complete a :meth:`dispatch`: fetch outputs to host (the honest
        sync point — see docs/BENCH_NOTES.md) and strip padding rows."""
        host = jax.device_get(out)
        return {k: v[:n] for k, v in host.items()}

    def __call__(self, imgs: np.ndarray) -> t.Dict[str, np.ndarray]:
        return self.fetch(*self.dispatch(imgs))


class BatchingServer:
    """Dynamic micro-batching over bucketed AOT programs.

    TPU inference wants large, statically-shaped batches; production request
    streams arrive one image at a time. This server bridges the two: a
    background worker drains a request queue, coalesces up to
    ``max(buckets)`` images (waiting at most ``max_wait_ms`` after the first
    request of a batch), runs the smallest compiled bucket that fits, and
    resolves each request's future with its own slice of the output.

    One program is AOT-compiled per bucket size at construction (pay all
    compile cost up front, never on a request). Requests never queue behind
    compilation, and a ragged tail pads only up to the next bucket rather
    than the full batch. With a ``mesh``, every bucket shards its batch over
    the mesh exactly like :class:`Predictor`.

    Execution is two-stage pipelined: the batching worker only *dispatches*
    the compiled program (async under jax) and hands the in-flight handle to
    a fetch thread that performs the host transfer and resolves the futures.
    Batch N+1's device compute therefore overlaps batch N's D2H fetch —
    which dominates request latency on relay-attached hosts (BENCH_NOTES).
    ``max_in_flight`` bounds the dispatch-ahead depth so a slow fetch
    backpressures the queue instead of piling device work.

    Thread-safe; use as a context manager or call :meth:`close`.
    """

    def __init__(
        self,
        model: t.Any,
        state: TrainState,
        height: int,
        width: int,
        buckets: t.Sequence[int] = (1, 4, 8),
        max_wait_ms: float = 2.0,
        channels: int = 3,
        dtype: t.Any = jnp.float32,
        mesh: t.Any = None,
        max_in_flight: int = 2,
        compact_out: bool = False,
    ):
        if max_in_flight < 1:
            raise ValueError(f"max_in_flight must be >= 1, got {max_in_flight}")
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive ints, got {buckets!r}")
        self._buckets = sorted(set(int(b) for b in buckets))
        self._predictors = {
            b: Predictor(
                model, state, b, height, width,
                channels=channels, dtype=dtype, mesh=mesh,
                compact_out=compact_out,
            )
            for b in self._buckets
        }
        self._sample_shape = (height, width, channels)
        self._wire_uint8 = np.dtype(dtype) == np.uint8
        self._max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[t.Optional[tuple]]" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "batches": 0,
            "batched_images": 0,
            "padded_slots": 0,
        }
        # dispatched-but-unfetched batches; bounded so dispatch backpressures
        self._inflight: "queue.Queue[t.Optional[tuple]]" = queue.Queue(
            maxsize=max_in_flight
        )
        self._fetcher = threading.Thread(
            target=self._run_fetch, name="vmtl-batching-fetch", daemon=True
        )
        self._fetcher.start()
        self._worker = threading.Thread(
            target=self._run, name="vmtl-batching-server", daemon=True
        )
        self._worker.start()

    # -- client side ------------------------------------------------------

    def submit(self, img: np.ndarray) -> "concurrent.futures.Future":
        """Enqueue one HWC image; the future resolves to ``{"segm","depth"}``
        for that image alone."""
        img = np.asarray(img)
        if img.shape != self._sample_shape:
            raise ValueError(
                f"expected one image of shape {self._sample_shape}, "
                f"got {img.shape}"
            )
        if self._wire_uint8 and img.dtype != np.uint8:
            raise ValueError(
                f"server compiled for uint8 wire input, got {img.dtype}"
            )
        fut: "concurrent.futures.Future" = concurrent.futures.Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("BatchingServer is closed")
            self._stats["requests"] += 1
            self._queue.put((img, fut))
        return fut

    def predict(self, img: np.ndarray) -> t.Dict[str, np.ndarray]:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(img).result()

    def warmup(self) -> None:
        """Execute every compiled bucket program once on a dummy image.

        AOT compilation already happened in the constructor, but a program's
        first execution still pays one-time costs (executable load, transfer
        path setup). Call this before timing so no bucket's first run lands
        inside a measured window; pair with :meth:`reset_stats`."""
        dummy = np.zeros(
            self._sample_shape,
            dtype=np.uint8 if self._wire_uint8 else np.float32,
        )[None]
        for pred in self._predictors.values():
            pred.fetch(*pred.dispatch(dummy))

    def reset_stats(self) -> None:
        """Zero the request/batch/occupancy counters (e.g. after warm-up)."""
        with self._lock:
            for k in self._stats:
                self._stats[k] = 0

    def stats(self) -> t.Dict[str, float]:
        with self._lock:
            s = dict(self._stats)
        s["mean_batch_occupancy"] = (
            s["batched_images"] / max(1, s["batched_images"] + s["padded_slots"])
        )
        return s

    def close(self) -> None:
        """Stop the workers after draining already-submitted requests."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._queue.put(None)
        self._worker.join()
        self._fetcher.join()

    def __enter__(self) -> "BatchingServer":
        return self

    def __exit__(self, *exc: t.Any) -> None:
        self.close()

    # -- worker side ------------------------------------------------------

    @staticmethod
    def _resolve(
        fut: "concurrent.futures.Future",
        result: t.Any = None,
        exc: t.Optional[BaseException] = None,
    ) -> None:
        """Resolve a request future, tolerating client-side ``cancel()``.

        A pending Future is cancellable until someone marks it running; a
        client cancelling between submit and dispatch would otherwise make
        ``set_result`` raise InvalidStateError and kill the fetch thread
        (wedging the dispatch worker at the bounded in-flight queue)."""
        if not fut.set_running_or_notify_cancel():
            return  # client cancelled while the request was pending
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)

    def _run(self) -> None:
        max_bucket = self._buckets[-1]
        try:
            while True:
                first = self._queue.get()
                if first is None:
                    return
                pending = [first]
                deadline = time.monotonic() + self._max_wait_s
                while len(pending) < max_bucket:
                    remain = deadline - time.monotonic()
                    try:
                        item = (
                            self._queue.get_nowait()
                            if remain <= 0
                            else self._queue.get(timeout=remain)
                        )
                    except queue.Empty:
                        break
                    if item is None:
                        self._flush(pending)
                        return
                    pending.append(item)
                self._flush(pending)
        finally:
            self._inflight.put(None)  # fetch thread drains, then exits

    def _flush(self, pending: t.List[tuple]) -> None:
        """Dispatch one coalesced batch; futures resolve on the fetch
        thread. Blocks only when ``max_in_flight`` batches are unfetched."""
        n = len(pending)
        bucket = next(b for b in self._buckets if b >= n)
        imgs = np.stack([img for img, _ in pending], axis=0)
        try:
            out, _ = self._predictors[bucket].dispatch(imgs)
        except Exception as e:  # resolve, don't kill the worker
            for _, fut in pending:
                self._resolve(fut, exc=e)
            return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batched_images"] += n
            self._stats["padded_slots"] += bucket - n
        self._inflight.put((bucket, out, pending))

    def _run_fetch(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            bucket, out, pending = item
            try:
                host = self._predictors[bucket].fetch(out, len(pending))
            except Exception as e:
                for _, fut in pending:
                    self._resolve(fut, exc=e)
                continue
            for i, (_, fut) in enumerate(pending):
                self._resolve(fut, {k: v[i] for k, v in host.items()})


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
