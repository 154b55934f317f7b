"""Host-side batch loader with threaded sample decode and device prefetch.

Replaces torch DataLoader (reference lit_datamodule.py:97-127). Differences,
all deliberate and TPU-motivated:

  * static batch shapes: train drops the ragged last batch (DataConfig.
    drop_last=True — the reference config declares it but never passes it to
    its loaders); eval PADS the last batch and attaches a per-sample
    ``valid`` mask so metrics/losses are exact without recompilation.
  * ``num_workers`` maps to a thread pool (numpy/PIL decode releases the
    GIL); an optional C++ decode path plugs in underneath (native/).
  * ``prefetch_to_device`` overlaps host decode + H2D transfer with device
    compute by keeping ``size`` batches in flight, sharded over the mesh.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import typing as t

import numpy as np

from vision_mtl_tpu.parallel.mesh import put_batch

Batch = t.Dict[str, np.ndarray]


def _collate(samples: t.Sequence[t.Dict[str, np.ndarray]]) -> Batch:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


def compress_batch(batch: Batch) -> Batch:
    """Compact wire format for host->device transfer: img uint8 (x255),
    depth uint16 (x65535, values are pre-normalized to [0,1]), mask uint8.
    The jitted step decodes on device (train/step.py decode_batch) — 4x
    fewer wire bytes, which matters whenever H2D bandwidth, not compute, is
    the bottleneck. Quantization: exact for masks and for uint8-sourced
    images; <=1.6e-5 absolute for depth."""
    out: Batch = {}
    for k, v in batch.items():
        if k == "img" and v.dtype == np.float32:
            out[k] = np.clip(np.rint(v * 255.0), 0, 255).astype(np.uint8)
        elif k == "depth" and v.dtype == np.float32:
            out[k] = np.clip(np.rint(v * 65535.0), 0, 65535).astype(np.uint16)
        elif k == "mask" and v.max() < 256 and v.min() >= 0:
            out[k] = v.astype(np.uint8)
        else:
            out[k] = v
    return out


def _pad_batch(batch: Batch, target_bs: int) -> Batch:
    """Pad to target_bs by repeating the last sample; adds 'valid'."""
    bs = next(iter(batch.values())).shape[0]
    out: Batch = {}
    for k, v in batch.items():
        if bs < target_bs:
            pad = np.repeat(v[-1:], target_bs - bs, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        else:
            out[k] = v
    valid = np.zeros((target_bs,), np.float32)
    valid[:bs] = 1.0
    out["valid"] = valid
    return out


class DataLoader:
    """Iterable over collated numpy batches."""

    def __init__(
        self,
        dataset: t.Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = False,
        num_workers: int = 0,
        with_valid: bool = False,
        wire_format: str = "f32",
        shard_rows: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = num_workers
        self.with_valid = with_valid
        self.wire_format = wire_format
        # multi-process: True = decode only this host's 1/process_count
        # row-slice (valid when processes span ONLY the mesh's data axis);
        # False = every host decodes the full global batch (required for
        # process-spanning spatial/model meshes — put_batch slices it)
        self.shard_rows = shard_rows
        self.epoch = 0
        # one-shot: the NEXT iteration skips this many leading batches
        # (without decoding them) then resets to 0 — preemption resume
        # replays the interrupted epoch's seeded order from mid-epoch
        # (train/preempt.py)
        self.skip_batches = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> t.List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    @staticmethod
    def _process_shard() -> t.Tuple[int, int]:
        """(process_index, process_count) under jax.distributed; (0, 1)
        single-process. Thin wrapper (kept for test monkeypatching) around
        the shared parallel/multihost helper. The no-backend variant keeps
        host-only loader iteration (e.g. scripts/bench_pipeline.py's timed
        region) from triggering device-backend bring-up."""
        from vision_mtl_tpu.parallel.multihost import process_info_no_backend

        return process_info_no_backend()

    def __iter__(self) -> t.Iterator[Batch]:
        batches = self._index_batches()
        if self.skip_batches:
            batches = batches[self.skip_batches :]
            self.skip_batches = 0
        self.epoch += 1

        # host-sharded loading (multi-process SPMD): every host computes the
        # SAME seeded global batch order, then decodes ONLY its contiguous
        # 1/process_count row-slice of each global batch. put_batch
        # assembles the global sharded array from these local shards
        # (make_array_from_process_local_data) — no host ever decodes or
        # ships another host's samples.
        pid, pc = self._process_shard()
        if pc > 1 and not self.shard_rows:
            # full-batch mode: identical decode on every host (same seeded
            # order), assembled by put_batch(full_local=True)
            pid, pc = 0, 1
        if pc > 1:
            assert self.batch_size % pc == 0, (
                f"global batch_size {self.batch_size} must divide by "
                f"process_count {pc} for host-sharded loading"
            )
            # a ragged global batch cannot be row-sliced consistently
            # across hosts; every factory in datamodule.py sets one of
            # these (train: drop_last, eval: pad_last)
            assert self.drop_last or self.pad_last, (
                "host-sharded loading needs static global batches: "
                "construct the DataLoader with drop_last or pad_last"
            )
        per = self.batch_size // pc

        if self.num_workers > 0:
            pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
            get = lambda i: pool.submit(self.dataset.__getitem__, i)  # noqa: E731
        else:
            pool = None

        native_batch = getattr(self.dataset, "load_batch", None)
        try:
            for idxs in batches:
                n_real = len(idxs)
                valid_local: t.Optional[np.ndarray] = None
                if pc > 1:
                    lo, hi = pid * per, (pid + 1) * per
                    if self.pad_last:
                        # pad the GLOBAL batch by repeating its last real
                        # sample, then take this host's row-slice; 'valid'
                        # marks the padded rows
                        idxs = [
                            idxs[min(r, n_real - 1)] for r in range(lo, hi)
                        ]
                        valid_local = (
                            np.arange(lo, hi) < n_real
                        ).astype(np.float32)
                    else:
                        # train: drop_last guarantees full global batches
                        idxs = list(idxs[lo:hi])
                batch = None
                if native_batch is not None:
                    try:
                        batch = native_batch([int(i) for i in idxs])
                    except RuntimeError:
                        batch = None
                if batch is None:
                    if pool is not None:
                        samples = [f.result() for f in [get(i) for i in idxs]]
                    else:
                        samples = [self.dataset[int(i)] for i in idxs]
                    batch = _collate(samples)
                if pc > 1:
                    if valid_local is not None:
                        batch["valid"] = valid_local
                    elif self.with_valid:
                        batch["valid"] = np.ones((per,), np.float32)
                elif self.pad_last:
                    batch = _pad_batch(batch, self.batch_size)
                elif self.with_valid:
                    batch["valid"] = np.ones(
                        (len(idxs),), np.float32
                    )
                if self.wire_format == "compact":
                    batch = compress_batch(batch)
                yield batch
        finally:
            if pool is not None:
                pool.shutdown(wait=False)


def prefetch_to_device(
    iterator: t.Iterable[Batch], mesh=None, size: int = 2
) -> t.Iterator[t.Any]:
    """Keep ``size`` device-resident batches in flight (async H2D via
    device_put; jax dispatch is async so compute overlaps transfer)."""
    # a DataLoader in full-batch mode (shard_rows=False) yields the FULL
    # global batch on every host; tell put_batch so assembly slices it
    # instead of treating it as a row shard
    full = getattr(iterator, "shard_rows", True) is False
    queue: collections.deque = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put_batch(next(it), mesh, full_local=full))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put_batch(next(it), mesh, full_local=full))
        except StopIteration:
            pass
        yield out
