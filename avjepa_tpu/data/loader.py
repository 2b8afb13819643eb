"""Host-side batch pipeline: per-host sharded sampling, threaded decode
workers, mask collation, and prefetch to device.

Replaces the reference's torch DataLoader + DistributedSampler + collate_fn
stack (reference: src/datasets/audiovideo_dataset.py:53-89). Decode work runs
in a thread pool (the C++ decoder and numpy release the GIL); assembled batches
are prefetched into a bounded queue so host ingest overlaps device step time —
the reference's main data-path bottleneck (SURVEY §7).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

import jax

from avjepa_tpu.masks.multiblock3d import MaskSet

# process-worker state: the dataset is shipped once per worker via the pool
# initializer (bound methods would drag unpicklable pool/lock state along)
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


class FetchFailure:
    """Sentinel for a sample that failed to decode after retries.

    Produced only under ``retry_resample=False`` (eval VAL loaders): silently
    substituting a random other sample would double-score it and skip the
    failed one in the exact top-1 accounting, so the failure is carried to
    the collate, which excludes the slot from the metric instead."""

    __slots__ = ("idx",)

    def __init__(self, idx: int):
        self.idx = int(idx)


def _fetch_with_retry(dataset, idx: int, resample: bool = True):
    # retry-resample loop on decode failure — the single implementation for
    # both the thread and process pools
    # (reference: src/datasets/audiovideo_dataset.py:163-170).
    # resample=False retries the SAME index then yields a FetchFailure
    # sentinel (exact-metric val paths must not substitute another sample).
    attempts = 10 if resample else 3
    for attempt in range(attempts):
        try:
            return dataset[int(idx)]
        except Exception:
            if resample:
                idx = np.random.default_rng([int(idx), attempt]).integers(
                    0, len(dataset)
                )
    if not resample:
        return FetchFailure(idx)
    raise RuntimeError("persistent decode failure")


def _fetch_worker(idx: int, epoch: int = 0, resample: bool = True):
    # process workers hold a pickled dataset COPY, so the epoch must ride in
    # with each task — a set_epoch on the parent's dataset never reaches them
    if hasattr(_WORKER_DATASET, "set_epoch"):
        _WORKER_DATASET.set_epoch(epoch)
    return _fetch_with_retry(_WORKER_DATASET, idx, resample)


def exact_val_collate(collate):
    """Wrap an eval collate for a ``retry_resample=False`` loader.

    FetchFailure slots are replaced with a copy of a good sample from the
    same batch (keeping batch shapes static, no recompiles) and a per-slot
    ``ok`` mask is appended to the collate's outputs; the val metric ANDs it
    with its wrap-padding validity so a corrupt file is excluded from top-1
    (and loudly logged) instead of silently scoring a substituted sample.

    An ENTIRE batch failing to decode still emits a batch (filler from the
    last good sample seen, ok=all-False) rather than raising: on a multi-host
    eval, one host raising while its peers proceed into the psum collective
    hangs the job; an all-False batch keeps every host in lockstep and the
    slots simply don't count. Only an all-failed FIRST batch (no shape donor
    yet, dataset presumably unreadable) raises."""

    last_good = []  # closure cell: most recent decodable sample

    def wrapped(samples):
        ok = np.asarray(
            [not isinstance(s, FetchFailure) for s in samples], bool
        )
        if not ok.all():
            failed = [s.idx for s in samples if isinstance(s, FetchFailure)]
            import logging

            logging.getLogger("avjepa_tpu").warning(
                f"val decode failure: sample indices {failed} excluded from "
                "the metric"
            )
            if not ok.any():
                if not last_good:
                    raise RuntimeError(
                        "entire first val batch failed to decode (no shape "
                        "donor for an all-False batch); dataset unreadable?"
                    )
                samples = [last_good[0]] * len(samples)
            else:
                good = samples[int(np.argmax(ok))]
                samples = [s if o else good for s, o in zip(samples, ok)]
        if ok.any():
            last_good[:] = [samples[int(np.argmax(ok))]]
        out = collate(samples)
        if not isinstance(out, tuple):
            out = (out,)
        return (*out, ok)

    return wrapped


class ShardedSampler:
    """Epoch-shuffled, per-host sharded index sampler (DistributedSampler
    semantics: equal shards, wrap-around padding, set_epoch reshuffle)."""

    def __init__(
        self,
        dataset_len: int,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
        drop_last: bool = True,
        weights: Optional[np.ndarray] = None,
    ):
        self.dataset_len = dataset_len
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards if num_shards is not None else jax.process_count()
        self.shard_index = (
            shard_index if shard_index is not None else jax.process_index()
        )
        self.drop_last = drop_last
        self.weights = weights
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng([self.seed, self.epoch])
        if self.weights is not None:
            w = np.asarray(self.weights, np.float64)
            order = rng.choice(self.dataset_len, size=self.dataset_len, p=w / w.sum())
        elif self.shuffle:
            order = rng.permutation(self.dataset_len)
        else:
            order = np.arange(self.dataset_len)
        # pad to a multiple of shards (DistributedSampler wrap-around)
        total = int(np.ceil(self.dataset_len / self.num_shards)) * self.num_shards
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        shard = order[self.shard_index :: self.num_shards]
        if not self.drop_last and len(shard) % self.batch_size:
            # wrap-pad the final partial batch to full size (same
            # DistributedSampler semantics as the shard padding above: a few
            # samples evaluate twice, every sample evaluates at least once,
            # and the jitted step keeps its static batch shape). Without
            # this, a val set smaller than one batch yields ZERO batches.
            pad = self.batch_size - len(shard) % self.batch_size
            # np.resize wraps cyclically — shard[:pad] alone under-pads (and
            # yields ZERO batches) whenever the shard is smaller than half a
            # batch, e.g. a 10-row extract/val set at global batch 32
            shard = np.resize(shard, len(shard) + pad)
        nb = len(shard) // self.batch_size
        for i in range(nb):
            yield shard[i * self.batch_size : (i + 1) * self.batch_size]

    def batch_valid_masks(self) -> Iterator[np.ndarray]:
        """Per-batch bool masks marking rows that are FIRST global
        occurrences — False on shard-level wrap-pads and batch-level
        np.resize pads. Zip with the batches so exact-count metrics (val
        top-1) don't double-count the duplicates the static batch shape
        introduces (the reference's ragged torch loader counts each sample
        once). Valid for permutation orders (shuffle on or off: duplicates
        only ever come from padding); NOT meaningful for weighted draws.

        Layout mirror of __iter__: padded order position of shard element k
        is shard_index + num_shards*k; positions >= dataset_len are pads.
        """
        assert self.weights is None, "validity is undefined for weighted draws"
        total = int(np.ceil(self.dataset_len / self.num_shards)) * self.num_shards
        shard_len = total // self.num_shards
        k = np.arange(shard_len)
        valid = (self.shard_index + self.num_shards * k) < self.dataset_len
        if not self.drop_last and shard_len % self.batch_size:
            pad = self.batch_size - shard_len % self.batch_size
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        nb = len(valid) // self.batch_size
        for i in range(nb):
            yield valid[i * self.batch_size : (i + 1) * self.batch_size]


class JepaLoader:
    """Iterates (video, audio, masksets) batches with background prefetch.

    dataset[i] must return (video [T,H,W,3] f32, audio [Hs,Ws] f32 or None,
    label). The mask collator is stepped once per *global* batch, mirroring the
    reference's shared-counter discipline so all hosts produce the same block
    sizes.
    """

    def __init__(
        self,
        dataset,
        sampler: ShardedSampler,
        mask_collator=None,
        num_workers: int = 4,
        prefetch: int = 2,
        use_processes: bool = False,
        collate=None,
        retry_resample: bool = True,
    ):
        """``collate``: optional ``fn(samples) -> batch`` overriding the
        default AV assembly — lets the evals reuse this loader's worker pool
        + bounded prefetch + retry-resample for their richer sample shapes
        (views/segments) instead of serial ``ds[i]`` loops (reference eval
        loaders are 8-12-worker torch DataLoaders,
        evals/video_classification_frozen/eval.py:447-493)."""
        self.dataset = dataset
        self.sampler = sampler
        self.mask_collator = mask_collator
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.use_processes = use_processes
        # retry_resample=False: decode failures surface as FetchFailure
        # sentinels in the collate's sample list (requires a collate that
        # handles them); exact-accounting val loaders use this
        self.retry_resample = retry_resample
        if use_processes:
            # process workers sidestep the GIL for the numpy stages (mel,
            # normalize); the torch-DataLoader-equivalent mode. forkserver,
            # NOT fork: forking a multithreaded JAX process deadlocks
            # (os.fork() after the runtime spawns its thread pools).
            import multiprocessing as mp

            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("forkserver"),
                initializer=_init_worker,
                initargs=(dataset,),
            )
        else:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)
        self._epoch = epoch
        # thread-path workers share this dataset object; process-path workers
        # get the epoch per task in _assemble
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _fetch(self, idx: int):
        return _fetch_with_retry(self.dataset, idx, self.retry_resample)

    def _assemble(self, indices: np.ndarray):
        n = len(indices)
        if self.use_processes:
            epoch = getattr(self, "_epoch", 0)
            samples = list(
                self._pool.map(
                    _fetch_worker,
                    [int(i) for i in indices],
                    [epoch] * n,
                    [self.retry_resample] * n,
                )
            )
        else:
            samples = list(self._pool.map(self._fetch, indices))
        if self.collate is not None:
            return self.collate(samples)
        if any(isinstance(s, FetchFailure) for s in samples):
            # only collate consumers can exclude failed slots; the default AV
            # assembly has no validity channel
            raise RuntimeError(
                "decode failure with retry_resample=False and no collate"
            )
        video = np.stack([s[0] for s in samples])
        audio = None
        if samples[0][1] is not None:
            audio = np.stack([s[1] for s in samples])[..., None]  # [B,Hs,Ws,1]
        labels = np.asarray([s[2] for s in samples])
        masks: Sequence[MaskSet] = ()
        if self.mask_collator is not None:
            masks = self.mask_collator(len(indices))
        return video, audio, labels, masks

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that keeps checking the stop flag: a plain q.put
            # blocks FOREVER when the consumer abandons the iterator with a
            # full queue (observed with warmup `next(iter(loader))` patterns),
            # pinning worker-pool capacity on stale batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        error: list = []

        def producer():
            try:
                for indices in self.sampler:
                    if stop.is_set():
                        return
                    if not put_or_stop(self._assemble(indices)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                # surface producer failures to the consumer instead of
                # silently ending the epoch (a daemon-thread traceback is
                # invisible and an empty epoch looks like an empty dataset)
                error.append(e)
            finally:
                # deliver the end-of-epoch sentinel through the stop-aware
                # blocking helper: the queue is typically full here while the
                # consumer is still draining, and a dropped sentinel would
                # leave the consumer blocked in q.get() forever
                put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
