"""Loader builders (reference: vidgen/data/build.py:41-156).

TPU-native loader design: host threads run the mapper (PIL / np.load release
the GIL), batches are collated into stacked numpy arrays (not the reference's
list-of-dicts) so one device_put moves the whole batch, and a small prefetch
queue keeps the input pipeline ahead of the jitted step. One process per
host — no worker-process spawning.
"""

import logging
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from ..utils import comm
from .catalog import DatasetCatalog
from .mapper import DatasetMapper
from .samplers import InferenceSampler, TrainingSampler

logger = logging.getLogger(__name__)

_ARRAY_KEYS = ("image", "image_sequence", "video", "class")


def get_dataset_dicts(dataset_names) -> List[dict]:
    assert len(dataset_names)
    all_dicts = [DatasetCatalog.get(name) for name in dataset_names]
    for name, dicts in zip(dataset_names, all_dicts):
        assert len(dicts), f"Dataset '{name}' is empty!"
    return [d for dicts in all_dicts for d in dicts]


def collate(samples: List[dict]) -> dict:
    """Stack array fields; keep other metadata as lists."""
    keys = set(samples[0])
    for s in samples[1:]:
        if set(s) != keys:
            # stacking assumes one schema per batch; mixing e.g. a
            # class-labeled kinetics dataset with unlabeled bair would
            # otherwise KeyError or silently drop labels
            raise ValueError(
                f"cannot collate heterogeneous samples: {sorted(keys)} vs "
                f"{sorted(set(s))} — the batched datasets produce different "
                f"field sets")
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if k in _ARRAY_KEYS:
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


class _PrefetchLoader:
    """Iterable over collated batches with a bounded background prefetcher."""

    def __init__(self, dataset_dicts, mapper, sampler, batch_size,
                 num_workers, drop_last, infinite, max_retries=50):
        self._dicts = dataset_dicts
        self._mapper = mapper
        self._sampler = sampler
        self._batch = batch_size
        self._workers = max(1, num_workers)
        self._drop_last = drop_last
        self._infinite = infinite
        self._max_retries = max_retries
        self._fallback_rng = np.random.default_rng(0)
        self._fallback_lock = threading.Lock()

    def __len__(self):
        if self._infinite:
            raise TypeError("infinite training loader has no length")
        # the SAMPLER's length (per-rank shard, TEST.N_SAMPLES subset) is
        # what this rank actually iterates — len(dataset) over-reported
        # e.g. world_size x for sharded eval
        n = len(self._sampler)
        if self._drop_last:
            return n // self._batch
        return (n + self._batch - 1) // self._batch

    def _map_one(self, idx: int) -> dict:
        """Map with retry-on-None fallback (reference MapDataset,
        data/common.py:37-58)."""
        for attempt in range(self._max_retries):
            d = self._mapper(self._dicts[idx])
            if d is not None:
                return d
            with self._fallback_lock:  # Generators are not thread-safe
                idx = int(self._fallback_rng.integers(len(self._dicts)))
        raise RuntimeError(f"Mapper failed {self._max_retries} times in a row")

    def _map_chunk(self, idxs) -> List[dict]:
        return [self._map_one(i) for i in idxs]

    def _map_batch(self, pool, batch_idx) -> List[dict]:
        """One future per worker-sized contiguous chunk, not per item: at
        reference VQ-VAE rates (11k imgs/s) the per-item future/lock
        machinery cost ~55 us/item — comparable to the 75 us PNG decode
        itself (profiled; BASELINE.md pipeline rows carry the measured
        before/after). Contiguous chunks preserve batch order."""
        k = min(self._workers, len(batch_idx))
        size = (len(batch_idx) + k - 1) // k
        chunks = [batch_idx[i:i + size] for i in range(0, len(batch_idx), size)]
        return [s for part in pool.map(self._map_chunk, chunks) for s in part]

    @staticmethod
    def _put(q: queue.Queue, stop: threading.Event, item) -> bool:
        """Bounded put that gives up when the consumer is gone (a dropped
        iterator must not leave the producer blocked on a full queue)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, q: queue.Queue, stop: threading.Event):
        from concurrent.futures import ThreadPoolExecutor

        try:
            with ThreadPoolExecutor(self._workers) as pool:
                batch_idx: List[int] = []
                for idx in iter(self._sampler):
                    if stop.is_set():
                        return
                    batch_idx.append(int(idx))
                    if len(batch_idx) == self._batch:
                        samples = self._map_batch(pool, batch_idx)
                        if not self._put(q, stop, collate(samples)):
                            return
                        batch_idx = []
                if batch_idx and not self._drop_last:
                    samples = self._map_batch(pool, batch_idx)
                    if not self._put(q, stop, collate(samples)):
                        return
        except Exception as e:  # surface loader errors in the consumer
            self._put(q, stop, e)
        self._put(q, stop, None)

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=4)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # runs on normal exhaustion AND on GeneratorExit when the
            # consumer drops the iterator: unblock + terminate the producer
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)


def build_train_loader(cfg, mapper: Optional[DatasetMapper] = None):
    """Infinite sharded training loader; global IMS_PER_BATCH split across
    host processes (reference build.py:41-107)."""
    world = comm.get_world_size()
    total = cfg.SOLVER.IMS_PER_BATCH
    assert total % world == 0 and total >= world, (
        f"SOLVER.IMS_PER_BATCH ({total}) must be divisible by the number of "
        f"processes ({world}).")
    per_proc = total // world

    dataset_dicts = get_dataset_dicts(cfg.DATASETS.TRAIN)
    if mapper is None:
        mapper = DatasetMapper(cfg, is_train=True)

    name = cfg.DATALOADER.SAMPLER_TRAIN
    assert name == "TrainingSampler", f"Unknown training sampler: {name}"
    seed = cfg.SEED if cfg.SEED > 0 else None
    sampler = TrainingSampler(len(dataset_dicts), seed=seed)

    logger.info(f"Train loader: {len(dataset_dicts)} samples, "
                f"{per_proc}/process of global batch {total}")
    return _PrefetchLoader(
        dataset_dicts, mapper, sampler, per_proc,
        cfg.DATALOADER.NUM_WORKERS, drop_last=True, infinite=True,
    ), len(dataset_dicts)


def build_test_loader(cfg, dataset_name: str, mapper: Optional[DatasetMapper] = None,
                      batch_size: int = 1):
    """Per-rank contiguous shard, batch 1 by default (reference
    build.py:110-145)."""
    dataset_dicts = get_dataset_dicts([dataset_name])
    if mapper is None:
        mapper = DatasetMapper(cfg, is_train=False)
    sampler = InferenceSampler(len(dataset_dicts), cfg.TEST.N_SAMPLES)
    return _PrefetchLoader(
        dataset_dicts, mapper, sampler, batch_size,
        cfg.DATALOADER.NUM_WORKERS, drop_last=False, infinite=False,
    )
