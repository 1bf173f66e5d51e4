"""Input pipeline: threaded decode workers + prefetched device batches.

TPU-native replacement for the torch DataLoader stack
(`MViT/slowfast/datasets/loader.py`): the reference forks NUM_WORKERS python
processes because decode happens in Python; here decode is native C++ that
releases the GIL, so a thread pool + a small prefetch queue gives the same
parallelism with zero IPC/serialization cost, and batches land in host
pinned-equivalent numpy buffers ready for a single device_put.

Per-host sharding replaces DistributedSampler (`datasets/utils.py:423-437`):
each JAX process draws a disjoint slice of the epoch permutation;
`shuffle_dataset` semantics (reseed per epoch) map to `set_epoch`.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from pmv_tpu.data.build import build_dataset
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size,
        shuffle=False,
        drop_last=False,
        num_workers=8,
        prefetch_depth=2,
        seed=0,
        process_index=0,
        process_count=1,
        collate=None,
        short_cycle=None,  # (bs_factor_0, bs_factor_1) multigrid short cycle
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate or _collate
        self.short_cycle = short_cycle

    def set_epoch(self, epoch):
        """Reseed the shuffle (reference `loader.shuffle_dataset`)."""
        self.epoch = epoch

    def _epoch_indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # Per-host contiguous shard of the permutation.
        shard = order[self.process_index :: self.process_count]
        if self.drop_last:
            usable = (len(shard) // self.batch_size) * self.batch_size
            shard = shard[:usable]
        return shard

    def __len__(self):
        shard_len = (
            len(self.dataset) + self.process_count - 1
        ) // self.process_count
        if self.short_cycle:
            f0, f1 = self.short_cycle
            sizes = [self.batch_size * f0, self.batch_size * f1,
                     self.batch_size]
            cycle = sum(sizes)
            n = (shard_len // cycle) * 3
            rem = shard_len - (shard_len // cycle) * cycle
            for s in sizes:
                if rem <= 0:
                    break
                if not self.drop_last or rem >= s:
                    n += 1
                rem -= s
            return n
        if self.drop_last:
            return shard_len // self.batch_size
        return (shard_len + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._epoch_indices()
        if self.short_cycle:
            # ShortCycleBatchSampler (`datasets/multigrid_helper.py`): cycle
            # batch sizes [bs*f0, bs*f1, bs]; samples in the two short
            # phases carry their phase so the dataset shrinks the crop.
            f0, f1 = self.short_cycle
            sizes = [self.batch_size * f0, self.batch_size * f1,
                     self.batch_size]
            batches, pos, phase = [], 0, 0
            while pos < len(indices):
                bs = sizes[phase % 3]
                chunk = indices[pos : pos + bs]
                sc = phase % 3 if phase % 3 < 2 else None
                batches.append([
                    (int(i), sc) if sc is not None else int(i) for i in chunk
                ])
                if self.drop_last and len(chunk) < bs:
                    batches.pop()
                pos += bs
                phase += 1
        else:
            batches = [
                indices[i : i + self.batch_size]
                for i in range(0, len(indices), self.batch_size)
            ]
            if self.drop_last:
                batches = [b for b in batches if len(b) == self.batch_size]

        out_q = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        out_q.put(self.collate(samples))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def _collate(samples):
    """Stack sample dicts into a batch of numpy arrays. Extra per-sample
    keys (detection boxes/masks/metadata) are stacked generically."""
    labels = [s["label"] for s in samples]
    batch = {
        "frames": np.stack([s["frames"] for s in samples]),
        # Multi-label datasets return float vectors; classification ints.
        "labels": (
            np.stack(labels)
            if isinstance(labels[0], np.ndarray)
            else np.asarray(labels, np.int64)
        ),
        "index": np.asarray([s["index"] for s in samples], np.int64),
        "time": np.asarray([s["time"] for s in samples], np.float32),
        "pm": np.asarray([s["pm"] for s in samples], bool),
    }
    std_keys = {"frames", "label", "index", "time", "pm"}
    for key in samples[0]:
        if key not in std_keys:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
    return batch


def multiple_samples_collate(samples):
    """Flatten repeated-augmentation samples (`loader.py:46-71`): each sample
    carries a leading num_aug axis; fold it into the batch.

    Copy-MAJOR order ([all copy-0s | all copy-1s | ...]): the on-device
    RandAugment splits the batch into contiguous groups for its op draws,
    so this layout gives each copy of a clip a different op chain."""
    flat = []
    n = samples[0]["frames"].shape[0]
    for i in range(n):
        for s in samples:
            flat.append(
                {
                    "frames": s["frames"][i],
                    "label": s["label"],
                    "index": s["index"],
                    "time": s["time"],
                    "pm": s["pm"],
                }
            )
    return _collate(flat)


def construct_loader(cfg, split, dataset=None):
    """Build the per-split loader (`loader.py:112-169`)."""
    import jax

    assert split in ["train", "val", "test"]
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        # Reference semantics: TRAIN.BATCH_SIZE is per-node; divide by local
        # device count is not needed in single-controller JAX — the loader
        # yields the per-host batch and the step shards it over the mesh.
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False

    if dataset is None:
        dataset = build_dataset(dataset_name, cfg, split)
    collate = None
    multi_view = (
        cfg.DATA.TRAIN_CROP_NUM_TEMPORAL > 1
        or cfg.DATA.TRAIN_CROP_NUM_SPATIAL > 1
    )
    if (
        split == "train" and cfg.AUG.ENABLE and cfg.AUG.NUM_SAMPLE > 1
        and not multi_view
    ):
        # Repeated-aug copies flatten into the batch; contrastive multi-clip
        # VIEWS instead keep their leading axis ([B, V, T, H, W, C]) for the
        # SSL step to pair up.
        collate = multiple_samples_collate
    short_cycle = None
    if (
        split == "train"
        and cfg.MULTIGRID.SHORT_CYCLE
        and cfg.MULTIGRID.DEFAULT_S > 0
    ):
        # Batch-size factors compensating the smaller short-cycle crops
        # (`multigrid_helper.py` ShortCycleBatchSampler bs_factor).
        short_cycle = tuple(
            int(
                round(
                    (
                        float(cfg.DATA.TRAIN_CROP_SIZE)
                        / (s * cfg.MULTIGRID.DEFAULT_S)
                    )
                    ** 2
                )
            )
            for s in cfg.MULTIGRID.SHORT_CYCLE_FACTORS
        )
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        prefetch_depth=cfg.DATA_LOADER.PREFETCH_DEPTH,
        seed=cfg.RNG_SEED,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        collate=collate,
        short_cycle=short_cycle,
    )
