"""Host->device transfer overlap for the train/eval loops.

The reference hides H2D latency in pinned-memory DataLoader workers +
``non_blocking=True`` copies (`MViT/tools/train_net.py:88-111`). The JAX
equivalent: ``jax.device_put`` of batch N+1 issued from a background
thread while step N's async dispatch runs, so the loader-to-step handoff
(host batch assembly + transfer enqueue) never sits on the critical path.

Depth-1 is intentional: one device batch in flight bounds extra HBM to a
single input batch (uint8 frames, ~19 MB at bs 8), and the decode-side
prefetching is already handled by the threaded loader
(`pmv_tpu/data/loader.py`).
"""

import queue
import threading

from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)

_STOP = object()


class DevicePrefetcher:
    """Iterate ``loader``, yielding ``(host_batch, device_batch)`` with the
    device transfer of the NEXT batch already enqueued from a worker thread.

    ``put_fn(host_batch) -> device_batch`` runs on the worker thread; it
    must be thread-safe (``jax.device_put`` / ``shard_batch`` are). Errors
    propagate to the consumer on the next ``__next__``. ``depth`` bounds
    the number of device batches in flight.
    """

    def __init__(self, loader, put_fn, depth=1):
        self._loader = loader
        self._put_fn = put_fn
        self._depth = max(1, int(depth))

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        q = queue.Queue(maxsize=self._depth)
        stop = threading.Event()

        def _put(item):
            # Bounded put that aborts when the consumer went away, so an
            # early break/exception downstream never leaks a thread that
            # keeps decoding + transferring to the end of the epoch.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for host_batch in self._loader:
                    if stop.is_set():
                        return
                    if not _put((host_batch, self._put_fn(host_batch))):
                        return
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                _put(e)
                return
            _put(_STOP)

        t = threading.Thread(
            target=worker, name="device-prefetch", daemon=True
        )
        t.start()
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
