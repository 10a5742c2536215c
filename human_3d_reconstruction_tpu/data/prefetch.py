"""Host->device prefetch: overlap batch preparation with device compute.

The reference overlaps IO with compute via DataLoader worker processes;
the TPU-native equivalent is simpler — device transfers are async, so
keeping `depth` batches in flight hides both host decode/collate time and
the H2D copy behind the current step. One background thread drives the
(python, GIL-releasing cv2/numpy) producer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


def device_prefetch(
    batch_iter: Iterator[Any],
    place: Optional[Callable[[Any], Any]] = None,
    depth: int = 2,
) -> Iterator[Any]:
    """Wrap a host batch iterator with an async device-placement pipeline.

    Args:
        batch_iter: yields host batches (pytrees of numpy arrays).
        place: device placement fn (default `jax.device_put`); pass
            `lambda b: shard_batch(b, mesh)` for DP training.
        depth: batches kept in flight (2 suffices: one computing, one
            transferring/preparing).
    """
    place = place or jax.device_put
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    errors: list[BaseException] = []

    def producer():
        try:
            for batch in batch_iter:
                q.put(place(batch))  # device_put is async: returns immediately
        except BaseException as e:  # surface worker crashes to the consumer
            errors.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True, name="prefetch")
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if errors:
                raise errors[0]
            return
        yield item


def echo_batches(batch_iter: Iterator[Any], factor: int) -> Iterator[Any]:
    """Data echoing (Choi et al., 2020): yield each batch `factor` times.

    The principled fix for a host-bound input pipeline on this stack: the
    trainer's augmentation (crop/scale/rot/flip jitter) runs ON DEVICE and
    folds the step counter into its RNG (train/trainer.py), so the E echoes
    of one host batch train on E *different* augmented views — the sample
    efficiency of echoing at the cost of sample diversity, multiplying
    effective host throughput by E. Compose AFTER device_prefetch so each
    host batch crosses host->device once and echoes reuse the device
    buffers:

        batches = echo_batches(device_prefetch(loader, place), factor)
    """
    if factor < 1:
        raise ValueError(f"echo factor must be >= 1, got {factor}")
    for batch in batch_iter:
        for _ in range(factor):
            yield batch
