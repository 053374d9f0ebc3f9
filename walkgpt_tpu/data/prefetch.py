"""Host-side background prefetching.

The reference overlaps host preprocessing with device compute via multi-worker
torch DataLoaders (train_walkgpt.py:508-557). The TPU-native equivalent here
is a bounded background-thread pipeline: a producer thread runs the (numpy,
GIL-releasing cv2/PIL-heavy) sample/collate work `depth` items ahead while the
device executes the current step, so the accelerator never waits on the single
data-host core for work that could have been overlapped.

Also provides `shard_indices`, the DistributedSampler equivalent
(evaluation_walkgpt.py:393-401): each JAX process evaluates a strided slice of
the dataset and metric accumulators all_reduce the totals.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence


def shard_indices(n: int, *, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List[int]:
    """Strided per-process partition of range(n) — the reference's
    DistributedSampler(shuffle=False) assignment for this rank."""
    if process_index is None or process_count is None:
        import jax
        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    return list(range(process_index, n, process_count))


class _End:
    pass


_END = _End()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate `iterable` with a background producer thread keeping up to
    `depth` items ready. Exceptions in the producer re-raise at the consumer's
    next pull; the thread is a daemon so abandoned iterators don't hang exit."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def produce():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:       # noqa: BLE001 — re-raised at consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


def prefetch_map(fn: Callable[[int], object], indices: Sequence[int],
                 depth: int = 2) -> Iterator:
    """`(fn(i) for i in indices)` with background prefetching."""
    return prefetch((fn(i) for i in indices), depth=depth)
