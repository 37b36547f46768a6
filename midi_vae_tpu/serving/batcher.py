"""Micro-batching request queue for jitted inference.

TPU-shaped serving core: callers submit variable-size requests; a
background thread coalesces them into one padded batch per tick
(bounded by ``max_batch`` and ``max_wait_ms``), runs the jitted model
function ONCE per bucket-size (static shapes — no retraces), and slices
each caller's rows back out. Throughput comes from batching; latency is
bounded by the wait window.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


class MicroBatcher:
    """Coalesce per-request arrays into padded device batches.

    Parameters
    ----------
    fn : Callable[[np.ndarray], np.ndarray]
        The batched model function (normally a jitted closure over
        params). Called with [B, ...] input; must return [B, ...]
        results. B is always one of the static bucket sizes, so ``fn``
        compiles once per bucket.
    max_batch : int
        Upper bound on coalesced batch size per tick.
    max_wait_ms : float
        How long the batcher waits to fill a batch before dispatching
        what it has.
    """

    def __init__(
        self,
        fn: Callable,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
        item_shape: "tuple | None" = None,
        labeled: bool = False,
    ):
        self.fn = fn
        # labeled=True: each item carries an int label (conditional models —
        # q(z|x,y)); submit() takes (x, y) and ``fn`` is called as
        # ``fn(rows, labels)``. Labels batch/pad alongside the rows, so
        # requests for DIFFERENT classes still coalesce into one dispatch.
        self.labeled = labeled
        # clamp the cap to a bucket size so padding never exceeds it
        self.max_batch = _bucket(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        # per-item trailing shape contract: fixed up front when the caller
        # knows it (e.g. the server's [H, W, C]), else locked to the first
        # submitted request. Checked at submit() so a malformed request is
        # rejected at its own call site instead of poisoning the concat and
        # failing every co-batched waiter in the tick.
        self._item_shape = tuple(item_shape) if item_shape is not None else None
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._submit_lock = threading.Lock()  # serializes submit vs close drain
        self._carry = None  # item admitted from the queue but deferred to the next tick
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_dispatched = 0
        self.requests_served = 0

    def submit(self, x: np.ndarray, y: "np.ndarray | None" = None) -> Future:
        """Enqueue a [n, ...] request; resolves to the [n, ...] result.

        Raises ``ValueError`` immediately (in the caller's thread) when the
        request's per-item shape disagrees with the batcher's contract —
        other requests in flight are unaffected. Labeled batchers require
        ``y``: int labels, one per item.
        """
        x = np.asarray(x)
        if x.ndim < 1 or len(x) == 0:
            raise ValueError(f"request must be a non-empty [n, ...] array, got shape {x.shape}")
        if self.labeled:
            if y is None:
                raise ValueError("this batcher serves a conditional model: submit(x, y) needs labels")
            y = np.asarray(y, np.int32)
            if y.shape != (len(x),):
                raise ValueError(f"labels must be int [n={len(x)}], got shape {y.shape}")
        elif y is not None:
            raise ValueError("this batcher serves an unconditional model; drop the labels")
        fut: Future = Future()
        with self._submit_lock:
            # checked under the lock: close() drains under the same lock, so a
            # put can never land after the drain and hang its caller
            if self._stop.is_set():
                raise RuntimeError("batcher is closed")
            if self._item_shape is None:
                self._item_shape = tuple(x.shape[1:])  # first request sets the contract
            elif tuple(x.shape[1:]) != self._item_shape:
                raise ValueError(
                    f"request item shape {tuple(x.shape[1:])} does not match the "
                    f"batcher's item shape {self._item_shape}"
                )
            self._queue.put((x, y, fut))
        return fut

    def __call__(self, x: np.ndarray, y: "np.ndarray | None" = None) -> np.ndarray:
        return self.submit(x, y).result()

    def _loop(self):
        while not self._stop.is_set():
            if self._carry is not None:
                first, self._carry = self._carry, None
            else:
                try:
                    first = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
            pending = [first]
            total = len(first[0])
            deadline = _now() + self.max_wait
            while total < self.max_batch and _now() < deadline:
                try:
                    item = self._queue.get(timeout=max(0.0, deadline - _now()))
                except queue.Empty:
                    break
                if total + len(item[0]) > self.max_batch:
                    self._carry = item  # respect the cap; serve it next tick
                    break
                pending.append(item)
                total += len(item[0])
            self._dispatch(pending)
        # shutdown: a carry deferred mid-tick must not strand its waiter —
        # close() may have drained BEFORE this tick parked the item. Under
        # the submit lock so close()'s own carry handling cannot double-set.
        with self._submit_lock:
            if self._carry is not None:
                self._carry[2].set_exception(RuntimeError("batcher closed"))
                self._carry = None

    def _dispatch(self, pending: Sequence):
        try:
            batch = np.concatenate([x for x, _, _ in pending])
            labels = np.concatenate([y for _, y, _ in pending]) if self.labeled else None
            # A single submit may exceed max_batch (coalescing only caps
            # multi-request ticks) — run it as max_batch-sized chunks so
            # ``fn`` only ever sees bucket sizes <= max_batch: the compile
            # cache stays bounded and the cap is a true invariant.
            outs = []
            n_chunks = 0
            for start in range(0, len(batch), self.max_batch):
                rows = batch[start : start + self.max_batch]
                n = len(rows)
                size = _bucket(n)
                if size > n:  # pad to the bucket so shapes stay static
                    pad = np.zeros((size - n, *rows.shape[1:]), rows.dtype)
                    rows = np.concatenate([rows, pad])
                if self.labeled:
                    lab = labels[start : start + self.max_batch]
                    if size > n:
                        lab = np.concatenate([lab, np.zeros(size - n, lab.dtype)])
                    outs.append(np.asarray(self.fn(rows, lab))[:n])
                else:
                    outs.append(np.asarray(self.fn(rows))[:n])
                n_chunks += 1
            out = outs[0] if len(outs) == 1 else np.concatenate(outs)
        except Exception as e:  # propagate (incl. shape-mismatch concat errors)
            # to every waiter; the dispatcher thread itself must survive
            for _, _, fut in pending:
                fut.set_exception(e)
            return
        # counters first: a caller woken by result() must see them updated.
        # one count per device batch (an oversized submit dispatches several
        # chunks), so /healthz occupancy math stays honest
        self.batches_dispatched += n_chunks
        self.requests_served += len(pending)
        offset = 0
        for x, _, fut in pending:
            fut.set_result(out[offset : offset + len(x)])
            offset += len(x)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)
        with self._submit_lock:  # no submit can interleave with the drain
            if self._carry is not None:
                self._carry[2].set_exception(RuntimeError("batcher closed"))
                self._carry = None
            while True:
                try:
                    *_, fut = self._queue.get_nowait()
                    fut.set_exception(RuntimeError("batcher closed"))
                except queue.Empty:
                    break


def _now() -> float:
    import time

    return time.monotonic()
