"""Streaming batch runtime: worker pool + bounded queues.

Re-creation of the reference's L3 threading layer (SURVEY.md §2a #9-11):
a persistent pool of worker threads consuming a bounded work queue
(capacity 50,000), a bounded result channel (capacity 20,000) feeding a
Python iterator out of submission order, Done-pill batch termination
and an epoch barrier so one pool serves many successive map_batch
calls (/root/reference/src/lib.rs:535-636, 768-906, 922-992).

The TPU twist: where a reference worker maps ONE read per pop, a worker
here drains up to ``device_batch_size`` reads per pop and maps them as
one lock-step device batch — the queueing contract (capacities,
back-off, error text, out-of-order streaming) is preserved exactly.
Each work item carries its destination iterator, so results from
successive batches can never cross-route even while a previous batch
is still streaming out.
"""
from __future__ import annotations

import queue
import sys
import threading
import time
from typing import Any, Dict, List, Tuple

WORK_QUEUE_CAP = 50_000  # reference: work ArrayQueue::new(50000), lib.rs:429
RESULTS_QUEUE_CAP = 50_000  # reference: results ArrayQueue::new(50000), lib.rs:430
RESULT_CAP = 20_000  # reference: bounded channel(20000), lib.rs:950
# NB: total pipeline capacity work+results+channel = 120k is observable
# behaviour — the reference's 100k-read back-off test only passes because
# the three stages together can absorb the whole batch.

_DONE = ("__done__",)


class AlignmentBatchResultIter:
    """Streaming iterator over batch results (lib.rs:922-992 parity).

    Yields ``(mappings, data_dict)`` tuples as workers finish them —
    out of submission order; the caller's full input dict flows through
    untouched."""

    def __init__(self) -> None:
        self.channel: "queue.Queue" = queue.Queue(maxsize=RESULT_CAP)
        self.data: Dict[int, Dict[str, Any]] = {}
        self._n_threads = 0
        self._n_finished = 0
        # Disconnect flag: the reference's workers learn the iterator was
        # dropped through a failing channel send (lib.rs:822-826); Python
        # queues have no receiver-dropped signal, so workers poll this.
        self.closed = False

    def set_n_threads(self, n: int) -> None:
        self._n_threads = n

    def close(self) -> None:
        self.closed = True

    def __del__(self) -> None:
        self.closed = True

    def __iter__(self) -> "AlignmentBatchResultIter":
        return self

    def __next__(self):
        while True:
            item = self.channel.get()
            if item is _DONE:
                self._n_finished += 1
                if self._n_finished == self._n_threads:
                    self.closed = True
                    raise StopIteration
                continue
            mappings, id_num = item
            data = self.data.pop(id_num)
            return mappings, data


class WorkerPool:
    """Persistent worker threads over a shared bounded work queue."""

    def __init__(self, n_threads: int, map_fn, batch_size: int = 256):
        """map_fn(list[str]) -> list[list[Mapping]] (threaded path maps
        with cs=True, MD=False, as the reference hard-codes,
        lib.rs:587-592).

        ``map_fn``/``batch_size`` may also be per-worker lists of
        length ``n_threads`` — the multi-process runtime gives each
        worker thread a proxy to its own child process."""
        self.n_threads = n_threads
        if not isinstance(map_fn, (list, tuple)):
            map_fn = [map_fn] * n_threads
        if not isinstance(batch_size, (list, tuple)):
            batch_size = [batch_size] * n_threads
        self.map_fns = list(map_fn)
        self.batch_sizes = list(batch_size)
        self.map_fn = self.map_fns[0]  # back-compat alias
        self.batch_size = self.batch_sizes[0]
        self.work: "queue.Queue" = queue.Queue(maxsize=WORK_QUEUE_CAP)
        self.results: "queue.Queue" = queue.Queue(maxsize=RESULTS_QUEUE_CAP)
        self.stop = threading.Event()
        # epoch barrier state (the reference's dones vec + spin,
        # lib.rs:556-575): a Condition instead of threading.Barrier —
        # Barrier.wait(timeout) BREAKS the barrier when one worker's
        # map legitimately runs long (first-compile in a fresh child
        # process), double-counting Done pills; the reference spins
        # without any timeout.  This wait is unbounded but stop-aware.
        self._epoch_cv = threading.Condition()
        self._epoch_count = 0
        self._epoch_gen = 0
        self._threads = [
            threading.Thread(target=self._worker_loop, args=(i,), daemon=True)
            for i in range(n_threads)
        ]
        for t in self._threads:
            t.start()
        # collector: drains the results queue into each batch's bounded
        # iterator channel (the reference spawns one per map_batch,
        # lib.rs:798-839; a single long-lived one with sink-tagged items
        # is equivalent and cannot cross-route)
        self._collector = threading.Thread(target=self._collector_loop, daemon=True)
        self._collector.start()

    # -- producer side --------------------------------------------------
    def push_work(
        self,
        sink: AlignmentBatchResultIter,
        id_num: int,
        seq: str,
        back_off: bool,
    ) -> None:
        item = (sink, id_num, seq)
        try:
            self.work.put_nowait(item)
            return
        except queue.Full:
            pass
        if back_off:
            sleep = 0.05  # 50 ms * 2^i, 6 attempts (lib.rs:871-887)
            for _ in range(6):
                try:
                    self.work.put_nowait(item)
                    return
                except queue.Full:
                    time.sleep(sleep)
                    sleep *= 2
            print(
                f"Internal error adding data to work queue, with backoff. "
                f"Full {id_num}, Attempts: 6",
                file=sys.stderr,
            )
            # the read is dropped (reference parity) — reclaim its
            # stashed data dict so long-lived iterators don't leak
            sink.data.pop(id_num, None)
        else:
            raise RuntimeError(
                f"Internal error adding data to work queue, without backoff. "
                f"Full(..) {id_num}. Is your fastq batch larger than "
                f"{WORK_QUEUE_CAP}? Perhaps try `map_batch` with back_off=True?"
            )

    def push_done_pills(self, sink: AlignmentBatchResultIter) -> None:
        for _ in range(self.n_threads):
            self.work.put((sink, None, None))

    # -- worker side ----------------------------------------------------
    def _worker_loop(self, wi: int = 0) -> None:
        map_fn = self.map_fns[wi]
        batch_size = self.batch_sizes[wi]
        while not self.stop.is_set():
            try:
                first = self.work.get(timeout=0.05)
            except queue.Empty:
                continue
            sink = first[0]
            if first[1] is None:  # Done pill
                self._put_results_q(sink, _DONE)
                # epoch barrier: wait until every worker saw this batch's
                # Done so the next batch cannot mix (lib.rs:556-575)
                self._epoch_wait()
                continue
            items: List[Tuple[int, str]] = [(first[1], first[2])]
            while len(items) < batch_size:
                try:
                    nxt = self.work.get_nowait()
                except queue.Empty:
                    break
                if nxt[1] is None or nxt[0] is not sink:
                    # keep pills / next-batch items for the Done protocol
                    self.work.put(nxt)
                    break
                items.append((nxt[1], nxt[2]))
            if sink.closed:
                continue  # iterator dropped: discard silently
            try:
                results = map_fn([seq for _, seq in items])
            except Exception as exc:  # noqa: BLE001 — match lib.rs:621-623
                print(
                    f"Failed to map sequence in threaded implementation. {exc}",
                    file=sys.stderr,
                )
                continue
            for (id_num, _), mappings in zip(items, results):
                if not self._put_results_q(sink, (mappings, id_num)):
                    break

    def _epoch_wait(self) -> None:
        """All-workers-saw-Done rendezvous (lib.rs:556-575 semantics:
        spin until every thread marked done, no timeout; here a
        Condition so shutdown can interrupt the wait)."""
        with self._epoch_cv:
            gen = self._epoch_gen
            self._epoch_count += 1
            if self._epoch_count == self.n_threads:
                self._epoch_count = 0
                self._epoch_gen += 1
                self._epoch_cv.notify_all()
                return
            while self._epoch_gen == gen and not self.stop.is_set():
                self._epoch_cv.wait(timeout=0.5)

    def _put_results_q(self, sink: AlignmentBatchResultIter, item) -> bool:
        """Worker -> results queue (cap 50,000), dropping when the
        destination iterator is gone."""
        while not self.stop.is_set():
            if sink.closed and item is not _DONE:
                return False
            try:
                self.results.put((sink, item), timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _collector_loop(self) -> None:
        """results queue -> per-batch bounded channel (lib.rs:798-839)."""
        while not self.stop.is_set():
            try:
                sink, item = self.results.get(timeout=0.05)
            except queue.Empty:
                continue
            while not self.stop.is_set():
                if sink.closed:
                    if item is not _DONE:
                        print(
                            "Internal error returning data, the receiver "
                            "iterator has finished.",
                            file=sys.stderr,
                        )
                    break
                try:
                    sink.channel.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def shutdown(self) -> None:
        self.stop.set()
