"""Iteration + prefetch.

Replaces the reference's BlobFetcher (reference: dataloader.py:680-743 — a
torch DataLoader with worker processes, order-preserving sampler, and an
index-match assert) with a thread-pool prefetcher: label synthesis is numpy
(releases the GIL) or native C++, so threads overlap cleanly with the
device step without pickling whole batches across processes.

Iterator semantics match the reference: per-split epoch order reshuffled on
wrap (dataloader.py:707-708), `wrapped` flag on the batch, restorable
iterator/order state for mid-epoch resume (train.py:162-163).  Checkpoint
state is tracked on the CONSUMER side — the prefetch thread runs ahead, so
the producer cursor would over-count queued-but-unconsumed items.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, List, Tuple

import numpy as np

from echr_tpu.config import Config
from echr_tpu.data.batcher import BatchMeta, VideoBatch, make_batch
from echr_tpu.data.dataset import BaseDataset


def _derived_seed(base: int, split: str, epoch: int, pos: int) -> int:
    """Deterministic per-item seed from (base_seed, split, epoch, position).

    Replaces draws from a shared RandomState stream: a stream's draw order
    depended on producer run-ahead and on WHEN other splits' fetchers ran
    (an in-training eval advanced the stream, changing every later train
    sample), so runs differed with eval cadence and resume could not
    reproduce a sample.  Derived seeds are independent of all of that and
    identical on every process of a replicated multi-host pipeline."""
    import zlib

    return zlib.crc32(f"{base}:{split}:{epoch}:{pos}".encode()) & 0x7FFFFFFF


def _process_info():
    """(process_index, process_count) from an already-initialised jax
    runtime; (0, 1) when jax is absent or single-process."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class Loader:
    def __init__(
        self,
        dataset: BaseDataset,
        cfg: Config,
        prefetch: int = None,
        seed: int = 0,
        process_index: int = None,
        process_count: int = None,
        shard_splits: Tuple[str, ...] = ("train",),
    ):
        self.dataset = dataset
        self.cfg = cfg
        if prefetch is None:  # default from config (cfg.data.prefetch)
            prefetch = int(getattr(cfg.data, "prefetch", 4))
        self.prefetch = max(1, prefetch)
        self.base_seed = int(seed)  # per-item seeds derive from this
        self.rng = np.random.RandomState(seed)  # direct _make() fallback only
        # multi-host data sharding (net-new vs the reference, SURVEY §5.8):
        # each process iterates a strided shard of the split so data-parallel
        # rows across hosts see disjoint videos.  Defaults resolve from the
        # jax runtime; eval splits stay full for checkpoint-gating scores.
        if process_index is None or process_count is None:
            auto_ix, auto_n = _process_info()
            process_index = auto_ix if process_index is None else process_index
            process_count = auto_n if process_count is None else process_count
        self.process_index, self.process_count = process_index, process_count
        # labels=False: decode-only eval fast path — make_batch skips the
        # training-label synthesis (IoU grid / sampling / caption packing).
        # Tracked PER SPLIT so a decode-only val eval can never poison a
        # concurrently prefetching train fetcher with zeroed label grids;
        # set via set_labels(split=...) before reset_iterator (a fetcher
        # already running keeps producing full batches for a short overlap,
        # which is a harmless superset).
        self._labels: Dict[str, bool] = {}
        self._feats_dtype: Dict[str, Any] = {}  # split -> np dtype or None
        # producer-side state
        self.iterators: Dict[str, int] = {s: 0 for s in dataset.split_ix}
        self.split_order: Dict[str, List[int]] = {
            s: (
                list(ix[process_index::process_count])
                if process_count > 1 and s in shard_splits
                else list(ix)
            )
            for s, ix in dataset.split_ix.items()
        }
        # per-split epoch counters (seed derivation + checkpoint state)
        self.epochs: Dict[str, int] = {s: 0 for s in dataset.split_ix}
        self._shuffle_if_needed("train", epoch=0)
        # consumer-side state (what checkpoints must capture):
        # split -> (next position, epoch order, epoch counter)
        self._consumed: Dict[str, Tuple[int, List[int], int]] = {}
        self._fetchers: Dict[str, "_Prefetcher"] = {}

    # -- iterator state (checkpointable, reference: train.py:477,493) --------

    def state(self) -> Dict:
        """Consumer-side positions: resuming replays exactly the items the
        training loop had not yet consumed, with the exact per-item seeds
        (base_seed + epoch counters are part of the state).  At an epoch
        boundary the cursor carries the NEXT epoch's shuffled order, so a
        resumed run continues with the same fresh permutation a
        non-resumed run would have used."""
        iterators = dict(self.iterators)
        orders = {k: list(v) for k, v in self.split_order.items()}
        epochs = dict(self.epochs)
        # list(): the train prep thread snapshots state() while the main
        # thread's gating eval may insert the "val" entry concurrently
        for split, (pos, order, epoch) in list(self._consumed.items()):
            iterators[split] = pos
            orders[split] = list(order)
            epochs[split] = epoch
        return {"iterators": iterators, "split_order": orders,
                "epochs": epochs, "base_seed": self.base_seed}

    def load_state(self, st: Dict) -> None:
        # stop (and JOIN) fetchers BEFORE mutating producer state: a racing
        # worker could otherwise advance the just-restored cursor
        self._restart_fetchers()
        self.iterators.update(st.get("iterators", {}))
        for k, v in st.get("split_order", {}).items():
            self.split_order[k] = list(v)
        self.epochs.update(st.get("epochs", {}))
        self.base_seed = int(st.get("base_seed", self.base_seed))
        self._consumed.clear()

    # ------------------------------------------------------------------

    def _shuffle_if_needed(self, split: str, epoch: int) -> None:
        if split == "train" and self.cfg.data.shuffle:
            np.random.RandomState(
                _derived_seed(self.base_seed, split + "/order", epoch, 0)
            ).shuffle(self.split_order[split])

    def reset_iterator(self, split: str) -> None:
        # stop+join first (see load_state), then reset
        if split in self._fetchers:
            self._fetchers[split].stop()
            del self._fetchers[split]
        self.iterators[split] = 0
        self.epochs[split] = 0
        self._consumed.pop(split, None)

    def _restart_fetchers(self) -> None:
        for f in self._fetchers.values():
            f.stop()
        self._fetchers.clear()

    def __len__(self) -> int:
        return len(self.dataset)

    def split_size(self, split: str) -> int:
        return len(self.split_order[split])

    def _make(self, ix: int, seed: int = None,
              labels: bool = True) -> Tuple[VideoBatch, BatchMeta]:
        ex = self.dataset.get_example(ix)
        # per-example rng keyed by global rng draw for reproducible sampling;
        # under the thread pool the draw happens at position-assignment time
        # (in epoch order, under the lock) and is passed in as `seed`
        if seed is None:
            seed = self.rng.randint(0, 2**31 - 1)
        sub = np.random.RandomState(seed)
        sota_fn = None
        if getattr(self.dataset, "sota_proposals", None) or getattr(
            self.dataset, "_synthetic_sota", False
        ):
            # duration comes back from make_batch as the EFFECTIVE duration
            # of the retained frame prefix (== ex.duration unless the video
            # is longer than the max time bucket)
            sota_fn = lambda nfeats, duration: self.dataset.get_sota(  # noqa: E731
                ex.vid, nfeats, duration)
        return make_batch(ex, self.cfg, sub, w1=self.dataset.w1, sota_fn=sota_fn,
                          labels=labels)

    def set_labels(self, labels: bool, split: str) -> None:
        """Toggle the decode-only fast path for ONE split
        (see make_batch labels=False)."""
        self._labels[split] = bool(labels)

    def set_feats_dtype(self, dtype, split: str) -> None:
        """Emit batch.feats in `dtype` (e.g. ml_dtypes.bfloat16) for ONE
        split: moves the transfer-dtype cast into the prefetch workers,
        off the consumer thread (None restores float32).  Like set_labels,
        in-flight items keep the previous dtype for a short overlap —
        consumers must accept either (the batched eval pipeline casts
        only when the dtype still differs)."""
        self._feats_dtype[split] = dtype

    def feats_dtype_for(self, split: str):
        return self._feats_dtype.get(split)

    def labels_for(self, split: str) -> bool:
        return self._labels.get(split, True)

    def get_batch(self, split: str) -> Tuple[VideoBatch, BatchMeta]:
        if split not in self._fetchers:
            n_threads = max(1, int(getattr(self.cfg.data, "nthreads", 1)))
            self._fetchers[split] = _Prefetcher(self, split, self.prefetch, n_threads)
        batch, meta, resume = self._fetchers[split].get()
        # consumer cursor: (next position, order, epoch) to replay on
        # resume — at a wrap this is the NEXT epoch's freshly shuffled
        # order, not the completed epoch's permutation
        self._consumed[split] = resume
        return batch, meta

    def find_video(self, vid: str, split: str = "train", max_iters: int = None):
        """Debug helper: iterate until a specific video comes up
        (reference: get_v_GwIHO7HpGkY, dataloader.py:673-677)."""
        limit = max_iters or 2 * self.split_size(split)
        for _ in range(limit):
            batch, meta = self.get_batch(split)
            if meta.vid == vid:
                return batch, meta
        raise LookupError(f"video {vid!r} not seen in {limit} fetches")


class _Prefetcher:
    """Bounded background producer pool for one split.

    n_threads workers build batches concurrently (the reference's
    `num_workers=opt.nthreads` BlobFetcher, dataloader.py:711-718 — threads
    instead of processes: label synthesis is numpy/C++ and releases the
    GIL).  Items are handed to the consumer in STRICT epoch order through a
    reorder buffer, preserving the reference's order-preserving-sampler
    semantics and the checkpointable (position, epoch-order) provenance."""

    def __init__(self, loader: Loader, split: str, depth: int, n_threads: int = 1):
        self.loader = loader
        self.split = split
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error = None  # first worker exception; re-raised by get()
        self._stop = threading.Event()
        self._lock = threading.Lock()  # guards position assignment
        self._seq = 0  # next sequence number to assign
        self._emit = 0  # next sequence number to emit
        self._buf: Dict[int, Tuple] = {}
        self._buf_cv = threading.Condition()
        self._max_buf = depth + n_threads
        self.threads = [
            threading.Thread(target=self._run, daemon=True) for _ in range(max(1, n_threads))
        ]
        for t in self.threads:
            t.start()

    def _next_position(self):
        """Assign the next (seq, pos, order, ix, wrapped, seed, resume)
        under the lock and advance the loader's producer cursor (wrap ->
        epoch counter + reshuffle).  `seed` is derived from
        (base_seed, split, epoch, pos) — see _derived_seed; `resume` is
        the consumer-cursor tuple for checkpoint state."""
        ld = self.loader
        with self._lock:
            pos = ld.iterators[self.split]
            order = ld.split_order[self.split]
            epoch = ld.epochs[self.split]
            ix = order[pos]
            wrapped = pos + 1 >= len(order)
            seq = self._seq
            self._seq += 1
            seed = _derived_seed(ld.base_seed, self.split, epoch, pos)
            if wrapped:
                ld.iterators[self.split] = 0
                ld.epochs[self.split] = epoch + 1
                # reshuffle produces a NEW list; in-flight items keep theirs
                ld.split_order[self.split] = list(order)
                ld._shuffle_if_needed(self.split, epoch + 1)
                resume = (0, ld.split_order[self.split], epoch + 1)
            else:
                ld.iterators[self.split] = pos + 1
                resume = (pos + 1, order, epoch)
            return seq, pos, order, ix, wrapped, seed, resume

    def _run(self) -> None:
        try:
            self._run_inner()
        except BaseException as e:
            # surface instead of dying silently: a dead worker stalls the
            # reorder buffer at its seq and get() would spin on Empty
            # forever — store the exception and wake everyone so the
            # consumer re-raises it (corrupt .npy, h5 read error, ...)
            if self.error is None:
                self.error = e
            with self._buf_cv:
                self._buf_cv.notify_all()

    def _run_inner(self) -> None:
        ld = self.loader
        while not self._stop.is_set():
            # backpressure: don't run ahead of the consumer unboundedly
            with self._buf_cv:
                while (
                    not self._stop.is_set()
                    and self._seq - self._emit >= self._max_buf
                ):
                    self._buf_cv.wait(timeout=0.25)
            if self._stop.is_set():
                return
            seq, pos, order, ix, wrapped, seed, resume = self._next_position()
            batch, meta = ld._make(ix, seed, labels=ld.labels_for(self.split))
            fdt = ld.feats_dtype_for(self.split)
            if fdt is not None and batch.feats.dtype != fdt:
                # transfer-dtype cast in the worker (off the consumer thread)
                batch = batch._replace(feats=batch.feats.astype(fdt))
            meta.wrapped = wrapped
            with self._buf_cv:
                self._buf[seq] = (batch, meta, resume)
                self._buf_cv.notify_all()
            # drain the reorder buffer head into the consumer queue
            while not self._stop.is_set():
                with self._buf_cv:
                    if self._emit not in self._buf:
                        break
                    item = self._buf.pop(self._emit)
                try:
                    self.q.put(item, timeout=0.25)
                except queue.Full:
                    with self._buf_cv:
                        self._buf[self._emit] = item  # put back, retry later
                    continue
                with self._buf_cv:
                    self._emit += 1
                    self._buf_cv.notify_all()

    def get(self):
        while True:
            try:
                item = self.q.get(timeout=0.25)
            except queue.Empty:
                if self.error is not None:
                    raise self.error
                if self._stop.is_set():
                    raise
                continue
            # wake producers immediately: they sleep on _buf_cv with a
            # 0.25s poll, and a batched consumer draining a whole group in
            # one burst would otherwise pay that wakeup latency per group
            with self._buf_cv:
                self._buf_cv.notify_all()
            return item

    def stop(self) -> None:
        """Stop AND JOIN the workers: callers mutate loader producer state
        right after stop(), and an unjoined worker mid-_next_position
        could advance a freshly reset cursor or reshuffle a just-restored
        order (review r3 fourth session)."""
        self._stop.set()
        with self._buf_cv:
            self._buf_cv.notify_all()
        try:
            while True:
                self.q.get_nowait()  # unblock producers stuck on a full q
        except queue.Empty:
            pass
        for t in self.threads:
            t.join(timeout=10.0)
            if t.is_alive():
                # a _make() slower than the join window (cold native build,
                # huge video) leaves this worker finishing against the
                # discarded fetcher while the caller mutates producer state
                # — benign today (workers only touch fetcher-local state
                # after the cursor), but surface it so a silent overlap is
                # detectable (ADVICE r3)
                import logging

                logging.getLogger("echr_tpu.loader").warning(
                    "prefetch worker %s still alive after a 10s join — it "
                    "will finish against the stopped fetcher", t.name)
        try:
            while True:
                self.q.get_nowait()  # drop anything pushed while exiting
        except queue.Empty:
            pass
