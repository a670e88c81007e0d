"""Host-side batch loader: threaded prefetch, per-host sharding, NHWC stacks.

Replaces torch ``DataLoader(num_workers=16, shuffle, drop_last, pin_memory)``
(core/stereo_datasets.py:537-538) with a torch-free pipeline designed for the
TPU ingest path:

  - worker threads decode/augment (cv2/PIL drop the GIL for the heavy parts),
  - each worker owns a seeded ``numpy.random.Generator`` — deterministic,
    non-overlapping augmentation streams (the property the reference gets
    from per-worker seeding at core/stereo_datasets.py:70-76),
  - per-host sharding for multi-host DP: each host draws only its slice of
    every global batch (same global shuffle via the shared epoch seed), so
    ``batch_size`` here is the GLOBAL batch; the host materializes B/num_hosts
    rows which the caller device_puts onto its local mesh slice,
  - bounded prefetch (semaphore permits) overlaps augmentation with device
    compute while capping produced-but-unconsumed batches at ``prefetch``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from typing import Iterator

import numpy as np

# process-pool worker state (initialized once per worker process)
_WORKER_DS = None


def _proc_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _proc_batch(args):
    indices, seed_tuple = args
    rng = np.random.default_rng(seed_tuple)
    samples = [_WORKER_DS.get_sample(int(i), rng) for i in indices]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class StereoLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 1234,
        prefetch: int = 4,
        num_hosts: int = 1,
        host_id: int = 0,
        use_processes: bool = False,
        collate_fn=None,
    ):
        assert batch_size % num_hosts == 0, "global batch must divide across hosts"
        # custom collate (the torch DataLoader collate_fn affordance the
        # reference's NerfStereo.collate_fn needs, core/stereo_datasets.py:449)
        # — threaded path only: a collate closure is not generally picklable
        if collate_fn is not None and use_processes:
            raise ValueError(
                "collate_fn requires the threaded loader (use_processes=False):"
                " a collate closure is not picklable across process-pool"
                " workers. MixedStereoLoader always passes one, so mixed"
                " bi/tri loading is thread-pool only."
            )
        self.collate_fn = collate_fn or (
            lambda samples: {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // num_hosts
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_hosts = num_hosts
        self.host_id = host_id
        # Process workers sidestep the GIL for the cv2/PIL-heavy augmentation
        # (the torch DataLoader's fork-worker model); threads remain the
        # default for low-latency small jobs and picklability safety.
        self.use_processes = use_processes
        self.epoch = 0
        self._pool = None

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            # multi-host: the ragged tail cannot shard into equal per-host
            # slices (later hosts would get short or empty local batches and
            # the cross-host collectives would see mismatched shapes) — the
            # tail is dropped regardless of drop_last there
            if self.num_hosts == 1:
                n += 1
        return n

    def close(self):
        """Shut down the process pool (kept across epochs for reuse).
        Without this, interpreter teardown races the executor's management
        thread and logs a spurious weakref traceback."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _iter_processes(self, indices, nb) -> Iterator[dict]:
        if self._pool is None:
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_proc_init,
                initargs=(self.dataset,),
            )
        jobs = []
        for b in range(nb):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            local = chunk[self.host_id * self.local_batch : (self.host_id + 1) * self.local_batch]
            jobs.append((local, (self.seed, self.epoch, self.host_id, b)))
        # Sliding submit window: ≤ num_workers running + ≤ prefetch completed
        # batches buffered ahead of the consumer (pool.map would schedule the
        # whole epoch and buffer every completed batch).
        from collections import deque

        window: deque = deque()
        it = iter(jobs)
        try:
            for job in it:
                window.append(self._pool.submit(_proc_batch, job))
                if len(window) >= self.prefetch + self.num_workers:
                    break
            while window:
                yield window.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    window.append(self._pool.submit(_proc_batch, nxt))
        finally:
            for f in window:
                f.cancel()
        self.epoch += 1

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        nb = len(self)
        if self.use_processes:
            yield from self._iter_processes(indices, nb)
            return
        job_q: "queue.Queue" = queue.Queue()

        # batch b, local rows [host_id*local : (host_id+1)*local]
        for b in range(nb):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            local = chunk[self.host_id * self.local_batch : (self.host_id + 1) * self.local_batch]
            job_q.put((b, local))

        results: dict[int, dict] = {}
        results_lock = threading.Lock()
        stop = threading.Event()
        errors: list[BaseException] = []
        # Backpressure: a worker must hold one of `prefetch` permits from the
        # moment it starts augmenting a batch until the consumer takes it, so
        # produced-but-unconsumed batches never exceed `prefetch` (the bound
        # torch gets from DataLoader's prefetch_factor,
        # core/stereo_datasets.py:537-538).
        permits = threading.Semaphore(self.prefetch)

        def worker(wid: int):
            rng = np.random.default_rng(
                (self.seed, self.epoch, self.host_id, wid)
            )
            while not stop.is_set():
                # permit BEFORE job pickup: since job_q is drained in order,
                # permit holders are always the earliest pending batches —
                # the consumer (in-order) can always make progress.
                while not permits.acquire(timeout=0.05):
                    if stop.is_set():
                        return
                try:
                    b, local = job_q.get_nowait()
                except queue.Empty:
                    permits.release()
                    return
                try:
                    samples = [self.dataset.get_sample(int(i), rng) for i in local]
                    batch = self.collate_fn(samples)
                except BaseException as e:  # surface to the consumer: a dead
                    # worker holding a permit would otherwise deadlock the
                    # in-order consumer silently (e.g. one corrupt image file)
                    permits.release()
                    errors.append(e)
                    stop.set()
                    return
                with results_lock:
                    results[b] = batch

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            next_b = 0
            while next_b < nb:
                with results_lock:
                    batch = results.pop(next_b, None)
                if batch is None:
                    if errors:
                        raise errors[0]
                    if not any(t.is_alive() for t in threads) and job_q.empty():
                        with results_lock:
                            batch = results.pop(next_b, None)
                        if batch is None:
                            raise RuntimeError("loader workers died")
                    else:
                        threading.Event().wait(0.005)
                        continue
                permits.release()
                yield batch
                next_b += 1
        finally:
            stop.set()
        self.epoch += 1


class _MixedView:
    """Flat index space over a binocular pool [0, n_bi) followed by a
    trinocular pool [n_bi, n_bi+n_tri) — the dispatching dataset handed to
    the StereoLoader machinery by :class:`MixedStereoLoader`."""

    def __init__(self, bi_dataset, tri_dataset):
        self.bi, self.tri = bi_dataset, tri_dataset
        self.n_bi = len(bi_dataset) if bi_dataset is not None else 0
        self.n_tri = len(tri_dataset) if tri_dataset is not None else 0

    def get_sample(self, index, rng=None):
        if index < self.n_bi:
            return self.bi.get_sample(index, rng)
        return self.tri.get_sample(index - self.n_bi, rng)

    def __len__(self):
        return self.n_bi + self.n_tri


class MixedStereoLoader(StereoLoader):
    """Joint binocular + trinocular batches with a STATIC modality split.

    The reference assembles mixed batches with ``NerfStereo.collate_fn``
    (core/stereo_datasets.py:449-480) under torch's default sampler, so the
    bi/tri counts vary per batch — ragged shapes a jitted TPU step cannot
    take. TPU-native redesign: every global batch holds exactly ``nb``
    binocular and ``nt`` trinocular samples (proportional to pool sizes by
    default), drawn from independently shuffled pools, and every host's
    local slice holds exactly ``nb/num_hosts`` + ``nt/num_hosts`` — one
    compiled train step for the whole run. Batches still carry the
    reference's collate contract: ``{im1_forward, im2_forward, bi: {flow,
    valid}, tri: {flow, conf, im0, im1, im2}}`` (see
    data/triplet.py::collate_mixed).
    """

    def __init__(self, bi_dataset, tri_dataset, batch_size: int,
                 num_tri: int | None = None, **kw):
        from dkt_stereo_tpu.data.triplet import collate_mixed

        view = _MixedView(bi_dataset, tri_dataset)
        super().__init__(
            view, batch_size, collate_fn=lambda s: collate_mixed(s)[0], **kw
        )
        if num_tri is None:
            if view.n_bi == 0:
                num_tri = batch_size
            elif view.n_tri == 0:
                num_tri = 0
            else:
                frac = view.n_tri / (view.n_bi + view.n_tri)
                num_tri = int(np.clip(round(batch_size * frac), 1, batch_size - 1))
        if not 0 <= num_tri <= batch_size:
            raise ValueError(f"num_tri {num_tri} outside [0, {batch_size}]")
        if (num_tri and view.n_tri == 0) or (batch_size - num_tri and view.n_bi == 0):
            raise ValueError(
                f"split nb={batch_size - num_tri}/nt={num_tri} draws from an "
                f"empty pool (n_bi={view.n_bi}, n_tri={view.n_tri})"
            )
        self.nt = num_tri
        self.nb = batch_size - num_tri
        if self.nb % self.num_hosts or self.nt % self.num_hosts:
            raise ValueError(
                f"modality split nb={self.nb}/nt={self.nt} must divide across "
                f"{self.num_hosts} hosts (each local batch needs the same "
                "static composition)"
            )

    def __len__(self):
        n = []
        if self.nb:
            n.append(self.dataset.n_bi // self.nb)
        if self.nt:
            n.append(self.dataset.n_tri // self.nt)
        return min(n)

    def _epoch_indices(self) -> np.ndarray:
        rs = np.random.RandomState(self.seed + self.epoch)
        bi = np.arange(self.dataset.n_bi)
        tri = self.dataset.n_bi + np.arange(self.dataset.n_tri)
        if self.shuffle:
            rs.shuffle(bi)
            rs.shuffle(tri)
        nbatch = len(self)
        nb_l = self.nb // self.num_hosts
        nt_l = self.nt // self.num_hosts
        # per-batch block = [host0: nb_l bi + nt_l tri | host1: ... ] so the
        # base class's contiguous per-host slice gets the static composition
        out = np.empty(nbatch * self.batch_size, np.int64)
        pos = 0
        for b in range(nbatch):
            for h in range(self.num_hosts):
                bsrc = b * self.nb + h * nb_l
                tsrc = b * self.nt + h * nt_l
                out[pos : pos + nb_l] = bi[bsrc : bsrc + nb_l]
                pos += nb_l
                out[pos : pos + nt_l] = tri[tsrc : tsrc + nt_l]
                pos += nt_l
        return out
