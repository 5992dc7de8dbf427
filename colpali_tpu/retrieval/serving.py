"""Serving-side search dispatch: routing + micro-batching.

The reference has no serving layer (SURVEY.md §1); this module is the
concurrency story for ours. Two measured facts drive the design
(docs/PERF.md "Two-tier" table):

- the two-tier (binary prefilter) path wins only for SMALL query batches:
  at B=1 it is ~7x faster than exact scoring, but by B=8 the exact sweep's
  amortization has flipped the order (58.9 ms tiered vs 16.7 ms exact on
  1M pages);
- one exact sweep over B queries costs barely more than over one query
  (the corpus-side HBM traffic dominates and is shared), so concurrent
  B=1 requests are cheapest when merged into ONE device call.

Hence:

- :func:`route` — pick the kernel per sweep: tiered for small batches on a
  prefilter index, exact otherwise.
- :class:`MicroBatcher` — aggregate concurrent search requests within a
  short linger window into one device sweep. A single dispatcher thread
  owns the device; callers block on an event. This replaces
  lock-serialized per-request dispatch: serialization becomes batching,
  and bigger merged batches auto-route to the exact kernel (which is
  exactly when it wins).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import List, Optional, Sequence, Tuple

import numpy as np

#: merged-batch size above which the exact sweep beats the two-tier path
#: (docs/PERF.md: crossover is between B=4 and B=8 on the 1M-page index)
DEFAULT_EXACT_THRESHOLD = 4


def route(index, n_queries: int, mode: str = "auto",
          exact_threshold: int = DEFAULT_EXACT_THRESHOLD) -> str:
    """Resolve the kernel for a sweep of ``n_queries``.

    mode: ``"auto"`` (batch-size heuristic), ``"exact"`` (force full
    sweep), ``"tiered"`` (force prefilter; error if the index has none).
    Returns ``"exact"`` or ``"tiered"``.
    """
    if mode == "exact":
        return "exact"
    if mode == "tiered":
        if index.prefilter is None:
            raise ValueError("mode='tiered' requires an index built with a prefilter")
        return "tiered"
    if mode != "auto":
        raise ValueError(f"unknown mode {mode!r}; expected auto|exact|tiered")
    if index.prefilter is None or n_queries > exact_threshold:
        return "exact"
    return "tiered"


def run_search(index, queries: Sequence[np.ndarray], k: int,
               candidates: Optional[int] = None, mode: str = "auto",
               exact_threshold: int = DEFAULT_EXACT_THRESHOLD,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """One routed sweep: ``(scores, doc_ids)`` for all ``queries``."""
    kernel = route(index, len(queries), mode, exact_threshold)
    if kernel == "exact":
        return index.exact_search(queries, k=k) if index.prefilter is not None \
            else index.search(queries, k=k)
    return index.search(queries, k=k, candidates=candidates)


def _k_bucket(k: int, num_docs: int) -> int:
    """Round ``k`` up to a power of two (min 16), capped at the corpus size.

    ``lax.top_k``'s k is a static shape: merged sweeps whose requests ask
    for arbitrary k values would each compile a fresh executable. Bucketing
    bounds the compile count; callers slice their own k back out (top-k at
    a larger k is a prefix-superset, so results are unchanged)."""
    b = 16
    while b < k:
        b *= 2
    return min(b, num_docs)


class QueryEncoder:
    """In-process text-query encoding for text-in serving.

    The reference's serving story stops at "produce embeddings client-side"
    (README.md:68-106 is a python snippet); a retrieval server that cannot
    take a query STRING is incomplete, so this wraps a loaded retriever
    (``colpali_tpu.load_retriever`` output — typically stored-int8 weights)
    into a static-shape jitted encode:

    - batch size pads to a power-of-two bucket (pad rows replicate row 0 —
      never all-masked rows, which can NaN an attention softmax),
    - the token axis zero-pads on the RIGHT to a power-of-two bucket
      (safe regardless of the family's own padding side: masked keys are
      never attended, and Col* forwards multiply outputs by the mask),

    so live traffic only ever sees ``log2(max_batch) x few`` compiled
    executables, all warmable at boot. ``encode`` returns per-query
    ``(tokens_i, dim)`` float32 arrays — exactly what
    :meth:`MicroBatcher.search` takes.
    """

    def __init__(self, model, variables, processor, max_batch: int = 32,
                 token_bucket_min: int = 32):
        import jax

        self.model = model
        self.variables = variables
        self.processor = processor
        self.max_batch = max_batch
        self.token_bucket_min = token_bucket_min
        self._fwd = jax.jit(lambda v, b: model.apply(v, **b))

    @staticmethod
    def _bucket(n: int, start: int = 1) -> int:
        b = start
        while b < n:
            b *= 2
        return b

    def _pad_static(self, batch: dict) -> tuple:
        """Pad a processed text batch to (batch bucket, token bucket)."""
        batch = {k: np.asarray(v) for k, v in batch.items()}
        n, t = batch["input_ids"].shape
        nb = self._bucket(n)
        tb = self._bucket(t, self.token_bucket_min)
        out = {}
        for k, v in batch.items():
            if v.ndim == 3 and v.shape[1] == n:  # (3, B, T) rope positions
                v = np.concatenate([v, np.repeat(v[:, :1], nb - n, axis=1)], axis=1)
                v = np.pad(v, ((0, 0), (0, 0), (0, tb - v.shape[2])))
            elif v.ndim >= 1 and v.shape[0] == n:  # (B, T...) token arrays
                v = np.concatenate([v, np.repeat(v[:1], nb - n, axis=0)], axis=0)
                if v.ndim >= 2 and v.shape[1] == t:
                    pad = [(0, 0)] * v.ndim
                    pad[1] = (0, tb - t)
                    v = np.pad(v, pad)
            out[k] = v
        return out, n

    def encode(self, texts: Sequence[str]) -> List[np.ndarray]:
        """Texts -> per-query L2-normalized multi-vector embeddings."""
        if not texts:
            raise ValueError("empty text batch")
        if len(texts) > self.max_batch:
            parts = []
            for i in range(0, len(texts), self.max_batch):
                parts.extend(self.encode(texts[i : i + self.max_batch]))
            return parts
        feed, n = self._pad_static(self.processor.process_queries(list(texts)))
        import jax.numpy as jnp

        out = np.asarray(
            self._fwd(self.variables, {k: jnp.asarray(v) for k, v in feed.items()}),
            np.float32,
        )
        mask = feed["attention_mask"].astype(bool)
        return [out[i][mask[i]] for i in range(n)]

    def warmup(self) -> None:
        """Compile every batch bucket at the default token bucket. Queries
        longer than ``token_bucket_min`` tokens hit the next token bucket —
        a one-off compile per (batch, token) pair, same policy as
        :meth:`MicroBatcher.warmup`."""
        b = 1
        while b <= self.max_batch:
            self.encode(["warmup query"] * b)
            b *= 2


class _PendingTexts:
    __slots__ = ("texts", "event", "embeddings", "error")

    def __init__(self, texts):
        self.texts = texts
        self.event = threading.Event()
        self.embeddings = None
        self.error: Optional[BaseException] = None


class EncodeBatcher:
    """Merge concurrent text-encode requests into single device forwards.

    The search side already merges via :class:`MicroBatcher`; without this,
    text-in serving pays one encode DISPATCH per request and the device
    serializes them (per-dispatch RPC alone caps QPS on remote-attached
    chips). Same design: a dispatcher thread drains the queue, batches up
    to ``max_texts`` within a linger window, and runs ONE
    :meth:`QueryEncoder.encode` (whose static bucket shapes keep every
    merged size warmable)."""

    def __init__(self, encoder: QueryEncoder, window_ms: float = 2.0,
                 max_texts: Optional[int] = None):
        self.encoder = encoder
        self.window = window_ms / 1e3
        self.max_texts = max_texts or encoder.max_batch
        self._queue: deque[_PendingTexts] = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="encode-microbatcher")
        self._thread.start()

    def encode(self, texts: Sequence[str]) -> List[np.ndarray]:
        """Blocking; safe from many threads. Returns per-text embeddings."""
        if not texts:
            raise ValueError("empty text batch")
        p = _PendingTexts(list(texts))
        with self._cv:
            if self._closed:
                raise RuntimeError("EncodeBatcher is closed")
            self._queue.append(p)
            self._cv.notify()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.embeddings

    def warmup(self) -> None:
        self.encoder.warmup()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if not self._queue:
                    return
                batch = [self._queue.popleft()]
            total = len(batch[0].texts)
            deadline = time.perf_counter() + self.window
            while total < self.max_texts:
                remaining = deadline - time.perf_counter()
                with self._cv:
                    if not self._queue:
                        if remaining <= 0 or self._closed:
                            break
                        self._cv.wait(remaining)
                    while self._queue and total < self.max_texts:
                        nxt = self._queue[0]
                        if total + len(nxt.texts) > self.max_texts and batch:
                            total = self.max_texts
                            break
                        batch.append(self._queue.popleft())
                        total += len(nxt.texts)
            try:
                flat: List[str] = []
                for p in batch:
                    flat.extend(p.texts)
                embs = self.encoder.encode(flat)
                row = 0
                for p in batch:
                    p.embeddings = embs[row : row + len(p.texts)]
                    row += len(p.texts)
            except BaseException as exc:  # noqa: BLE001 — delivered to each caller
                for p in batch:
                    p.error = exc
            finally:
                for p in batch:
                    p.event.set()


class _Pending:
    __slots__ = ("queries", "k", "candidates", "mode", "event", "scores", "ids", "error")

    def __init__(self, queries, k, candidates, mode):
        self.queries = queries
        self.k = k
        self.candidates = candidates
        self.mode = mode
        self.event = threading.Event()
        self.scores = None
        self.ids = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Merge concurrent search requests into single device sweeps.

    Args:
        index: a :class:`~colpali_tpu.retrieval.CorpusIndex`.
        window_ms: linger after the first queued request before dispatch —
            the latency spent fishing for mergeable concurrent requests.
            0 disables lingering (requests still merge if they pile up
            while a sweep is in flight, which is where most merging comes
            from under real load).
        max_queries: cap on merged queries per sweep.
        exact_threshold: see :func:`route`.
        lock: optional lock held during each sweep — share it with index
            mutators (``extend``) so searches never race an in-place update.
    """

    def __init__(self, index, window_ms: float = 2.0, max_queries: int = 64,
                 exact_threshold: int = DEFAULT_EXACT_THRESHOLD,
                 lock: Optional[threading.Lock] = None,
                 query_token_pad: Optional[int] = 64,
                 k_bucket: int = 128):
        self.index = index
        self.window = window_ms / 1e3
        self.max_queries = max_queries
        self.exact_threshold = exact_threshold
        # Single static top-k shape: every sweep runs at this k (capped at
        # the corpus size) and each request slices its own k back out —
        # top-k at a larger k is a prefix-superset, and on a 1M-doc row the
        # k=128 top_k costs ~0.2 ms (docs/PERF.md roofline), so one bucket
        # removes a whole compile axis. Requests with k > k_bucket fall
        # back to per-sweep power-of-two rounding (a one-off compile).
        self.k_bucket = k_bucket
        # Static query-token shape: every sweep zero-pads its queries to
        # this many tokens, so the compiled kernel depends only on the
        # batch bucket — not on whichever query lengths happened to merge.
        # Zero tokens are score-neutral in every kernel (exact maxsim: a
        # zero vector dots to 0 and contributes 0 to the sum; int8 rerank:
        # per-token scale 0; binary prefilter: masked via q_valid from
        # binarize_words). Requests longer than the pad fall back to
        # per-sweep rounding (a one-off compile). None disables padding.
        self.query_token_pad = query_token_pad
        self.lock = lock if lock is not None else threading.Lock()
        self._queue: deque[_Pending] = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="search-microbatcher")
        self._thread.start()

    def search(self, queries: Sequence[np.ndarray], k: int = 10,
               candidates: Optional[int] = None, mode: str = "auto",
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking search; safe to call from many threads concurrently.

        Returns per-request ``(scores (n, k'), doc_ids (n, k'))`` with
        ``k' = min(k, num_docs)``, identical to ``index.search`` — merging
        never changes results, only when the device gets asked.
        """
        if not queries:
            raise ValueError("empty query batch")
        route(self.index, len(queries), mode, self.exact_threshold)  # validate early
        p = _Pending([np.asarray(q, np.float32) for q in queries], int(k),
                     candidates, mode)
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append(p)
            self._cv.notify()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.scores, p.ids

    def warmup(self, max_batch: Optional[int] = None,
               query_tokens: Optional[int] = None) -> None:
        """Compile EVERY executable live dispatch can reach: for each
        power-of-two merge bucket up to ``max_batch`` (default
        ``max_queries``), one dummy sweep per reachable kernel — exact at
        every bucket (clients may force ``mode='exact'`` at any batch), and
        tiered at every bucket up to the exact-threshold's power-of-two
        ceiling (auto routing pads tiered sweeps up to that bucket; e.g.
        threshold 6 routes n=5 tiered at bucket 8).

        The compiled executable's shape is (batch bucket, query tokens,
        top-k): dispatch pins the last two via ``query_token_pad`` and the
        single ``k_bucket``, so warming here covers every live request with
        k <= k_bucket. Call once at server boot (scripts/serve.py does).
        The one remaining cold path is a client forcing ``mode='tiered'``
        ABOVE the auto threshold (a deliberate operator override) or
        k > k_bucket — each a one-off compile."""
        limit = max_batch or self.max_queries
        tokens = query_tokens or self.query_token_pad or 16
        q = np.zeros((tokens, self.index.dim), np.float32)
        k = min(self.k_bucket, self.index.num_docs)
        tiered_limit = 1
        while tiered_limit < self.exact_threshold:
            tiered_limit *= 2
        b = 1
        while b <= limit:
            kernels = ["exact"]
            if self.index.prefilter is not None and b <= tiered_limit:
                kernels.append("tiered")
            for kernel in kernels:
                with self.lock:
                    run_search(self.index, [q] * b, k=k, mode=kernel,
                               exact_threshold=self.exact_threshold)
            b *= 2

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=5)

    # -- dispatcher ----------------------------------------------------------

    def _take_batch(self) -> List[_Pending]:
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return []
            batch = [self._queue.popleft()]
        total = len(batch[0].queries)
        deadline = time.perf_counter() + self.window
        while total < self.max_queries:
            remaining = deadline - time.perf_counter()
            with self._cv:
                if not self._queue:
                    if remaining <= 0 or self._closed:
                        break
                    self._cv.wait(remaining)
                while self._queue and total < self.max_queries:
                    # never split one request across sweeps
                    nxt = self._queue[0]
                    if total + len(nxt.queries) > self.max_queries and batch:
                        total = self.max_queries
                        break
                    batch.append(self._queue.popleft())
                    total += len(nxt.queries)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if not batch:
                return  # closed and drained
            # requests in one sweep must agree on shortlist size; explicit
            # modes are honored by grouping, auto requests merge freely
            groups: dict = {}
            for p in batch:
                groups.setdefault((p.candidates, p.mode), []).append(p)
            for (cand, mode), group in groups.items():
                self._dispatch(group, cand, mode)

    def _dispatch(self, group: List[_Pending], candidates, mode: str) -> None:
        try:
            flat: List[np.ndarray] = []
            for p in group:
                flat.extend(p.queries)
            # Route on the TRUE query count, then make every sweep shape
            # static: batch padded to a power-of-two bucket, top-k rounded
            # to a power-of-two bucket, query tokens zero-padded to
            # query_token_pad. Merged batch sizes / k values / query
            # lengths under load are arbitrary, and every distinct
            # (batch, tokens, k) triple is a fresh XLA compile (measured:
            # a first-seen shape costs seconds and poisons p99 —
            # perf/serving_concurrency_bench.py). Buckets bound the compile
            # count at log2(max_queries) total; pad rows reuse queries[0],
            # pad tokens score 0, and both are sliced off before delivery.
            k_req = max(p.k for p in group)
            if k_req <= self.k_bucket:
                k = min(self.k_bucket, self.index.num_docs)
            else:  # oversized request: one-off per-sweep rounding
                k = _k_bucket(k_req, self.index.num_docs)
            kernel = route(self.index, len(flat), mode, self.exact_threshold)
            n_real = len(flat)
            bucket = 1
            while bucket < n_real:
                bucket *= 2
            flat = flat + [flat[0]] * (bucket - n_real)
            pad = self.query_token_pad
            if pad is not None and all(q.shape[0] <= pad for q in flat):
                flat = [
                    q if q.shape[0] == pad
                    else np.concatenate(
                        [q, np.zeros((pad - q.shape[0], q.shape[1]), np.float32)]
                    )
                    for q in flat
                ]
            with self.lock:
                scores, ids = run_search(
                    self.index, flat, k=k, candidates=candidates, mode=kernel,
                    exact_threshold=self.exact_threshold,
                )
            scores, ids = scores[:n_real], ids[:n_real]
            row = 0
            for p in group:
                n = len(p.queries)
                kk = min(p.k, scores.shape[1])
                p.scores = scores[row : row + n, :kk]
                p.ids = ids[row : row + n, :kk]
                row += n
        except BaseException as exc:  # noqa: BLE001 — delivered to each caller
            for p in group:
                p.error = exc
        finally:
            for p in group:
                p.event.set()
