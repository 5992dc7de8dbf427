#!/usr/bin/env python
"""Serving concurrency benchmark: QPS + latency percentiles under load.

Completes the serving story (docs/SERVING.md, retrieval/serving.py): the
round-3 verdict asked for a measured QPS/p99 under CONCURRENT load, not
just single-sweep p50s. Two dispatch strategies over the same index:

  1. ``locked``  — the pre-round-4 serve.py behavior: every request is a
     routed sweep (`run_search`), serialized behind one global lock.
  2. ``batched`` — :class:`MicroBatcher`: concurrent requests merge into
     one device sweep within a linger window; merged batches auto-route
     to the exact kernel exactly where it wins (PERF.md two-tier table).

Load model: ``--clients N`` closed-loop threads, each firing single-query
top-100 searches back-to-back for ``--seconds S``. Per-request latency is
wall time inside the client. The corpus is random int8 (see
prefilter_bench.py for why that is the worst case); QPS/latency do not
depend on score values.

Usage:
  python perf/serving_concurrency_bench.py [--docs 499968] [--clients 1 4 16 32]
"""

from __future__ import annotations

# When run from a source checkout without installation, make the repo root
# importable (an installed colpali_tpu still wins: this is an append).
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse
import json
import threading
import time

import jax
import numpy as np

DIM = 128
DOC_TOKENS = 64
QUERY_TOKENS = 32
K = 100


class SweepRecorder:
    """Proxy over CorpusIndex that records each device sweep's batch size
    and kernel, so the bench can report merge factors without touching the
    serving code."""

    def __init__(self, index):
        self._index = index
        self.sweeps: list = []  # (n_queries, kernel)
        self._lock = threading.Lock()

    def __getattr__(self, name):
        return getattr(self._index, name)

    def exact_search(self, queries, k=10, **kw):
        with self._lock:
            self.sweeps.append((len(queries), "exact"))
        return self._index.exact_search(queries, k=k, **kw)

    def search(self, queries, k=10, **kw):
        with self._lock:
            self.sweeps.append((len(queries), "tiered"))
        return self._index.search(queries, k=k, **kw)

    def reset(self):
        with self._lock:
            self.sweeps = []

    def stats(self):
        with self._lock:
            sweeps = list(self.sweeps)
        if not sweeps:
            return {"sweeps": 0}
        sizes = np.array([s for s, _ in sweeps])
        return {
            "sweeps": len(sweeps),
            "mean_merge": round(float(sizes.mean()), 2),
            "max_merge": int(sizes.max()),
            "exact_frac": round(sum(1 for _, k_ in sweeps if k_ == "exact") / len(sweeps), 3),
        }


def build_index(num_docs: int, coarse_pool: int = 1):
    from colpali_tpu.retrieval.store import DeviceIndexBuilder

    builder = DeviceIndexBuilder(doc_tokens=DOC_TOKENS, dim=DIM,
                                 dtype="int8", prefilter="binary",
                                 coarse_pool=coarse_pool)
    chunk = 4096
    key = jax.random.key(0)
    n_chunks = num_docs // chunk

    @jax.jit
    def make_chunk(k):
        return jax.random.normal(k, (chunk, DOC_TOKENS, DIM), jax.numpy.float32)

    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        builder.add(make_chunk(sub))
    return builder.build()


def run_load(search_fn, n_clients: int, seconds: float, rng: np.random.Generator,
             payloads=None):
    """Closed-loop load: each client thread fires B=1 searches until the
    deadline. Returns per-request latencies (s) and the measurement span.
    ``payloads`` overrides the default embedding queries (text-in mode
    passes query strings)."""
    queries = payloads if payloads is not None else [
        rng.standard_normal((QUERY_TOKENS, DIM)).astype(np.float32)
        for _ in range(64)]
    latencies: list = []
    lat_lock = threading.Lock()
    start_evt = threading.Event()
    deadline = [0.0]

    def client(cid: int):
        local = []
        start_evt.wait()
        i = cid
        while time.perf_counter() < deadline[0]:
            q = queries[i % len(queries)]
            t0 = time.perf_counter()
            search_fn([q], K)
            local.append(time.perf_counter() - t0)
            i += 1
        with lat_lock:
            latencies.extend(local)

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    for t in threads:
        t.start()
    t_start = time.perf_counter()
    deadline[0] = t_start + seconds
    start_evt.set()
    for t in threads:
        t.join()
    span = time.perf_counter() - t_start
    return np.array(latencies), span


def summarize(name, n_clients, lats, span, sweep_stats):
    out = {
        "strategy": name,
        "clients": n_clients,
        "qps": round(len(lats) / span, 1),
        "p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(lats, 99)) * 1e3, 2),
        "n": len(lats),
        **sweep_stats,
    }
    print("RESULT " + json.dumps(out), flush=True)
    return out


def build_text_encoder():
    """Real-scale text-in encoder: ColPali-3B random weights, STORED-INT8
    kernels (the serving mode), bench word tokenizer — the query-encode
    cost is weight-value-independent."""
    import os
    import sys

    sys.path.append(os.path.dirname(os.path.abspath(__file__)))
    import jax.numpy as jnp
    from embed_bench import _BenchTokenizer

    from colpali_tpu.models.configs import PaliGemmaConfig
    from colpali_tpu.models.paligemma import ColPali
    from colpali_tpu.ops.quant_dense import quantize_params
    from colpali_tpu.processors.colpali import ColPaliProcessor
    from colpali_tpu.retrieval.serving import EncodeBatcher, QueryEncoder

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        config = PaliGemmaConfig()  # PaliGemma-3B
    else:
        from colpali_tpu.models.configs import GemmaConfig, SiglipVisionConfig

        config = PaliGemmaConfig(
            vision=SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                      num_hidden_layers=2, num_attention_heads=4,
                                      image_size=28, patch_size=14),
            text=GemmaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, head_dim=8),
            projection_dim=32, image_token_index=6)
    model = ColPali(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                    scan_layers=True)
    processor = ColPaliProcessor(_BenchTokenizer())
    tok = processor.process_queries(["warmup"])
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(np.asarray(tok["input_ids"])),
        jnp.asarray(np.asarray(tok["attention_mask"]))))()
    qp, qc = quantize_params(variables["params"])
    del variables  # free the bf16 originals (the int8 tree replaces them)
    encoder = QueryEncoder(model, {"params": qp, "quant": qc}, processor)
    return EncodeBatcher(encoder)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=None)
    parser.add_argument("--clients", type=int, nargs="+", default=[1, 4, 16, 32])
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--window-ms", type=float, default=2.0)
    parser.add_argument("--text", action="store_true",
                        help="TEXT-IN load: clients send query strings; each "
                             "request pays tokenize + encode (real-scale "
                             "ColPali-3B stored-int8, EncodeBatcher-merged) "
                             "before the search — QPS/p99 include encoding")
    parser.add_argument("--coarse-pool", type=int, default=1,
                        help="sketch-only token pooling (CorpusIndex coarse_pool)")
    args = parser.parse_args()

    from colpali_tpu.retrieval.serving import MicroBatcher, run_search

    on_tpu = jax.devices()[0].platform == "tpu"
    num_docs = args.docs or (499_968 if on_tpu else 8192)
    t0 = time.time()

    enc = None
    payloads = None
    if args.text:
        # encoder FIRST: quantizing a 3B tree needs transient HBM the index
        # would otherwise be occupying (6 GB bf16 + int8 + fp32 per-leaf)
        enc = build_text_encoder()
        tw = time.time()
        enc.warmup()
        print(f"[{time.time()-t0:6.1f}s] text encoder built + warm "
              f"({time.time()-tw:.1f}s)", flush=True)
        payloads = [f"find document page {i} quarterly report total revenue {i % 7}"
                    for i in range(64)]

    index = SweepRecorder(build_index(num_docs, args.coarse_pool))
    print(f"[{time.time()-t0:6.1f}s] index built: {num_docs} docs x {DOC_TOKENS} tok, "
          f"int8+binary prefilter (coarse_pool={args.coarse_pool})", flush=True)

    rng = np.random.default_rng(7)
    # warm both kernels (compile) before timing
    warm = [rng.standard_normal((QUERY_TOKENS, DIM)).astype(np.float32)]
    run_search(index, warm, K)                       # tiered (B=1, auto)
    run_search(index, warm * 8, K)                   # exact (B=8, auto)
    print(f"[{time.time()-t0:6.1f}s] kernels warm", flush=True)

    results = []
    for n_clients in args.clients:
        if not args.text:
            # -- locked: routed, one sweep at a time behind a global lock
            lock = threading.Lock()

            def locked_search(queries, k):
                with lock:
                    return run_search(index, queries, k)

            index.reset()
            lats, span = run_load(locked_search, n_clients, args.seconds, rng)
            results.append(summarize("locked", n_clients, lats, span, index.stats()))

        # -- batched: MicroBatcher merges concurrent requests. warmup()
        # pre-compiles each power-of-two merge bucket (without it, the first
        # request at a new merged size pays a multi-second XLA compile and
        # poisons p99 — measured 4.2-5.9 s p99 on the first run of this bench)
        mb = MicroBatcher(index, window_ms=args.window_ms)
        tw = time.time()
        mb.warmup(max_batch=max(n_clients, 1))
        print(f"[{time.time()-t0:6.1f}s] buckets warm ({time.time()-tw:.1f}s)", flush=True)
        index.reset()
        if args.text:
            # the full text-in stack: tokenize + merged encode + merged search
            def text_search(texts, k):
                return mb.search(enc.encode(texts), k=k)

            search_fn = text_search
        else:
            search_fn = lambda q, k: mb.search(q, k=k)  # noqa: E731
        try:
            # run_load wraps each payload item as a 1-element request list
            lats, span = run_load(search_fn, n_clients, args.seconds, rng,
                                  payloads=payloads)
        finally:
            mb.close()
        name = "text-batched" if args.text else "batched"
        results.append(summarize(name, n_clients, lats, span, index.stats()))
    if enc is not None:
        enc.close()

    best = max((r for r in results if "batched" in r["strategy"]),
               key=lambda r: r["qps"])
    print(json.dumps({"metric": "serving_qps_text_best" if args.text else "serving_qps_batched_best",
                      "value": best["qps"],
                      "unit": "qps", "p99_ms": best["p99_ms"],
                      "clients": best["clients"], "docs": num_docs}))


if __name__ == "__main__":
    main()
