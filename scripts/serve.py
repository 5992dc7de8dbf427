#!/usr/bin/env python
"""Minimal retrieval server over a device-resident CorpusIndex.

The reference has NO serving layer (SURVEY.md §1: inference is a README
snippet); this exposes the TPU-native index over HTTP:

  POST /search       {"embeddings": [[...], ...] , "k": 10}
      -> {"doc_ids": [...], "scores": [...], "files": [...]}
  POST /search_text  {"queries": ["...", ...], "k": 10}   (needs --checkpoint)
      -> same response; queries are tokenized + encoded IN-PROCESS
         (retrieval/serving.py QueryEncoder, stored-int8 weights by default)
  GET  /healthz

Without --checkpoint, query embeddings are produced client-side (or via
scripts/api_call.py against an embed endpoint); the corpus comes from
scripts/embed_corpus.py output.
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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def load_corpus(path: str):
    data = np.load(path)
    embs = [data[k] for k in sorted(data.files, key=lambda s: int(s.split("_")[1]))]
    try:
        with open(path + ".files.json") as f:
            files = json.load(f)
    except FileNotFoundError:
        files = [str(i) for i in range(len(embs))]
    return embs, files


def make_handler(index, files, window_ms: float = 2.0, exact_threshold: int = 4,
                 encoder=None):
    import threading
    import time as _time

    from colpali_tpu.retrieval.serving import EncodeBatcher, MicroBatcher

    if encoder is not None and not isinstance(encoder, EncodeBatcher):
        # concurrent /search_text requests merge into single encode forwards
        encoder = EncodeBatcher(encoder, window_ms=window_ms)

    lock = threading.Lock()  # extend() mutates the index; searches race it
    # concurrent /search requests merge into single device sweeps within a
    # short linger window; merged batches auto-route to the exact kernel
    # above the measured two-tier crossover (retrieval/serving.py)
    batcher = MicroBatcher(index, window_ms=window_ms,
                           exact_threshold=exact_threshold, lock=lock)
    # pre-compile every merge-bucket kernel so no live request pays an XLA
    # compile (first-seen batch sizes cost seconds; serving_concurrency_bench)
    batcher.warmup()
    # /metrics: search-latency reservoir (last 1024 requests) + counters
    stats_lock = threading.Lock()
    latencies: list = []
    counters = {"searches": 0, "queries": 0, "errors": 0}

    def record(ms: float, n_queries: int) -> None:
        with stats_lock:
            counters["searches"] += 1
            counters["queries"] += n_queries
            latencies.append(ms)
            if len(latencies) > 1024:
                del latencies[: len(latencies) - 1024]

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "num_docs": index.num_docs,
                                 "text_in": encoder is not None})
            elif self.path == "/metrics":
                with stats_lock:
                    lat = sorted(latencies)
                    out = dict(counters, num_docs=index.num_docs)
                if lat:
                    q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]  # noqa: E731
                    out.update(search_ms_p50=round(q(0.50), 3),
                               search_ms_p90=round(q(0.90), 3),
                               search_ms_p99=round(q(0.99), 3))
                self._json(200, out)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                if self.path in ("/search", "/search_text"):
                    if self.path == "/search_text":
                        if encoder is None:
                            raise ValueError(
                                "/search_text needs the server started with "
                                "--checkpoint (no query encoder loaded)")
                        qs = encoder.encode([str(t) for t in payload["queries"]])
                    else:
                        qs = [np.asarray(e, np.float32) for e in payload["embeddings"]]
                    k = int(payload.get("k", 10))
                    cand = payload.get("candidates")
                    mode = payload.get("mode", "auto")  # auto|exact|tiered
                    t0 = _time.perf_counter()
                    scores, ids = batcher.search(
                        qs, k=k, candidates=int(cand) if cand else None, mode=mode
                    )
                    record((_time.perf_counter() - t0) * 1e3, len(qs))
                    self._json(200, {
                        "doc_ids": ids.tolist(),
                        "scores": scores.tolist(),
                        "files": [[files[i] for i in row] for row in ids],
                    })
                elif self.path == "/tune":
                    # recall-targeted shortlist sizing: sample queries in,
                    # pinned `candidates` default + measured recall out
                    # (CorpusIndex.tune_candidates / estimate_recall)
                    qs = [np.asarray(e, np.float32) for e in payload["embeddings"]]
                    k = int(payload.get("k", 10))
                    target = float(payload.get("target_recall", 0.95))
                    with lock:
                        cand, recall = index.tune_candidates(qs, k=k, target_recall=target)
                    self._json(200, {"candidates": cand, "recall": recall})
                elif self.path == "/add":
                    # incremental ingestion (CorpusIndex.extend): embeddings
                    # (list of per-doc token matrices) + optional file names
                    new = [np.asarray(e, np.float32) for e in payload["embeddings"]]
                    names = payload.get("files")
                    if names is not None and len(names) != len(new):
                        raise ValueError(f"{len(new)} embeddings but {len(names)} files")
                    with lock:
                        # default names must be derived from num_docs INSIDE
                        # the lock: two concurrent /adds would otherwise both
                        # read the same count and register duplicate doc names
                        if names is None:
                            names = [str(index.num_docs + i) for i in range(len(new))]
                        index.extend(new)
                        files.extend(names)
                    self._json(200, {"num_docs": index.num_docs})
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as exc:  # noqa: BLE001 — surface the error to the client
                with stats_lock:
                    counters["errors"] += 1
                self._json(400, {"error": str(exc)})

        def log_message(self, fmt, *fmt_args):
            pass  # quiet

    return Handler


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "corpus_npz",
        help="output of scripts/embed_corpus.py, or a packed index written by "
        "CorpusIndex.save / --save-index (boots without re-quantizing)",
    )
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--dtype", default="int8", choices=["bf16", "int8"])
    parser.add_argument(
        "--prefilter", action="store_true",
        help="build a two-tier index (binary sign-sketch coarse pass + exact "
        "rerank); clients can pass 'candidates' in the /search payload",
    )
    parser.add_argument(
        "--save-index",
        metavar="PATH.npz",
        help="after building, persist the packed index here and keep serving",
    )
    parser.add_argument(
        "--checkpoint",
        help="HF-format retriever checkpoint dir: loads model + processor "
        "in-process (stored-int8 weights) and enables POST /search_text",
    )
    parser.add_argument("--family", help="checkpoint family (else auto-detected)")
    parser.add_argument(
        "--no-quantize", action="store_true",
        help="with --checkpoint: keep bf16 weights instead of stored-int8",
    )
    args = parser.parse_args()

    from colpali_tpu.retrieval import CorpusIndex

    with np.load(args.corpus_npz) as probe:
        is_index = "store" in probe.files
    if is_index:
        index = CorpusIndex.load(args.corpus_npz)
        try:
            with open(args.corpus_npz + ".files.json") as f:
                files = json.load(f)
        except FileNotFoundError:
            files = [str(i) for i in range(index.num_docs)]
    else:
        embs, files = load_corpus(args.corpus_npz)
        index = CorpusIndex(embs, dtype=args.dtype, prefilter="binary" if args.prefilter else None)
        if args.save_index:
            index.save(args.save_index)
            with open(args.save_index + ".files.json", "w") as f:
                json.dump(files, f)
            print(f"Packed index saved to {args.save_index}")
    encoder = None
    if args.checkpoint:
        from colpali_tpu.auto import load_retriever
        from colpali_tpu.retrieval.serving import QueryEncoder

        model, variables, processor = load_retriever(
            args.checkpoint, family=args.family, quantize=not args.no_quantize
        )
        encoder = QueryEncoder(model, variables, processor)
        encoder.warmup()  # compile every batch bucket before traffic
        print(f"Text-in serving: query encoder loaded from {args.checkpoint}")
    print(f"Serving {index.num_docs} docs ({index.nbytes / 2**20:.1f} MiB on device) on :{args.port}")
    ThreadingHTTPServer(("0.0.0.0", args.port),
                        make_handler(index, files, encoder=encoder)).serve_forever()


if __name__ == "__main__":
    main()
