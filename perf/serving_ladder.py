#!/usr/bin/env python
"""Serving-latency LADDER: two-tier and exact p50 across tokens/doc rungs.

The 8.8 ms / 1M-page headline (bench.py) sits at 64 tokens/doc — pool
factor 3 of ~196-patch pages. The flagship budgets are 616-1,030
tokens/page; factor-3 pooling of those is ~205-343 tokens/doc, which at 1M
pages exceeds one chip's HBM. This script publishes the honest ladder on
ONE chip, scaling corpus size to HBM:

    rung A:   64 tok x 1,000,000 docs  (8.2 GB int8 + 1.0 GB sign bits)
    rung B:  128 tok x   500,000 docs  (8.2 GB + 1.0 GB)
    rung C:  256 tok x   250,000 docs  (8.2 GB + 1.0 GB)

Each rung measures BOTH kernels at B=1 (the latency SLA):
- two-tier: binary coarse pass -> top-candidates gather -> exact int8
  rerank -> top-100 (scores exact; bench.py's headline path),
- exact: single-pass int8 MaxSim over the whole corpus -> top-100.

The mesh extrapolation is direct: a 1M x 256 corpus sharded over 4 chips is
exactly rung C per chip plus an all-gather of per-shard (k,) top lists
(~100 floats+ids per shard — microseconds on ICI), so rung C's p50 IS the
expected sharded 1M x 256 latency. Sharded-search CORRECTNESS is pinned on
an 8-device CPU mesh in tests/retrieval/test_store.py and exercised in
__graft_entry__.dryrun_multichip.

Method identical to bench.py: corpus generated on-device, arrays threaded
as jit ARGUMENTS (closure capture hangs axon lowering), ITERS chained
inside one jit with a runtime-false predicate dependency.

Usage: python perf/serving_ladder.py [--rungs A,B,C] [--iters 32]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

DIM = 128
QUERY_TOKENS = 32
CANDIDATES = 1024
RUNGS = {
    "A": (64, 999_936),
    "B": (128, 499_968),
    "C": (256, 249_984),
}


def make_corpus(doc_tokens: int, num_docs: int, coarse_pool: int = 1):
    """int8 tile-major store + packed sign words, generated on-device."""
    from colpali_tpu.ops.maxsim_pallas import DOC_TILE

    n_tiles = num_docs // DOC_TILE

    @jax.jit
    def gen(key):
        keys = jax.random.split(key, n_tiles)

        def step(carry, k):
            bits = jax.random.bits(k, (doc_tokens, DOC_TILE, DIM // 4), jnp.uint32)
            tile = jax.lax.bitcast_convert_type(bits, jnp.int8).reshape(doc_tokens, DOC_TILE, DIM)
            # pooled sketch (CorpusIndex coarse_pool): sign of the group sum
            src = tile.astype(jnp.int32).reshape(
                doc_tokens // coarse_pool, coarse_pool, DOC_TILE, DIM
            ).sum(1)
            sign = (src > 0).astype(jnp.uint32).reshape(
                doc_tokens // coarse_pool, DOC_TILE, DIM // 32, 32
            )
            weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
            words = jnp.sum(sign * weights, axis=-1, dtype=jnp.uint32).astype(jnp.int32)
            return carry, (tile, words.transpose(2, 0, 1))

        _, (store, words) = jax.lax.scan(step, 0, keys)
        return store, words

    store, words = gen(jax.random.PRNGKey(0))
    scales = jnp.full((n_tiles, doc_tokens, DOC_TILE), 1.0 / (127.0 * np.sqrt(DIM)), jnp.float32)
    return store, words, scales


def measure(kernel_fn, queries, store, scales, words, iters: int) -> float:
    @jax.jit
    def chained(q, store, scales, words):
        def body(i, carry):
            q, acc = carry
            top = kernel_fn(q, store, scales, words)
            s = jnp.mean(top)
            q = q + (s > 1e30).astype(q.dtype)
            return (q, acc + s)

        _, acc = jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))
        return acc

    np.asarray(chained(queries, store, scales, words))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(queries, store, scales, words))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2] * 1000


def run_rung(name: str, doc_tokens: int, num_docs: int, iters: int, coarse_pool: int = 1):
    from colpali_tpu.ops.maxsim_binary import binary_maxsim_pallas_tiled
    from colpali_tpu.ops.maxsim_pallas import maxsim_pallas_int8_tiled
    from colpali_tpu.ops.quant import binarize_words
    from colpali_tpu.retrieval.store import gather_rerank

    t0 = time.time()
    store, words, scales = make_corpus(doc_tokens, num_docs, coarse_pool)
    store.block_until_ready()
    gb = store.nbytes / 2**30 + words.nbytes / 2**30 + scales.nbytes / 2**30
    print(f"[{time.time()-t0:5.1f}s] rung {name}: {doc_tokens} tok x {num_docs:,} docs "
          f"({gb:.1f} GB device)", flush=True)

    rng = np.random.default_rng(0)
    queries = jnp.asarray(
        rng.normal(size=(1, QUERY_TOKENS, DIM)).astype(np.float32) / np.sqrt(DIM))
    cand = min(CANDIDATES, num_docs)

    def two_tier(q, store, scales, words):
        qw, qv = binarize_words(q)
        coarse = binary_maxsim_pallas_tiled(qw, qv, words, DIM)
        _, cidx = jax.lax.top_k(coarse, cand)
        exact_c = gather_rerank(q, store, scales, cidx, use_kernel=True)
        top, _ = jax.lax.top_k(exact_c, 100)
        return top

    def exact(q, store, scales, words):
        # the store's serving kernel for int8 corpora (CorpusIndex._kernel_fn)
        scores = maxsim_pallas_int8_tiled(q.astype(jnp.bfloat16), store, scales)
        top, _ = jax.lax.top_k(scores, 100)
        return top

    out = {"rung": name, "doc_tokens": doc_tokens, "num_docs": num_docs,
           "coarse_pool": coarse_pool, "device_gb": round(gb, 2)}
    out["two_tier_p50_ms"] = round(measure(two_tier, queries, store, scales, words, iters), 3)
    print(f"[{time.time()-t0:5.1f}s]   two-tier p50 {out['two_tier_p50_ms']} ms", flush=True)
    out["exact_p50_ms"] = round(measure(exact, queries, store, scales, words, iters), 3)
    print(f"[{time.time()-t0:5.1f}s]   exact    p50 {out['exact_p50_ms']} ms", flush=True)
    # free before the next rung (three rungs would hold ~28 GB)
    for a in (store, words, scales):
        a.delete()
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rungs", default="A,B,C")
    parser.add_argument("--iters", type=int, default=32)
    parser.add_argument("--coarse-pool", type=int, default=1,
                        help="sketch-only token pooling (CorpusIndex coarse_pool)")
    args = parser.parse_args()

    assert jax.devices()[0].platform == "tpu", "the ladder is a device measurement"
    results = [
        run_rung(r, *RUNGS[r], args.iters, args.coarse_pool) for r in args.rungs.split(",")
    ]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
