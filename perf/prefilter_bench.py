#!/usr/bin/env python
"""Two-tier (binary prefilter) serving benchmark over a 1M-page corpus.

Measures, on one chip (see bench.py for the timing method — chained in-jit
iterations to amortize axon RPC dispatch):

  1. exact int8 MXU kernel top-100 p50 (the bench.py headline, for reference)
  2. binary coarse pass p50 (XOR+popcount over the packed-bit corpus)
  3. two-tier end-to-end p50: coarse -> top-CANDIDATES -> gather -> exact
     fp32 rerank -> top-100
  4. recall@100 of the two-tier result vs the exact kernel's top-100

The corpus is random int8 (worst case for a sign sketch: no cluster
structure, so the exact top-100 of a random query are barely separated from
rank 101+; real page-embedding corpora are MUCH easier). Report the random
recall honestly and tune `--candidates` upward for latency-insensitive runs.

Usage: python perf/prefilter_bench.py [--candidates 1024] [--batch 1]
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
import time

import jax
import jax.numpy as jnp
import numpy as np

DIM = 128
DOC_TOKENS = 64
QUERY_TOKENS = 32
K = 100
ITERS = 32


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--candidates", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=ITERS)
    parser.add_argument(
        "--coarse-pool", type=int, default=1,
        help="sketch-only token pooling factor (CorpusIndex coarse_pool): the "
        "sign sketch covers mean-pooled groups of this many contiguous doc "
        "tokens — coarse ops AND bytes shrink by the factor; rerank unchanged",
    )
    args = parser.parse_args()
    cpool = args.coarse_pool
    if DOC_TOKENS % cpool != 0:
        parser.error(f"--coarse-pool must divide {DOC_TOKENS}")

    from colpali_tpu.ops.maxsim_binary import binary_maxsim_pallas_tiled
    from colpali_tpu.ops.maxsim_pallas import DOC_TILE, maxsim_pallas_int8mxu_tiled
    from colpali_tpu.ops.quant import binarize_words, quantize_per_token

    on_tpu = jax.devices()[0].platform == "tpu"
    num_docs = 999_936 if on_tpu else 4096
    n_tiles = num_docs // DOC_TILE
    cand = min(args.candidates, num_docs)
    iters = args.iters
    t0 = time.time()

    @jax.jit
    def make_corpus(key):
        """int8 tile-major store + matching packed sign words, built on
        device tile-by-tile (host transfer of 10 GB would dominate setup)."""
        keys = jax.random.split(key, n_tiles)

        def step(carry, k):
            bits = jax.random.bits(k, (DOC_TOKENS, DOC_TILE, DIM // 4), jnp.uint32)
            tile = jax.lax.bitcast_convert_type(bits, jnp.int8).reshape(DOC_TOKENS, DOC_TILE, DIM)
            # sketch source: mean-pooled token groups when --coarse-pool > 1
            # (sign(sum int8) == sign(sum of dequantized fp32): uniform scale)
            src = tile.astype(jnp.int32).reshape(DOC_TOKENS // cpool, cpool, DOC_TILE, DIM).sum(1)
            sign = (src > 0).astype(jnp.uint32).reshape(DOC_TOKENS // cpool, DOC_TILE, DIM // 32, 32)
            weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
            words = jnp.sum(sign * weights, axis=-1, dtype=jnp.uint32).astype(jnp.int32)
            return carry, (tile, words.transpose(2, 0, 1))

        _, (store, words) = jax.lax.scan(step, 0, keys)
        return store, words  # (n, Np, T, D) int8, (n, W, Np, T) int32

    store, words = make_corpus(jax.random.PRNGKey(0))
    scales = jnp.full((n_tiles, DOC_TOKENS, DOC_TILE), 1.0 / (127.0 * np.sqrt(DIM)), jnp.float32)
    rng = np.random.default_rng(0)
    queries = jnp.asarray(
        rng.normal(size=(args.batch, QUERY_TOKENS, DIM)).astype(np.float32) / np.sqrt(DIM)
    )
    print(f"[{time.time()-t0:6.1f}s] corpus ready: {num_docs} docs", flush=True)

    interpret = not on_tpu

    # NOTE: the corpus arrays are jit ARGUMENTS everywhere below — closing a
    # jit over a multi-GB device array captures it as a constant and
    # serializes it through the axon tunnel at lowering (a 15-min hang).

    def exact_topk(q, store, scales, words):
        q_int8, q_scales = quantize_per_token(q)
        scores = maxsim_pallas_int8mxu_tiled(q_int8, q_scales, store, scales, interpret=interpret)
        return jax.lax.top_k(scores, K)

    def coarse_scores(q, store, scales, words):
        qw, qv = binarize_words(q)
        return binary_maxsim_pallas_tiled(qw, qv, words, DIM, interpret=interpret)

    def two_tier_topk(q, store, scales, words):
        from colpali_tpu.retrieval.store import gather_rerank

        coarse = coarse_scores(q, store, scales, words)
        _, cidx = jax.lax.top_k(coarse, cand)
        exact_c = gather_rerank(q, store, scales, cidx, use_kernel=on_tpu, interpret=interpret)
        top, pos = jax.lax.top_k(exact_c, K)
        return top, jnp.take_along_axis(cidx, pos, axis=1)

    def timed(fn, name):
        @jax.jit
        def chained(q, store, scales, words):
            def body(i, carry):
                q, acc = carry
                out = fn(q, store, scales, words)
                if isinstance(out, (tuple, list)):
                    out = out[0]
                s = jnp.mean(out)
                q = q + (s > 1e30).astype(q.dtype)
                return (q, acc + s)

            _, acc = jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))
            return acc

        np.asarray(chained(queries, store, scales, words))  # compile + warm
        times = []
        for _ in range(3):
            t1 = time.perf_counter()
            np.asarray(chained(queries, store, scales, words))
            times.append((time.perf_counter() - t1) / iters)
        p50 = sorted(times)[1] * 1000
        print(f"[{time.time()-t0:6.1f}s] {name}: {p50:.2f} ms", flush=True)
        return p50

    exact_ms = timed(exact_topk, "exact int8 top-100")
    coarse_ms = timed(coarse_scores, "binary coarse pass")
    tiered_ms = timed(two_tier_topk, "two-tier top-100")

    def recall_vs_exact(q):
        _, exact_idx = jax.jit(exact_topk)(q, store, scales, words)
        _, tiered_idx = jax.jit(two_tier_topk)(q, store, scales, words)
        exact_idx, tiered_idx = np.asarray(exact_idx), np.asarray(tiered_idx)
        return np.mean([len(set(exact_idx[b]) & set(tiered_idx[b])) / K for b in range(q.shape[0])])

    # Adversarial case: a random query over a random corpus — its exact
    # top-100 is barely separated from rank 101+, the worst setting for any
    # approximate shortlist.
    recall_random = recall_vs_exact(queries)

    # Realistic case: plant 256 graded-relevance docs (noisy copies of the
    # query's tokens, noise growing with rank) so the exact top-100 is a
    # meaningful relevance ranking, as it is for real page embeddings.
    n_plant = 256
    q_host = np.asarray(queries[:1], np.float32)  # (1, Nq, D)
    doc_f32 = np.tile(q_host[0], (n_plant, DOC_TOKENS // QUERY_TOKENS, 1))
    sigma = (0.3 + 0.01 * np.arange(n_plant))[:, None, None]
    doc_f32 = doc_f32 + sigma * rng.normal(size=doc_f32.shape) / np.sqrt(DIM)
    s = 1.0 / (127.0 * np.sqrt(DIM))
    planted_i8 = np.clip(np.round(doc_f32 / s), -127, 127).astype(np.int8)
    tiled = planted_i8.reshape(2, DOC_TILE, DOC_TOKENS, DIM).transpose(0, 2, 1, 3)
    psrc = tiled.astype(np.int32).reshape(2, DOC_TOKENS // cpool, cpool, DOC_TILE, DIM).sum(2)
    pw = np.sum(
        (psrc > 0).astype(np.uint32).reshape(2, DOC_TOKENS // cpool, DOC_TILE, DIM // 32, 32)
        * (np.uint32(1) << np.arange(32, dtype=np.uint32)),
        axis=-1, dtype=np.uint32,
    ).astype(np.int32).transpose(0, 3, 1, 2)
    # donate: an undonated update would briefly double the 8 GB store
    upd = jax.jit(
        lambda a, b: jax.lax.dynamic_update_slice(a, b, (0,) * a.ndim), donate_argnums=0
    )
    store = upd(store, jnp.asarray(tiled))
    words = upd(words, jnp.asarray(pw))
    recall_planted = recall_vs_exact(queries[:1])

    print(
        json.dumps(
            {
                "num_docs": num_docs,
                "batch": args.batch,
                "candidates": cand,
                "coarse_pool": cpool,
                "exact_p50_ms": round(exact_ms, 3),
                "coarse_p50_ms": round(coarse_ms, 3),
                "two_tier_p50_ms": round(tiered_ms, 3),
                "recall_at_100_planted": round(float(recall_planted), 3),
                "recall_at_100_random_corpus": round(float(recall_random), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
