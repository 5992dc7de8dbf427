"""Headline benchmark: MaxSim top-100 serving latency over a 1M-page corpus.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Target (BASELINE.json north star): top-100 over 1M pages in < 50 ms p50 on a
v5e chip. ``vs_baseline`` = 50ms / measured_p50 (>1 beats the target).

The measured configuration is CorpusIndex's best serving path: TWO-TIER
search with a POOLED sketch (round 5) — binary sign-sketch coarse pass over
mean-pooled groups of COARSE_POOL=4 doc tokens (XOR+popcount Pallas kernel,
multi-DOC_TILE grid steps; the coarse pass is VPU-compute-bound, so pooling
cuts its ops AND bytes 4x, and K-tile blocking amortizes the per-step
overhead that dominates small sketches: 6.7 -> 2.6 ms) -> top-1024
candidates -> scalar-prefetch gather -> exact fp32 rerank -> top-100.
Returned scores are exact; recall@100 = 1.0 on graded-relevance corpora at
this exact config (perf/prefilter_bench.py --coarse-pool 4, which also
reports the exact-kernel single-pass ~12.4 ms and the unpooled two-tier
~8.7 ms).

Method notes:
- Corpus: 1M docs x 64 tokens (hierarchical pool factor 3 of ~196-patch
  ViDoRe pages) x 128 dim, int8 per-token quantized (8.2 GB) + 1 GB packed
  sign bits — fits one v5e chip's HBM.
- Timing: dispatch over the axon tunnel costs 10-40 ms RPC and
  block_until_ready() does not reliably block, so the kernel is called N
  times inside ONE jit with a data dependency chaining iterations; device
  time = total / N.
- QUERY_BATCH=1 measures the latency SLA (one query's top-100 over the
  whole corpus). The corpus lives in tile-major layout ((C/128, Np, 128, D)
  — one contiguous block per kernel grid step), matching CorpusIndex.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_MS = 50.0
QUERY_BATCH = 1  # latency config: one query batch per corpus sweep
QUERY_TOKENS = 32
DIM = 128
DOC_TOKENS = 64
COARSE_POOL = 4  # sketch-only token pooling (CorpusIndex coarse_pool)
ITERS = 32  # amortizes the 10-40 ms axon RPC dispatch noise


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    num_docs = 999_936 if on_tpu else 4096  # multiple of 128
    candidates = 1024

    from colpali_tpu.ops.maxsim import maxsim
    from colpali_tpu.ops.maxsim_binary import binary_maxsim_pallas_tiled
    from colpali_tpu.ops.maxsim_pallas import DOC_TILE
    from colpali_tpu.ops.quant import binarize_words
    from colpali_tpu.retrieval.store import gather_rerank

    rng = np.random.default_rng(0)
    n_tiles = num_docs // DOC_TILE

    # int8 corpus (tile-major) + matching packed sign words + scales,
    # generated ON device: pushing ~10 GB through the axon host tunnel would
    # dominate setup time. Scan tile-by-tile to bound transient buffers.
    @jax.jit
    def make_corpus(key):
        keys = jax.random.split(key, n_tiles)

        def step(carry, k):
            bits = jax.random.bits(k, (DOC_TOKENS, DOC_TILE, DIM // 4), jnp.uint32)
            tile = jax.lax.bitcast_convert_type(bits, jnp.int8).reshape(DOC_TOKENS, DOC_TILE, DIM)
            # pooled sketch: sign of the group sum (uniform scale, so the int8
            # sum's sign equals the dequantized fp32 mean's sign)
            src = tile.astype(jnp.int32).reshape(
                DOC_TOKENS // COARSE_POOL, COARSE_POOL, DOC_TILE, DIM
            ).sum(1)
            sign = (src > 0).astype(jnp.uint32).reshape(
                DOC_TOKENS // COARSE_POOL, DOC_TILE, DIM // 32, 32
            )
            weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
            words = jnp.sum(sign * weights, axis=-1, dtype=jnp.uint32).astype(jnp.int32)
            return carry, (tile, words.transpose(2, 0, 1))

        _, (store, words) = jax.lax.scan(step, 0, keys)
        return store, words

    store, words = make_corpus(jax.random.PRNGKey(0))
    scales = jnp.full((n_tiles, DOC_TOKENS, DOC_TILE), 1.0 / (127.0 * np.sqrt(DIM)), jnp.float32)
    queries = jnp.asarray(
        rng.normal(size=(QUERY_BATCH, QUERY_TOKENS, DIM)).astype(np.float32) / np.sqrt(DIM)
    )

    if on_tpu:
        # CorpusIndex's best serving path: two-tier search (coarse binary
        # pass -> candidate gather -> exact rerank -> top-k); scores exact.
        # Corpus arrays are threaded as jit ARGUMENTS (a closure would be
        # captured as a 9.5 GB constant and hang lowering — see the verify
        # skill's axon notes).
        def two_tier(q, store, scales, words):
            qw, qv = binarize_words(q)
            coarse = binary_maxsim_pallas_tiled(qw, qv, words, DIM)
            _, cidx = jax.lax.top_k(coarse, candidates)
            exact_c = gather_rerank(q, store, scales, cidx, use_kernel=True)
            top, _ = jax.lax.top_k(exact_c, 100)
            return top

        @jax.jit
        def chained(q, store, scales, words):
            def body(i, carry):
                q, acc = carry
                top = two_tier(q, store, scales, words)
                # all rows feed the result (prevents batch-row DCE); the
                # predicate blocks loop hoisting without changing values
                s = jnp.mean(top)
                q = q + (s > 1e30).astype(q.dtype)
                return (q, acc + s)

            _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
            return acc
    else:

        @jax.jit
        def chained(q, store, scales, words):
            deq = store.astype(jnp.float32) * scales[..., None]
            nt, np_, t, d = deq.shape
            docs = jnp.transpose(deq, (0, 2, 1, 3)).reshape(nt * t, np_, d)

            def body(i, carry):
                q, acc = carry
                scores = maxsim(q.astype(jnp.float32), docs)
                top, _ = jax.lax.top_k(scores, min(100, num_docs))
                s = jnp.mean(top)
                q = q + (s > 1e30).astype(q.dtype)
                return (q, acc + s)

            _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
            return acc

    # compile + warm up
    np.asarray(chained(queries, store, scales, words))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(queries, store, scales, words))  # host fetch forces sync
        times.append((time.perf_counter() - t0) / ITERS)
    p50_ms = sorted(times)[len(times) // 2] * 1000

    metric = "maxsim_two_tier_top100_p50_ms_1M_pages" if on_tpu else "maxsim_top100_p50_ms_small_cpu"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(p50_ms, 3),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / p50_ms, 3) if on_tpu else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
