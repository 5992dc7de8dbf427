"""Headline benchmark: MaxSim top-100 serving latency over a 1M-page corpus.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Target (BASELINE.json north star): top-100 over 1M pages in < 50 ms p50 on a
v5e chip. ``vs_baseline`` = 50ms / measured_p50 (>1 beats the target).

Method notes:
- Corpus: 1M docs x 64 tokens (hierarchical pool factor 3 of ~196-patch
  ViDoRe pages) x 128 dim, int8 per-token quantized (8.2 GB — fits one v5e
  chip's HBM; bf16 would not).
- Timing: dispatch over the axon tunnel costs 10-40 ms RPC and
  block_until_ready() does not reliably block, so the kernel is called N
  times inside ONE jit with a data dependency chaining iterations; device
  time = total / N.
- QUERY_BATCH=1 measures the latency SLA (one query's top-100 over the
  whole corpus — HBM-bound: the corpus is read once per sweep, measured
  ~630 GB/s of the 819 GB/s peak). Larger batches amortize the sweep
  (B=8 costs ~20 ms, i.e. 2.5 ms/query) but are MXU-bound, not a latency
  number.
- The corpus lives in tile-major layout ((C/128, Np, 128, D) — one
  contiguous block per kernel grid step), matching CorpusIndex's store.
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
ITERS = 32  # amortizes the 10-40 ms axon RPC dispatch noise


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    num_docs = 999_936 if on_tpu else 4096  # multiple of 128

    from colpali_tpu.ops.maxsim_pallas import DOC_TILE, maxsim_pallas_int8mxu_tiled
    from colpali_tpu.ops.maxsim import maxsim
    from colpali_tpu.ops.quant import quantize_per_token

    rng = np.random.default_rng(0)
    n_tiles = num_docs // DOC_TILE
    # int8 corpus, tile-major (C/T, Np, T, D) + per-token scales (C/T, Np, T).
    # Generated ON device: pushing 8 GB through the axon host tunnel would
    # dominate the benchmark setup time.
    @jax.jit
    def make_store(key):
        # scan tile-by-tile so transient buffers stay small (an int32
        # intermediate for the whole corpus would be 32 GB)
        keys = jax.random.split(key, n_tiles)

        def step(carry, k):
            bits = jax.random.bits(k, (DOC_TOKENS, DOC_TILE, DIM // 4), jnp.uint32)
            return carry, jax.lax.bitcast_convert_type(bits, jnp.int8).reshape(DOC_TOKENS, DOC_TILE, DIM)

        _, tiles = jax.lax.scan(step, 0, keys)
        return tiles  # (n_tiles, DOC_TOKENS, DOC_TILE, DIM) int8

    store = make_store(jax.random.PRNGKey(0))
    scales = jnp.full((n_tiles, DOC_TOKENS, DOC_TILE), 1.0 / (127.0 * np.sqrt(DIM)), jnp.float32)
    queries = jnp.asarray(
        rng.normal(size=(QUERY_BATCH, QUERY_TOKENS, DIM)).astype(np.float32) / np.sqrt(DIM),
        dtype=jnp.bfloat16,
    )

    if on_tpu:
        # the serving configuration: full-int8 MXU kernel with per-token
        # quantized queries (CorpusIndex's default for int8 indexes)
        @jax.jit
        def chained(q, store, scales):
            def body(i, carry):
                q, acc = carry
                q_int8, q_scales = quantize_per_token(q.astype(jnp.float32))
                scores = maxsim_pallas_int8mxu_tiled(q_int8, q_scales, store, scales)
                top, _ = jax.lax.top_k(scores, 100)
                # all rows feed the result (prevents batch-row DCE); the
                # predicate blocks loop hoisting without changing values
                s = jnp.mean(top)
                q = q + (s > 1e30).astype(q.dtype)
                return (q, acc + s)

            _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
            return acc
    else:
        @jax.jit
        def chained(q, store, scales):
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
    np.asarray(chained(queries, store, scales))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(queries, store, scales))  # host fetch forces sync
        times.append((time.perf_counter() - t0) / ITERS)
    p50_ms = sorted(times)[len(times) // 2] * 1000

    metric = "maxsim_int8_top100_p50_ms_1M_pages" if on_tpu else "maxsim_top100_p50_ms_small_cpu"
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
