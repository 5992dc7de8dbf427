#!/usr/bin/env python
"""Ranking impact of the dynamic w8a8 serving mode (ops/quant_dense.py).

Embeds N random pages + queries through ColQwen2-2B (real dims, random
bf16 weights) twice — exact bf16 vs `quantized_acts()` — and compares the
MaxSim score matrices and the rankings they induce. Random weights are a
PROXY (real checkpoints are not downloadable in this environment): the
activation statistics are gaussian rather than real-page, but the
perturbation path is identical — 28 decoder + 32 vision layers of int8
projections compounding into the 128-d embedding. Reported:

- embedding cosine similarity exact-vs-quant per doc,
- MaxSim score matrix relative error,
- top-k overlap + exact-top-1 retention for (a) quant docs / exact queries
  (the realistic serving split: corpus embedded offline in quant mode,
  queries cheap enough to encode exact) and (b) quant both.

Usage: python perf/quant_accuracy_probe.py [--docs 32] [--queries 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.layers import quantized_acts
from colpali_tpu.ops.maxsim import maxsim


def build(batch, patches, text_tokens, scan=True):
    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLConfig

    config = Qwen2VLConfig()
    model = ColQwen2(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=scan)
    return model, config


def doc_inputs(config, rng, batch, patches, text_tokens):
    n_merged = patches // 4
    s = n_merged + text_tokens
    input_ids = np.full((batch, s), 11, np.int32)
    input_ids[:, 1 : 1 + n_merged] = config.image_token_id
    grid_h = int(np.sqrt(patches))
    return dict(
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(batch, patches, 1176)).astype(np.float32), jnp.bfloat16),
        vision_hpos=jnp.asarray(np.tile(np.arange(patches) // grid_h, (batch, 1)).astype(np.int32)),
        vision_wpos=jnp.asarray(np.tile(np.arange(patches) % grid_h, (batch, 1)).astype(np.int32)),
        patch_mask=jnp.ones((batch, patches), bool),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, batch, 1)).astype(np.int64)),
    )


def query_inputs(rng, batch, s=32):
    return dict(
        input_ids=jnp.asarray(rng.integers(5, 1000, size=(batch, s)), jnp.int32),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, batch, 1)).astype(np.int64)),
    )


def overlap(a, b, k):
    return np.mean([len(set(a[i, :k]) & set(b[i, :k])) / k for i in range(a.shape[0])])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=32)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--patches", type=int, default=768)
    args = p.parse_args()
    t0 = time.time()

    model, config = build(args.batch, args.patches, 20)
    rng = np.random.default_rng(0)
    warm = doc_inputs(config, rng, args.batch, args.patches, 20)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **warm))()
    print(f"[{time.time()-t0:6.1f}s] params ready", flush=True)

    # fresh closure per mode: jax's jaxpr cache keys on function identity
    def make_fwd():
        return jax.jit(lambda p_, b_: model.apply(p_, **b_))

    q_warm = query_inputs(np.random.default_rng(7), args.queries)
    fwd_exact = make_fwd()
    np.asarray(fwd_exact(params, warm))
    np.asarray(fwd_exact(params, q_warm))
    with quantized_acts():
        # warm BOTH input shapes inside the context: each shape is its own
        # trace, and a shape first seen outside would trace exact.
        fwd_quant = make_fwd()
        np.asarray(fwd_quant(params, warm))
        np.asarray(fwd_quant(params, q_warm))
    print(f"[{time.time()-t0:6.1f}s] both forwards compiled", flush=True)

    def embed_docs(fwd):
        outs = []
        for i in range(args.docs // args.batch):
            b = doc_inputs(config, np.random.default_rng(100 + i), args.batch, args.patches, 20)
            outs.append(np.asarray(fwd(params, b), np.float32))
        return np.concatenate(outs)

    docs_exact = embed_docs(fwd_exact)
    docs_quant = embed_docs(fwd_quant)
    print(f"[{time.time()-t0:6.1f}s] docs embedded", flush=True)

    q_in = query_inputs(np.random.default_rng(7), args.queries)
    q_exact = np.asarray(fwd_exact(params, q_in), np.float32)
    q_quant = np.asarray(fwd_quant(params, q_in), np.float32)

    # per-doc embedding cosine (valid tokens are all, no padding here)
    flat_e = docs_exact.reshape(args.docs, -1)
    flat_q = docs_quant.reshape(args.docs, -1)
    cos = np.sum(flat_e * flat_q, -1) / (
        np.linalg.norm(flat_e, axis=-1) * np.linalg.norm(flat_q, axis=-1)
    )
    print(f"doc embedding cosine exact-vs-quant: min {cos.min():.5f} mean {cos.mean():.5f}")

    def scores(q, d):
        return np.asarray(
            maxsim(jnp.asarray(q), jnp.asarray(d)), np.float32
        )

    s_exact = scores(q_exact, docs_exact)
    # How discriminative is this (degenerate, random-weight) corpus? The
    # ranking-overlap numbers only mean something relative to the scale of
    # score gaps between neighboring ranks: a perturbation smaller than the
    # gap cannot flip the pair.
    sorted_scores = -np.sort(-s_exact, axis=1)
    adj_gap = float(np.mean(sorted_scores[:, :-1] - sorted_scores[:, 1:]))
    print(f"exact corpus stats: mean adjacent-rank score gap {adj_gap:.4f} "
          f"(random docs near-tie — a stress floor, not the real-data regime)")
    for name, s in (
        ("quant docs / exact queries", scores(q_exact, docs_quant)),
        ("quant docs + quant queries", scores(q_quant, docs_quant)),
    ):
        rel = np.linalg.norm(s - s_exact) / np.linalg.norm(s_exact)
        perturb = float(np.mean(np.abs(s - s_exact)))
        r_e = np.argsort(-s_exact, axis=1)
        r_q = np.argsort(-s, axis=1)
        top1 = np.mean(r_e[:, 0] == r_q[:, 0])
        print(
            f"{name}: score relerr {rel:.4f} | mean |delta| {perturb:.4f} "
            f"({perturb / max(adj_gap, 1e-9):.2f}x the adjacent gap) | "
            f"top1 retained {top1:.2f} | "
            f"overlap@5 {overlap(r_e, r_q, 5):.3f} | overlap@10 {overlap(r_e, r_q, 10):.3f}"
        )


if __name__ == "__main__":
    main()
