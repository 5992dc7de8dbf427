"""Retention measurement for token pooling: how much retrieval quality
survives pool_factor=3 (the reference quotes 97.8% retained performance,
README.md:225 — measured there on ViDoRe with real checkpoints).

Hermetic proxy (no checkpoints in this environment): synthetic pages with
ViDoRe-like token structure — each doc is C concepts x R noisy repeats
(concept vectors shared across a global pool, so distractors are hard), and
each query is a noisy subset of its gold doc's concepts. Pooling that
recovers the concept groups keeps MaxSim intact; pooling that merges
distinct concepts loses score mass. Reported: recall@5 / nDCG@5 for
unpooled vs HierarchicalTokenPooler (scipy Ward, reference-exact) vs
DeviceWardTokenPooler (on-device exact Ward — expected to tie scipy) vs
KMeansTokenPooler (on-device spherical k-means) at pool_factor=3.

Usage: python perf/pooling_retention.py  (CPU-safe; ~1 min)
"""

import time

import numpy as np

from colpali_tpu.compression import (
    DeviceWardTokenPooler,
    HierarchicalTokenPooler,
    KMeansTokenPooler,
)
from colpali_tpu.evaluation.metrics import ndcg_at_k, recall_at_k
from colpali_tpu.ops.maxsim import score_multi_vector

N_DOCS = 384
CONCEPTS_PER_DOC = 12  # "headline" concepts, 2 noisy copies each
REPEATS = 2
UNIQUE_TOKENS = 24     # distinct single-shot content tokens
QUERY_CONCEPTS = 8
DIM = 128
POOL_FACTOR = 3        # 48 tokens -> 16 clusters: must merge distinct content


def unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def build_corpus(rng, noise):
    pool = unit(rng.normal(size=(5000, DIM)).astype(np.float32))
    docs, doc_concepts = [], []
    for _ in range(N_DOCS):
        cids = rng.choice(pool.shape[0], CONCEPTS_PER_DOC + UNIQUE_TOKENS, replace=False)
        toks = np.concatenate(
            [pool[cids[:CONCEPTS_PER_DOC]].repeat(REPEATS, axis=0), pool[cids[CONCEPTS_PER_DOC:]]]
        )
        toks = unit(toks + noise * rng.normal(size=toks.shape).astype(np.float32))
        docs.append(toks)
        doc_concepts.append(pool[cids])  # queries may probe any distinct vector
    return docs, doc_concepts


def evaluate(queries, docs):
    scores = np.asarray(score_multi_vector(queries, docs))
    ranked = np.argsort(-scores, axis=1)
    rec = np.mean([recall_at_k(ranked[i], [i], k=5) for i in range(len(queries))])
    ndcg = np.mean([ndcg_at_k(ranked[i], [i], k=5) for i in range(len(queries))])
    return rec, ndcg


def main():
    n_tok = CONCEPTS_PER_DOC * REPEATS + UNIQUE_TOKENS
    for noise in (0.1, 0.15, 0.2):
        rng = np.random.default_rng(0)
        docs, doc_concepts = build_corpus(rng, noise)
        queries = []
        for i in range(N_DOCS):
            take = rng.choice(doc_concepts[i].shape[0], QUERY_CONCEPTS, replace=False)
            q = doc_concepts[i][take]
            queries.append(unit(q + noise * rng.normal(size=q.shape).astype(np.float32)))

        base_rec, base_ndcg = evaluate(queries, docs)
        print(f"noise {noise}: unpooled ({n_tok} tok/doc): "
              f"recall@5 {base_rec:.4f}  ndcg@5 {base_ndcg:.4f}")

        for name, pooler in (("ward", HierarchicalTokenPooler()),
                             ("dev-ward", DeviceWardTokenPooler()),
                             ("kmeans", KMeansTokenPooler())):
            t0 = time.perf_counter()
            pooled = pooler.pool_embeddings(docs, pool_factor=POOL_FACTOR)
            dt = time.perf_counter() - t0
            rec, ndcg = evaluate(queries, pooled)
            tokens = sum(p.shape[0] for p in pooled)
            print(f"  {name:7s} factor {POOL_FACTOR} ({tokens / N_DOCS:.1f} tok/doc, "
                  f"pooling {dt:.1f}s): recall@5 {rec:.4f} ({rec / base_rec:.1%})  "
                  f"ndcg@5 {ndcg:.4f} ({ndcg / base_ndcg:.1%})")


if __name__ == "__main__":
    main()
