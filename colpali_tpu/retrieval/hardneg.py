"""Offline hard-negative mining.

Behavioral spec: /root/reference/scripts/compute_hardnegs.py:30-131 — embed
the corpus with a (bi-)encoder, take each query's top-100 documents, record
them as ``negative_passages`` (excluding the gold passage) plus a
``gold_in_top_100`` flag used by downstream dataset filters
(utils/dataset_transformation.py:27-50).

Runs on device: scores computed blockwise with the same ops the serving path
uses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.ops.maxsim import score_multi_vector, score_single_vector


def mine_hard_negatives(
    query_embeddings: Union[np.ndarray, Sequence[np.ndarray]],
    doc_embeddings: Union[np.ndarray, Sequence[np.ndarray], None],
    gold_indices: Sequence[int],
    k: int = 100,
    multi_vector: bool = False,
    batch_size: int = 128,
    index: Optional[Any] = None,
) -> List[Dict[str, Any]]:
    """Top-k mining over a corpus.

    Args:
        query_embeddings: (Q, D) dense or ragged multi-vector query embeddings.
        doc_embeddings: (C, D) dense or ragged multi-vector corpus embeddings
            (may be None when ``index`` is given).
        gold_indices: gold doc index per query.
        k: negatives pool size (reference uses 100).
        multi_vector: score with MaxSim instead of the dot product.
        index: optional :class:`colpali_tpu.retrieval.CorpusIndex` — mining
            then runs through the serving path (int8/two-tier/mesh-sharded)
            instead of materializing the full (Q, C) score matrix, which at
            reference scale (1M docs x 10k queries fp32) would be 40 GB.
            Dense bi-encoder embeddings mine through an index of 1-token
            docs (MaxSim degenerates to the dot product).

    Returns:
        per-query dicts: ``{negative_passages, gold_in_top_100, top_scores}``
        with the gold doc excluded from negatives.
    """
    if index is not None:
        qs = (
            [np.asarray(q) for q in query_embeddings]
            if multi_vector
            else [np.asarray(q)[None, :] for q in query_embeddings]
        )
        k = min(k, index.num_docs)
        top_scores, top_idx = index.search(qs, k=k)
        top_scores = np.asarray(top_scores)
        top_idx = np.asarray(top_idx)
    else:
        if multi_vector:
            scores = score_multi_vector(query_embeddings, doc_embeddings, batch_size=batch_size)
        else:
            scores = score_single_vector(query_embeddings, doc_embeddings)

        k = min(k, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(jnp.asarray(scores), k)
        top_scores = np.asarray(top_scores)
        top_idx = np.asarray(top_idx)

    out: List[Dict[str, Any]] = []
    for q, gold in enumerate(gold_indices):
        row = top_idx[q]
        gold_in_top = bool((row == gold).any())
        negatives = [int(i) for i in row if i != gold]
        out.append(
            {
                "negative_passages": negatives,
                "gold_in_top_100": gold_in_top,
                "top_scores": top_scores[q].tolist(),
            }
        )
    return out
