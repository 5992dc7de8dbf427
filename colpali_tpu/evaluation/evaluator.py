"""Retrieval evaluation loop: embeddings -> index -> ranked lists -> metrics.

ViDoRe-style evaluation driven entirely by this package's ops (the reference
needs the external vidore-benchmark for this). Works from precomputed
embeddings or a (model, processor) pair.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from colpali_tpu.evaluation.metrics import mrr_at_k, ndcg_at_k, recall_at_k
from colpali_tpu.retrieval.store import CorpusIndex


def evaluate_retrieval(
    query_embeddings: Sequence[np.ndarray],
    doc_embeddings: Sequence[np.ndarray],
    relevance: Sequence[Any],
    k_values: Sequence[int] = (1, 5, 10, 100),
    index_dtype: str = "bf16",
    mesh: Optional[Any] = None,
) -> Dict[str, float]:
    """Score all queries against the corpus and compute ranked metrics.

    Args:
        query_embeddings / doc_embeddings: ragged multi-vector embeddings.
        relevance: per-query gold doc ids (list) or {doc_id: gain} mapping.
        k_values: cutoffs; reports ndcg/recall/mrr at each.

    Returns:
        {"ndcg@5": ..., "recall@10": ..., ...} averaged over queries.
    """
    index = CorpusIndex(doc_embeddings, dtype=index_dtype, mesh=mesh)
    return evaluate_retrieval_from_index(index, query_embeddings, relevance, k_values)


def evaluate_retrieval_from_index(
    index: CorpusIndex,
    query_embeddings: Sequence[np.ndarray],
    relevance: Sequence[Any],
    k_values: Sequence[int] = (1, 5, 10, 100),
) -> Dict[str, float]:
    """Ranked metrics against an already-built index — callers that hold
    device-resident embeddings (the training eval loop, serving) build via
    retrieval.DeviceIndexBuilder and skip the host pack/upload round trip."""
    max_k = min(max(k_values), index.num_docs)
    _, ranked = index.search(query_embeddings, k=max_k)

    metrics: Dict[str, List[float]] = {}
    for q, rel in enumerate(relevance):
        for k in k_values:
            metrics.setdefault(f"ndcg@{k}", []).append(ndcg_at_k(ranked[q], rel, k))
            metrics.setdefault(f"recall@{k}", []).append(recall_at_k(ranked[q], rel, k))
            metrics.setdefault(f"mrr@{k}", []).append(mrr_at_k(ranked[q], rel, k))
    return {name: float(np.mean(vals)) for name, vals in metrics.items()}


def embed_dataset(
    model_apply: Callable,
    variables: Any,
    processor: Any,
    items: Sequence[Any],
    batch_size: int = 8,
    is_images: bool = True,
    use_query_prompt: bool = False,
    kind: Optional[str] = None,
) -> List[np.ndarray]:
    """Embed texts/images in batches, returning per-item unpadded embeddings.

    The inference path of SURVEY.md §3.3: process -> forward -> strip padding
    (so downstream scoring sees only real tokens). ``use_query_prompt`` routes
    texts through ``process_queries`` (prefix + augmentation suffix) instead
    of raw ``process_texts``.

    ``kind`` overrides the two boolean flags with an explicit modality:
    ``"images"`` | ``"texts"`` | ``"queries"`` | ``"audios"`` (waveforms for
    processors with ``process_audios``) | ``"videos"`` (frame stacks or
    video file paths for processors with ``process_videos``) — the
    ColQwen-Omni modalities, mirroring the reference's audio/video document
    support in processing_colqwen_omni.py:123-186.

    Preprocessing runs on a prefetch thread overlapping the device forward,
    and processors with a ``device_pixels`` path (the qwen2 family) keep
    pixel batches on device (no normalized-image host round trip — downloads
    over remote-attached accelerators run at MB/s).
    """
    import inspect

    import jax.numpy as jnp

    from colpali_tpu.data.prefetch import prefetch

    if kind is None:
        kind = "images" if is_images else ("queries" if use_query_prompt else "texts")
    if kind not in ("images", "texts", "queries", "audios", "videos"):
        raise ValueError(f"unknown kind {kind!r}")
    device_pixels = (
        kind == "images"
        and "device_pixels" in inspect.signature(processor.process_images).parameters
    )

    def produce():
        for i in range(0, len(items), batch_size):
            chunk = list(items[i : i + batch_size])
            if kind == "images":
                batch = (
                    processor.process_images(chunk, device_pixels=True)
                    if device_pixels
                    else processor.process_images(chunk)
                )
            elif kind == "audios":
                batch = processor.process_audios(chunk)
            elif kind == "videos":
                batch = processor.process_videos(chunk)
            elif kind == "queries":
                batch = processor.process_queries(queries=chunk)
            else:
                batch = processor.process_texts(chunk)
            # grid geometry is torch-oracle/interpretability METADATA, not a
            # model input: the flax forwards take the padded per-item layout
            # (patch_mask/hpos/wpos/position_ids) and reject unknown kwargs
            yield batch, {
                k: v if (device_pixels and k == "pixel_values") else jnp.asarray(v)
                for k, v in batch.items()
                if k not in ("image_grid_thw", "video_grid_thw", "video_second_per_grid")
            }

    out: List[np.ndarray] = []
    for batch, model_inputs in prefetch(produce(), buffer_size=2):
        emb = np.asarray(model_apply(variables, **model_inputs), np.float32)
        mask = np.asarray(batch["attention_mask"]).astype(bool)
        for row in range(emb.shape[0]):
            out.append(emb[row][mask[row]])
    return out
