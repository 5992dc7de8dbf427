"""Token pooling: compress multi-vector embeddings by clustering tokens.

Behavioral spec: /root/reference/colpali_engine/compression/token_pooling/
- ``HierarchicalTokenPooler``: cosine-similarity -> Ward-linkage hierarchical
  clustering -> ``max(len // pool_factor, 1)`` clusters -> per-cluster mean,
  re-L2-normalized (hierarchical_token_pooling.py:83-146).
- ``LambdaTokenPooler``: user-supplied pooling function per 2D embedding
  (lambda_token_pooling.py:9-89).
- Both accept a ragged list of 2D arrays or a 0-padded 3D array (left/right
  padding), returning the same container shape
  (base_token_pooling.py:104-164).

TPU-native split: the O(n^2) similarity matrix is computed on-device in one
batched matmul for the whole batch; the inherently sequential Ward linkage
runs on host via scipy (same algorithm/library as the reference — this is an
offline indexing step, not the serving path).
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import numpy as np

from colpali_tpu.utils.tensor_utils import pad_sequences, unbind_padded_multivector_embeddings

Array = np.ndarray


@dataclasses.dataclass
class TokenPoolingOutput:
    """pooled_embeddings + optional cluster-id -> token-indices maps."""

    pooled_embeddings: Union[List[Array], Array]
    cluster_id_to_indices: Optional[List[Dict[int, Tuple[Array]]]] = None


class BaseTokenPooler:
    """List/padded-3D normalization shell around a pooling implementation."""

    def _pool_embeddings_impl(
        self, embeddings: List[Array], **kwargs
    ) -> Tuple[List[Array], Optional[List[Dict[int, Tuple[Array]]]]]:
        raise NotImplementedError

    def pool_embeddings(
        self,
        embeddings: Union[Array, List[Array]],
        return_dict: bool = False,
        padding: bool = False,
        padding_side: str = "left",
        num_workers: Optional[int] = None,
        **pool_kwargs,
    ) -> Union[Union[Array, List[Array]], TokenPoolingOutput]:
        if isinstance(embeddings, (list, tuple)) and not embeddings:
            return TokenPoolingOutput(pooled_embeddings=[], cluster_id_to_indices=[])

        is_3d = not isinstance(embeddings, (list, tuple)) and np.asarray(embeddings).ndim == 3
        if is_3d:
            arr = np.asarray(embeddings)
            prepared = (
                unbind_padded_multivector_embeddings(arr, 0.0, padding_side)
                if padding
                else list(arr)
            )
        else:
            prepared = [np.asarray(e) for e in embeddings]
            if any(e.ndim != 2 for e in prepared):
                raise ValueError("The input must be a list of 2D arrays or a 3D array.")

        pooled, maps = self._pool_embeddings_impl(prepared, num_workers=num_workers, **pool_kwargs)

        if is_3d:
            pooled = pad_sequences(pooled, padding_side=padding_side)
        if not return_dict:
            return pooled
        return TokenPoolingOutput(pooled_embeddings=pooled, cluster_id_to_indices=maps)


class HierarchicalTokenPooler(BaseTokenPooler):
    """Ward-linkage hierarchical clustering pooler."""

    def _pool_embeddings_impl(
        self,
        embeddings: List[Array],
        pool_factor: int,
        num_workers: Optional[int] = None,
    ):
        # Batched on-device similarity matrices (one padded matmul for all
        # docs) — the reference computes these one-by-one on CPU.
        sims = self._batched_similarities(embeddings)

        def pool_one(args):
            emb, sim = args
            return _ward_pool(emb, sim, pool_factor)

        work = list(zip(embeddings, sims))
        if num_workers and num_workers > 1:
            with ThreadPoolExecutor(num_workers) as ex:
                results = list(ex.map(pool_one, work))
        else:
            results = [pool_one(w) for w in work]
        return [r[0] for r in results], [r[1] for r in results]

    @staticmethod
    def _batched_similarities(embeddings: List[Array]) -> List[Array]:
        padded = pad_sequences(embeddings, pad_multiple=8)  # (B, L, D)
        x = np.asarray(padded, np.float32)
        sims = np.asarray(jax.jit(lambda a: a @ a.transpose(0, 2, 1))(x))
        return [sims[i, : e.shape[0], : e.shape[0]] for i, e in enumerate(embeddings)]


def _ward_pool(
    embedding: Array, similarities: Array, pool_factor: int
) -> Tuple[Array, Dict[int, Tuple[Array]]]:
    """Single-doc Ward clustering + per-cluster mean + renorm (reference
    _pool_single_embedding semantics, including the scipy calls)."""
    from scipy.cluster.hierarchy import fcluster, linkage

    embedding = np.asarray(embedding, np.float32)
    token_length = embedding.shape[0]
    if embedding.ndim != 2:
        raise ValueError("The input tensor must be a 2D tensor.")
    if token_length == 1:
        raise ValueError("The input tensor must have more than one token.")
    if pool_factor == 1:
        return embedding, {0: (np.arange(token_length),)}

    distances = 1 - np.asarray(similarities, np.float32)
    Z = linkage(distances, metric="euclidean", method="ward")  # noqa: N806
    max_clusters = max(token_length // pool_factor, 1)
    labels = fcluster(Z, t=max_clusters, criterion="maxclust") - 1

    cluster_id_to_indices: Dict[int, Tuple[Array]] = {}
    pooled_rows: List[Array] = []
    for cluster_id in range(max_clusters):
        idx = np.where(labels == cluster_id)[0]
        cluster_id_to_indices[cluster_id] = (idx,)
        if idx.size > 0:
            mean = embedding[idx].mean(axis=0)
            norm = np.linalg.norm(mean)
            pooled_rows.append(mean / norm if norm > 0 else mean)
    return np.stack(pooled_rows, axis=0), cluster_id_to_indices


class LambdaTokenPooler(BaseTokenPooler):
    """Pool each 2D embedding with a user-supplied function
    (reference lambda_token_pooling.py:9-89)."""

    def __init__(self, pool_func: Callable[[Array], Array]):
        self.pool_func = pool_func

    def _pool_embeddings_impl(self, embeddings: List[Array], num_workers: Optional[int] = None):
        if num_workers and num_workers > 1:
            with ThreadPoolExecutor(num_workers) as ex:
                pooled = list(ex.map(self.pool_func, embeddings))
        else:
            pooled = [self.pool_func(e) for e in embeddings]
        return pooled, None
