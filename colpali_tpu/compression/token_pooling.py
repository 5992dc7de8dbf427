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


def ward_pool_padded(
    embeddings,  # (B, T, D) jnp array, zero rows where mask == 0
    mask,  # (B, T) 0/1 token validity
    pool_factor: int,
):
    """Fully on-device EXACT Ward pooling: batched agglomerative clustering
    under jit, reproducing the reference scipy dendrogram cut.

    The reference pools with ``linkage(1 - sim, metric="euclidean",
    method="ward")`` + ``fcluster(..., criterion="maxclust")``
    (hierarchical_token_pooling.py:83-146). Note the quirk this preserves:
    scipy receives the square ``1 - sim`` matrix as OBSERVATIONS (n points in
    n-dim space), so the clustering metric is euclidean distance between
    ROWS of ``X = 1 - sim`` — not ``1 - cos`` itself.

    TPU formulation: pairwise squared distances between X rows come from one
    batched matmul; merging is greedy global-argmin with the Lance-Williams
    Ward update inside ``lax.scan``. Ward is a reducible linkage, so greedy
    merging produces the same dendrogram as scipy's NN-chain, with merge
    heights nondecreasing — stopping doc ``i`` after ``n_i - k_i`` merges
    (``k_i = max(n_i // pool_factor, 1)``) IS the maxclust cut. Static
    shapes, no host round trip: unlike the scipy path this runs inside the
    embed -> pool -> index ingestion pipeline (``DeviceIndexBuilder``).

    O(T) scan steps of O(B*T^2) work each; fine for the offline indexing
    path at page token counts (T <= ~1024).

    Returns ``(pooled (B, K, D), cluster_mask (B, K), assignments (B, T))``
    with ``K = max(T // pool_factor, 1)``: same contract as
    :func:`kmeans_pool_padded` (pooled rows are renormalized cluster means;
    invalid clusters zeroed; assignments are compact cluster ids for valid
    tokens, junk where ``mask == 0``).
    """
    import jax.numpy as jnp

    if pool_factor == 1:
        return embeddings, mask.astype(bool), jnp.broadcast_to(
            jnp.arange(embeddings.shape[1])[None], mask.shape
        )
    e = jnp.asarray(embeddings, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    b, t, _ = e.shape
    k = max(t // pool_factor, 1)

    n = jnp.sum(m, axis=1)  # (B,) valid tokens
    k_i = jnp.maximum((n // pool_factor).astype(jnp.int32), 1)
    merges_needed = n.astype(jnp.int32) - k_i  # (B,)

    # observations X = 1 - sim over valid columns (zero-padded tokens give a
    # constant column of 1s which cancels in row differences; mask anyway).
    # precision="highest": TPU einsum defaults to bf16 MXU accumulation,
    # which is enough to flip near-tied merge decisions vs the f64 scipy
    # oracle — distances must be true f32.
    sim = jnp.einsum("bid,bjd->bij", e, e, precision="highest")
    x = (1.0 - sim) * m[:, None, :]
    sq = jnp.sum(x * x, axis=2)  # (B, T) row norms^2
    gram = jnp.einsum("bik,bjk->bij", x, x, precision="highest")
    dist = sq[:, :, None] + sq[:, None, :] - 2.0 * gram  # squared euclidean

    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    valid_pair = (m[:, :, None] > 0) & (m[:, None, :] > 0)
    iu = jnp.triu(jnp.ones((t, t), bool), 1)[None]  # i < j, scipy tie order
    dist = jnp.where(valid_pair & iu, jnp.maximum(dist, 0.0), inf)

    sizes = m  # (B, T) cluster sizes (0 for invalid)
    labels = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    # static step count: merges_i = n_i - max(n_i // pf, 1) is maximized at
    # n_i = T, so T - max(T // pf, 1) steps always suffice
    n_steps = t - k

    def step(carry, step_idx):
        dist, sizes, labels = carry
        do = step_idx < merges_needed  # (B,)

        flat = dist.reshape(b, t * t)
        idx = jnp.argmin(flat, axis=1)
        i = (idx // t).astype(jnp.int32)
        j = (idx % t).astype(jnp.int32)
        oi = jax.nn.one_hot(i, t, dtype=jnp.float32)  # (B, T)
        oj = jax.nn.one_hot(j, t, dtype=jnp.float32)

        # full distance vectors to i and j (dist holds only i<j; symmetrize).
        # gathers, not one-hot matmuls: einsum selection would route f32
        # distances through the bf16 MXU
        dsym = jnp.minimum(dist, dist.transpose(0, 2, 1))
        row_i = jnp.take_along_axis(dsym, i[:, None, None], axis=1)[:, 0]
        row_j = jnp.take_along_axis(dsym, j[:, None, None], axis=1)[:, 0]
        d_ij = jnp.take_along_axis(row_i, j[:, None], axis=1)  # (B, 1)
        s_i = jnp.take_along_axis(sizes, i[:, None], axis=1)
        s_j = jnp.take_along_axis(sizes, j[:, None], axis=1)

        # Lance-Williams (Ward, squared distances)
        denom = s_i + s_j + sizes
        new = ((s_i + sizes) * row_i + (s_j + sizes) * row_j
               - sizes * d_ij) / jnp.maximum(denom, 1e-20)
        alive_k = (sizes > 0) & (oi < 0.5) & (oj < 0.5)  # (B, T)
        new = jnp.where(alive_k, new, inf)

        # write row/col i preserving the upper-triangle layout, kill j
        bi = oi > 0.5
        bj = oj > 0.5
        nd = jnp.where(bi[:, :, None] & iu, new[:, None, :], dist)
        nd = jnp.where(bi[:, None, :] & iu, new[:, :, None], nd)
        nd = jnp.where(bj[:, :, None] | bj[:, None, :], inf, nd)
        dist = jnp.where(do[:, None, None], nd, dist)

        sizes = jnp.where(do[:, None], sizes + bi * s_j - bj * sizes, sizes)
        labels = jnp.where(do[:, None] & (labels == j[:, None]),
                           i[:, None], labels)
        return (dist, sizes, labels), ()

    if n_steps > 0:
        (dist, sizes, labels), _ = jax.lax.scan(
            step, (dist, sizes, labels), jnp.arange(n_steps, dtype=jnp.int32)
        )

    # compact the surviving roots to [0, K) in index order (root index order
    # is deterministic; the reference's labels come from a dendrogram
    # traversal — only the PARTITION is contractual, not label order)
    counts_per_root = jnp.einsum("bt,bti->bi", m,
                                 jax.nn.one_hot(labels, t, dtype=jnp.float32),
                                 precision="highest")
    is_root = counts_per_root > 0  # (B, T)
    rank = jnp.cumsum(is_root.astype(jnp.int32), axis=1) - 1  # (B, T)
    compact = jnp.take_along_axis(rank, labels, axis=1)  # (B, T) in [0, K)
    compact = jnp.minimum(compact, k - 1)  # safety clamp (never binds)

    onehot = jax.nn.one_hot(compact, k, dtype=jnp.float32) * m[..., None]
    sums = jnp.einsum("btk,btd->bkd", onehot, e, precision="highest")
    counts = jnp.sum(onehot, axis=1)[..., None]  # (B, K, 1)
    mean = sums / jnp.maximum(counts, 1.0)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    pooled = mean / jnp.maximum(norm, 1e-12)
    cluster_mask = counts[..., 0] > 0
    pooled = jnp.where(cluster_mask[..., None], pooled, 0.0)
    return pooled.astype(embeddings.dtype), cluster_mask, compact


def kmeans_pool_padded(
    embeddings,  # (B, T, D) jnp array, zero rows where mask == 0
    mask,  # (B, T) 0/1 token validity
    pool_factor: int,
    iters: int = 10,
):
    """Fully on-device token pooling: batched spherical k-means under jit.

    The TPU-native alternative to :class:`HierarchicalTokenPooler`: same
    cluster-count rule (``k_i = max(n_i // pool_factor, 1)`` per doc, same as
    reference hierarchical_token_pooling.py:118-123) and the same
    aggregation (per-cluster mean, re-L2-normalized), but the clustering is
    batched k-means on unit-norm tokens (cosine similarity) instead of
    host scipy Ward — static shapes, no host round trip, runs inside the
    embed -> pool -> index ingestion pipeline (``DeviceIndexBuilder``)
    entirely on device.

    Centroids init by deterministic maximin (farthest-point) selection over
    each doc's valid tokens; during iteration empty clusters keep
    their previous centroid; clusters ``j >= k_i`` are masked out of
    assignment. After the last iteration the pooled rows are re-aggregated
    HARD from the final assignment, so every valid pooled row is exactly
    ``normalize(mean(tokens assigned to it))`` — and clusters that end
    empty (or belong to a fully-masked doc) are reported invalid in
    ``cluster_mask`` and zeroed (score-neutral under MaxSim).

    Returns ``(pooled (B, K, D), cluster_mask (B, K), assignments (B, T))``
    with ``K = max(T // pool_factor, 1)``; ``assignments`` are final cluster
    ids for valid tokens (junk where ``mask == 0``).
    """
    import jax.numpy as jnp

    if pool_factor == 1:
        return embeddings, mask.astype(bool), jnp.broadcast_to(
            jnp.arange(embeddings.shape[1])[None], mask.shape
        )
    e = jnp.asarray(embeddings, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    _, t, _ = e.shape
    k = max(t // pool_factor, 1)

    n = jnp.sum(m, axis=1)  # (B,) valid tokens
    k_i = jnp.maximum((n // pool_factor).astype(jnp.int32), 1)  # (B,)
    j = jnp.arange(k)[None, :]
    cluster_mask = j < k_i[:, None]  # (B,K)
    neg = jnp.finfo(jnp.float32).min

    # deterministic maximin (farthest-point) init: start at each doc's first
    # valid token, then repeatedly take the valid token with the LOWEST max
    # similarity to the centroids chosen so far — spreads seeds across the
    # doc's distinct directions (measured +5pt recall@5 retention over
    # strided init on the perf/pooling_retention.py stress proxy)
    order = jnp.argsort(-m, axis=1, stable=True)
    first = jnp.take_along_axis(e, order[:, :1, None], axis=1)[:, 0]  # (B,D)
    maxsim0 = jnp.where(m > 0, jnp.einsum("btd,bd->bt", e, first, precision="highest"), jnp.inf)

    def pick(maxsim, _):
        idx = jnp.argmin(maxsim, axis=1)  # (B,)
        tok = jnp.take_along_axis(e, idx[:, None, None], axis=1)[:, 0]  # (B,D)
        sim = jnp.einsum("btd,bd->bt", e, tok, precision="highest")
        return jnp.where(m > 0, jnp.maximum(maxsim, sim), jnp.inf), tok

    if k > 1:
        _, rest = jax.lax.scan(pick, maxsim0, None, length=k - 1)
        centroids = jnp.concatenate([first[:, None], rest.transpose(1, 0, 2)], axis=1)
    else:
        centroids = first[:, None]

    def assign_to(c):
        sim = jnp.einsum("btd,bkd->btk", e, c, precision="highest")
        sim = jnp.where(cluster_mask[:, None, :], sim, neg)
        return jnp.argmax(sim, axis=-1)  # (B,T)

    def aggregate(assign):
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * m[..., None]
        sums = jnp.einsum("btk,btd->bkd", onehot, e, precision="highest")
        counts = jnp.sum(onehot, axis=1)[..., None]  # (B,K,1)
        mean = sums / jnp.maximum(counts, 1.0)
        norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        return mean / jnp.maximum(norm, 1e-12), counts

    def step(c, _):
        mean, counts = aggregate(assign_to(c))
        return jnp.where(counts > 0, mean, c), ()

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    # hard final aggregation: pooled rows are exactly the renormalized means
    # of their final assignment; clusters that end empty — or any cluster of
    # a fully-masked doc — are invalid and zeroed
    assign = assign_to(centroids)
    pooled, counts = aggregate(assign)
    cluster_mask = cluster_mask & (counts[..., 0] > 0)
    pooled = jnp.where(cluster_mask[..., None], pooled, 0.0)
    return pooled.astype(embeddings.dtype), cluster_mask, assign


_kmeans_jit = None


def _kmeans_pool_jitted(padded, mask, pool_factor: int, iters: int):
    """Shared jitted entry (jit caches are per-wrapper: a fresh jax.jit per
    call would retrace + recompile every invocation)."""
    global _kmeans_jit
    if _kmeans_jit is None:
        _kmeans_jit = jax.jit(
            kmeans_pool_padded, static_argnames=("pool_factor", "iters")
        )
    return _kmeans_jit(padded, mask, pool_factor=pool_factor, iters=iters)


class _DevicePoolerBase(BaseTokenPooler):
    """Shared ragged-list <-> padded-device plumbing for the on-device
    poolers: right-pad to one (B, L, D) batch, pool in ONE device call,
    then unpad + renumber (empty clusters are dropped, matching the
    reference ``_ward_pool`` which appends only non-empty clusters)."""

    def _pool_padded(self, padded, mask, pool_factor: int):
        raise NotImplementedError

    def _pool_embeddings_impl(
        self,
        embeddings: List[Array],
        pool_factor: int,
        num_workers: Optional[int] = None,
    ):
        import jax.numpy as jnp

        lens = [e.shape[0] for e in embeddings]
        if any(n == 1 for n in lens):
            raise ValueError("The input tensor must have more than one token.")
        padded = pad_sequences(embeddings)  # (B, L, D) right-pad
        t = padded.shape[1]
        mask = np.zeros(padded.shape[:2], np.float32)
        for i, n in enumerate(lens):
            mask[i, :n] = 1.0
        # K must cover the longest doc's cluster count
        factor = max(pool_factor, 1)
        if t // factor < max(max(n // factor, 1) for n in lens):
            t_pad = factor * max(max(n // factor, 1) for n in lens)
            padded = np.concatenate(
                [padded, np.zeros((padded.shape[0], t_pad - t, padded.shape[2]), padded.dtype)], 1
            )
            mask = np.concatenate([mask, np.zeros((mask.shape[0], t_pad - t), np.float32)], 1)
        pooled, cmask, assign = self._pool_padded(
            jnp.asarray(padded), jnp.asarray(mask), factor
        )
        pooled, cmask, assign = (np.asarray(x) for x in (pooled, cmask, assign))

        out: List[Array] = []
        maps: List[Dict[int, Tuple[Array]]] = []
        for i, n in enumerate(lens):
            if pool_factor == 1:
                out.append(np.asarray(embeddings[i]))
                maps.append({0: (np.arange(n),)})
                continue
            valid = np.where(cmask[i])[0]
            out.append(pooled[i, valid])
            maps.append(
                {new: (np.where(assign[i, :n] == orig)[0],)
                 for new, orig in enumerate(valid)}
            )
        return out, maps


class KMeansTokenPooler(_DevicePoolerBase):
    """Device-resident k-means pooler with the reference container API.

    The cheap on-device option: O(iters * T^2) per doc vs Ward's O(T^3).
    Clusters that end empty are dropped, so a doc may pool to fewer than
    ``max(n // pool_factor, 1)`` rows. Approximate — measured retention is
    below Ward's (perf/pooling_retention.py); prefer
    :class:`DeviceWardTokenPooler` unless pooling cost dominates."""

    def __init__(self, iters: int = 10):
        self.iters = iters

    def _pool_padded(self, padded, mask, pool_factor: int):
        return _kmeans_pool_jitted(padded, mask, pool_factor=pool_factor, iters=self.iters)


class DeviceWardTokenPooler(_DevicePoolerBase):
    """Device-resident EXACT Ward pooler with the reference container API.

    Same partitions as :class:`HierarchicalTokenPooler` (scipy) — verified
    partition-identical on random inputs — but the clustering runs under
    jit on the accelerator (:func:`ward_pool_padded`), so it drops into
    sharded ingestion (``DeviceIndexBuilder``) with no host round trip."""

    def _pool_padded(self, padded, mask, pool_factor: int):
        global _ward_jit
        if _ward_jit is None:
            _ward_jit = jax.jit(ward_pool_padded, static_argnames=("pool_factor",))
        return _ward_jit(padded, mask, pool_factor=pool_factor)


_ward_jit = None


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
