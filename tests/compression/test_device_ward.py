"""On-device exact Ward pooling vs the scipy reference path.

The reference pools with scipy ``linkage(1 - sim, metric="euclidean",
method="ward")`` + maxclust ``fcluster``
(/root/reference/colpali_engine/compression/token_pooling/
hierarchical_token_pooling.py:83-146). ``ward_pool_padded`` re-derives the
same dendrogram cut on the accelerator (greedy Lance-Williams merging under
``lax.scan``); these tests pin partition-identity and aggregation parity
against the in-repo scipy path (itself parity-tested vs the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.compression.token_pooling import (
    DeviceWardTokenPooler,
    HierarchicalTokenPooler,
    ward_pool_padded,
)

_WARD = jax.jit(ward_pool_padded, static_argnames=("pool_factor",))


def _unit_docs(rng, lens, dim=16):
    docs = [rng.normal(size=(n, dim)).astype(np.float32) for n in lens]
    return [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]


def _pad(docs, t):
    b, d = len(docs), docs[0].shape[1]
    padded = np.zeros((b, t, d), np.float32)
    mask = np.zeros((b, t), np.float32)
    for i, doc in enumerate(docs):
        padded[i, : doc.shape[0]] = doc
        mask[i, : doc.shape[0]] = 1
    return padded, mask


def _partition(assign_row, n):
    groups = {}
    for tok in range(n):
        groups.setdefault(int(assign_row[tok]), []).append(tok)
    return {frozenset(g) for g in groups.values()}


@pytest.mark.parametrize("pool_factor", [2, 3])
def test_partitions_match_scipy(pool_factor):
    rng = np.random.default_rng(0)
    lens = [24, 37, 48]
    for _ in range(3):
        docs = _unit_docs(rng, lens)
        padded, mask = _pad(docs, max(lens))
        pooled, cmask, assign = map(
            np.asarray,
            _WARD(jnp.asarray(padded), jnp.asarray(mask), pool_factor=pool_factor),
        )
        ref = HierarchicalTokenPooler().pool_embeddings(
            docs, pool_factor=pool_factor, return_dict=True
        )
        for i, doc in enumerate(docs):
            n = doc.shape[0]
            ref_part = {
                frozenset(idx[0].tolist())
                for idx in ref.cluster_id_to_indices[i].values()
            }
            assert _partition(assign[i], n) == ref_part
            # same cluster count, and pooled rows agree as multisets
            k_valid = int(cmask[i].sum())
            assert k_valid == len(ref_part)
            ref_sorted = ref.pooled_embeddings[i][
                np.lexsort(ref.pooled_embeddings[i].T)
            ]
            mine_sorted = pooled[i, : k_valid][np.lexsort(pooled[i, :k_valid].T)]
            np.testing.assert_allclose(mine_sorted, ref_sorted, atol=5e-6)


def test_container_api_matches_scipy_pooler():
    rng = np.random.default_rng(1)
    docs = _unit_docs(rng, [18, 30])
    dev = DeviceWardTokenPooler().pool_embeddings(docs, pool_factor=3, return_dict=True)
    ref = HierarchicalTokenPooler().pool_embeddings(docs, pool_factor=3, return_dict=True)
    for i in range(len(docs)):
        ref_part = {
            frozenset(idx[0].tolist()) for idx in ref.cluster_id_to_indices[i].values()
        }
        dev_part = {
            frozenset(idx[0].tolist()) for idx in dev.cluster_id_to_indices[i].values()
        }
        assert dev_part == ref_part
        assert dev.pooled_embeddings[i].shape == ref.pooled_embeddings[i].shape


def test_pool_factor_one_is_identity():
    rng = np.random.default_rng(2)
    docs = _unit_docs(rng, [8, 8])
    padded, mask = _pad(docs, 8)
    pooled, cmask, assign = ward_pool_padded(
        jnp.asarray(padded), jnp.asarray(mask), pool_factor=1
    )
    np.testing.assert_array_equal(np.asarray(pooled), padded)
    assert np.asarray(cmask).all()


def test_single_cluster_doc():
    # n // pool_factor < 1 -> one cluster holding every token
    rng = np.random.default_rng(3)
    docs = _unit_docs(rng, [5])
    padded, mask = _pad(docs, 8)
    pooled, cmask, assign = map(
        np.asarray, _WARD(jnp.asarray(padded), jnp.asarray(mask), pool_factor=8)
    )
    assert int(cmask[0].sum()) == 1
    mean = docs[0].mean(axis=0)
    mean /= np.linalg.norm(mean)
    np.testing.assert_allclose(pooled[0, 0], mean, atol=1e-6)
    assert (assign[0, :5] == 0).all()


def test_device_index_builder_ward_pooling():
    """embed -> pool(ward) -> index stays on device and scores sanely."""
    from colpali_tpu.retrieval.store import DeviceIndexBuilder

    rng = np.random.default_rng(4)
    docs = _unit_docs(rng, [48] * 4, dim=128)
    emb = jnp.asarray(np.stack(docs))
    builder = DeviceIndexBuilder(doc_tokens=16, dim=128, dtype="bf16", pool_factor=3)
    builder.add(emb)
    index = builder.build()
    assert index.num_docs == 4
    # each doc's own (unpooled) tokens retrieve it
    queries = [d[:8] for d in docs]
    _, ids = index.search(queries, k=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))
