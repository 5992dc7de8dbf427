"""Device-resident MaxSim corpus index.

The TPU-native replacement for both the reference's CPU-blocked scoring loop
(processing_utils.py:170-181) and its optional external Rust PLAID index
(:189-244). The corpus lives in accelerator HBM in token-major layout
(see ops/maxsim_pallas.py); queries are scored by the fused Pallas kernel and
top-k is computed on device. Compression (int8 per-token quantization, token
pooling upstream) keeps 1M-page corpora within HBM.

Multi-chip: pass a ``jax.sharding.Mesh`` — the corpus is sharded over the doc
axis across devices, each chip scores its shard (kernel unchanged), and top-k
is reduced globally. This is SURVEY.md §5's "corpus axis takes the place ring
attention occupies elsewhere".
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colpali_tpu.ops.maxsim import maxsim
from colpali_tpu.ops.maxsim_binary import (
    binary_maxsim_pallas_tiled,
    binary_maxsim_xla_tiled,
    fill_doc_padding,
)
from colpali_tpu.ops.maxsim_pallas import (
    DOC_TILE,
    gather_candidates_pallas,
    maxsim_pallas_int8_tiled,
    maxsim_pallas_int8mxu_tiled,
    maxsim_pallas_tiled,
)
from colpali_tpu.ops.quant import binarize_words, quantize_per_token
from colpali_tpu.utils.tensor_utils import pad_sequences, round_up

Array = Union[np.ndarray, jnp.ndarray]

#: LRU bound on cached fused-search executables per index (a serving
#: deployment uses ~a dozen (kernel, k-bucket) shapes; direct callers with
#: unbounded k diversity should not leak compiles forever)
_JIT_CACHE_MAX = 32


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def gather_rerank(
    queries: jnp.ndarray,
    store: jnp.ndarray,
    scales: Optional[jnp.ndarray],
    cand: jnp.ndarray,
    use_kernel: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact MaxSim over candidate docs gathered from a tile-major store.

    queries ``(B, Nq, D)`` f32; store ``(nt, Np, DOC_TILE, D)`` int8/bf16
    (+ optional ``(nt, Np, DOC_TILE)`` f32 scales); cand ``(B, c)`` doc ids
    local to the store. Returns ``(B, c)`` exact f32 scores.

    use_kernel=True routes the gather through the scalar-prefetch Pallas
    kernel (ops/maxsim_pallas.gather_candidates_pallas) — the TPU path. The
    fallback is a lax.map of two-level dynamic_slices: a two-axis
    advanced-indexing gather (and a width-1 lane slice inside a loop) makes
    XLA:TPU relayout-copy the ENTIRE store (+7.6 GB HBM at 1M docs), so the
    full tile is sliced first (layout-preserving), then the lane — with an
    optimization_barrier between them, or XLA hoists the lane slice back
    onto the big operand and re-materializes the copy.
    """
    b, c = cand.shape
    nt, np_, t_, d = store.shape
    flat = cand.reshape(-1)

    if use_kernel:
        docs, scl = gather_candidates_pallas(store, scales, flat, interpret=interpret)
        docs = docs.astype(jnp.float32)
        if scl is not None:
            docs = docs * scl[..., None]
    else:

        def get_one(i):
            t, lane = i // DOC_TILE, i % DOC_TILE
            tile = jax.lax.dynamic_slice(store, (t, 0, 0, 0), (1, np_, t_, d))
            tile = jax.lax.optimization_barrier(tile)
            doc = jax.lax.dynamic_slice(tile, (0, 0, lane, 0), (1, np_, 1, d))
            doc = doc.reshape(np_, d).astype(jnp.float32)
            if scales is not None:
                stile = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice(scales, (t, 0, 0), (1, np_, t_))
                )
                s = jax.lax.dynamic_slice(stile, (0, 0, lane), (1, np_, 1)).reshape(np_)
                doc = doc * s[:, None]
            return doc

        docs = jax.lax.map(get_one, flat)

    docs = docs.reshape(b, c, np_, d)
    sim = jnp.einsum("bqd,bcnd->bqcn", queries, docs)
    return jnp.sum(jnp.max(sim, axis=-1), axis=1)


class CorpusIndex:
    """MaxSim index over a fixed document corpus.

    Args:
        doc_embeddings: ragged list of ``(len_i, dim)`` arrays (or a padded 3D
            array) of L2-normalized doc token embeddings.
        dtype: storage dtype — "bf16" or "int8" (per-token symmetric quant).
        doc_tokens: pad every doc to this many tokens (defaults to the max
            length, rounded up to a multiple of 16). Shorter than the longest
            doc is an error unless ``truncate=True`` (pool upstream instead —
            see compression.token_pooling).
        mesh: optional device mesh; shards the corpus over ``axis``.
        axis: mesh axis name for the doc shard dimension.
        force_kernel: None (default) picks the Pallas kernel on TPU and the
            XLA fallback elsewhere; True forces the kernel (interpret mode
            off-TPU — this is how the shard_map serving path is tested
            hermetically); False forces the XLA fallback.
        truncate: opt in to silently dropping tokens beyond ``doc_tokens``.
        prefilter: ``"binary"`` additionally stores packed sign bits
            (ops/quant.binarize_words — 16x smaller than bf16) and makes
            :meth:`search` two-tier: an XOR+popcount coarse pass shortlists
            ``candidates`` docs, then the exact store rescores only those.
            This is the PLAID-role approximate path for corpora (or latency
            targets) the exact kernel can't serve
            (reference processing_utils.py:189-244).
        coarse_pool: build the sign sketch from mean-pooled groups of
            ``coarse_pool`` contiguous doc tokens instead of every token
            (``sign(sum of group))`` — padding is zero so the plain group sum
            IS the valid-masked sum). The coarse pass is VPU-compute-bound
            (docs/PERF.md), so its cost AND its HBM bytes shrink by the
            factor; rerank scores stay exact. Candidate quality is
            corpus-dependent — measure with :meth:`estimate_recall` /
            :meth:`tune_candidates` (adjacent tokens of real pages are
            spatially adjacent patches, so contiguous mean-pooling is the
            same locality bet HierarchicalTokenPooler wins on).

    The build is chunked: the fp32 corpus is packed (padded, tiled,
    quantized) ``_BUILD_CHUNK_DOCS`` docs at a time into a preallocated
    int8/bf16 host buffer, so peak host memory is the packed size plus one
    chunk — never a full fp32 copy (1M x 64 x 128 fp32 would be 33 GB).
    """

    _BUILD_CHUNK_DOCS = 64 * DOC_TILE  # 8192 docs of fp32 scratch per chunk

    def __init__(
        self,
        doc_embeddings: Union[Sequence[Array], Array],
        dtype: str = "bf16",
        doc_tokens: Optional[int] = None,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        quantize_queries: bool = True,
        force_kernel: Optional[bool] = None,
        truncate: bool = False,
        prefilter: Optional[str] = None,
        coarse_pool: int = 1,
    ):
        self._init_common(dtype, mesh, axis, quantize_queries, force_kernel, prefilter, coarse_pool)

        if isinstance(doc_embeddings, (list, tuple)):
            docs_list = [np.asarray(d, dtype=np.float32) for d in doc_embeddings]
        else:
            arr = np.asarray(doc_embeddings, dtype=np.float32)
            docs_list = list(arr)
        if not docs_list:
            raise ValueError("No documents provided")
        self.num_docs = len(docs_list)
        self.dim = docs_list[0].shape[-1]

        max_len = max(d.shape[0] for d in docs_list)
        target_tokens = doc_tokens or max_len
        if target_tokens < max_len:
            if not truncate:
                raise ValueError(
                    f"doc_tokens={target_tokens} would truncate documents up to "
                    f"{max_len} tokens long; pool the corpus upstream "
                    "(compression.token_pooling) or pass truncate=True"
                )
            docs_list = [d[:target_tokens] for d in docs_list]
        self.doc_tokens = round_up(target_tokens, 16)
        if self.prefilter == "binary" and self.dim % 32 != 0:
            raise ValueError(f"binary prefilter needs dim % 32 == 0, got {self.dim}")
        if self.doc_tokens % self.coarse_pool != 0:
            raise ValueError(
                f"coarse_pool={self.coarse_pool} must divide doc_tokens={self.doc_tokens}"
            )

        shard_multiple = DOC_TILE * (mesh.shape[axis] if mesh is not None else 1)
        self.padded_docs = round_up(self.num_docs, shard_multiple)
        store_host, scales_host, bwords_host = self._pack_host(docs_list)
        self._put_store(store_host, scales_host, bwords_host)

    def _init_common(
        self, dtype, mesh, axis, quantize_queries, force_kernel, prefilter=None, coarse_pool=1
    ) -> None:
        if dtype not in ("bf16", "int8"):
            raise ValueError(f"Unsupported index dtype: {dtype}")
        if prefilter not in (None, "binary"):
            raise ValueError(f"Unsupported prefilter: {prefilter!r} (None or 'binary')")
        if coarse_pool < 1:
            raise ValueError(f"coarse_pool must be >= 1, got {coarse_pool}")
        if coarse_pool > 1 and prefilter != "binary":
            raise ValueError("coarse_pool > 1 requires prefilter='binary'")
        self.coarse_pool = coarse_pool
        self.dtype = dtype
        # int8 indexes default to the full-int8 MXU kernel (pass False for
        # the bf16-matmul dequant kernel: slower, no query quant error)
        self.quantize_queries = quantize_queries
        self.mesh = mesh
        self.axis = axis
        self.force_kernel = force_kernel
        self.prefilter = prefilter
        self._bwords = None
        # two-tier shortlist size used when search(candidates=None); set
        # explicitly or via tune_candidates() (recall-targeted doubling)
        self.default_candidates: Optional[int] = None
        # fused-search executables keyed by (kind, k, candidates, corpus
        # shape) — see _fused_search_fn
        self._jit_cache: dict = {}

    def _pack_host(
        self, docs_list, n_tiles: Optional[int] = None
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
        """Pack ragged fp32 docs into the tile-major serving layout
        (C//DOC_TILE, Np, DOC_TILE, D) int8/bf16 host arrays, chunk by chunk."""
        import ml_dtypes

        n_tiles = n_tiles if n_tiles is not None else self.padded_docs // DOC_TILE
        np_, d = self.doc_tokens, self.dim
        if self.dtype == "int8":
            store_host = np.zeros((n_tiles, np_, DOC_TILE, d), np.int8)
            scales_host = np.ones((n_tiles, np_, DOC_TILE), np.float32)
        else:
            store_host = np.zeros((n_tiles, np_, DOC_TILE, d), ml_dtypes.bfloat16)
            scales_host = None
        bwords_host = None
        if self.prefilter == "binary":
            # word-major packed sign bits (see ops/maxsim_binary); with
            # coarse_pool > 1 the sketch covers pooled token groups
            bwords_host = np.zeros(
                (n_tiles, d // 32, np_ // self.coarse_pool, DOC_TILE), np.int32
            )

        # chunk boundaries must land on tile boundaries for t0 = start//DOC_TILE
        chunk = max(DOC_TILE, self._BUILD_CHUNK_DOCS - self._BUILD_CHUNK_DOCS % DOC_TILE)
        for start in range(0, len(docs_list), chunk):
            block = docs_list[start : start + chunk]
            padded = pad_sequences(block, pad_to=np_)  # (c, Np, D) fp32 scratch
            c = padded.shape[0]
            if c % DOC_TILE != 0:  # last chunk: pad up to the tile boundary
                padded = np.concatenate(
                    [padded, np.zeros((round_up(c, DOC_TILE) - c, np_, d), np.float32)]
                )
            # doc-major -> tile-major (see ops.maxsim_pallas.to_tile_major)
            tiled = (
                padded.reshape(-1, DOC_TILE, np_, d).transpose(0, 2, 1, 3)
            )
            t0 = start // DOC_TILE
            t1 = t0 + tiled.shape[0]
            if self.dtype == "int8":
                # host-side mirror of ops.quant.quantize_per_token (same
                # round-half-even, same absmax>0 guard) — bit-identical
                absmax = np.max(np.abs(tiled), axis=-1)
                scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
                store_host[t0:t1] = np.round(tiled / scale[..., None]).astype(np.int8)
                scales_host[t0:t1] = scale
            else:
                store_host[t0:t1] = tiled.astype(ml_dtypes.bfloat16)
            if bwords_host is not None:
                # host-side mirror of ops.quant.binarize_words +
                # ops.maxsim_binary.fill_doc_padding (padded tokens take the
                # doc's FIRST VALID token's words — duplicates are
                # score-neutral under max, and left-padded docs must not
                # inherit an all-zero masked token 0)
                src = tiled
                if self.coarse_pool > 1:
                    # mean-pool contiguous token groups for the sketch only;
                    # padding is zero, so the plain sum IS the masked sum and
                    # sign(sum) == sign(mean-over-valid)
                    f = self.coarse_pool
                    src = tiled.reshape(t1 - t0, np_ // f, f, DOC_TILE, d).sum(axis=2)
                npc = src.shape[1]
                bits = (src > 0).astype(np.uint32).reshape(t1 - t0, npc, DOC_TILE, d // 32, 32)
                weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
                words = np.sum(bits * weights, axis=-1, dtype=np.uint32).astype(np.int32)
                valid = np.any(src != 0, axis=-1)  # (nt, Npc, T)
                first_valid = np.argmax(valid, axis=1)  # (nt, T)
                fill = np.take_along_axis(words, first_valid[:, None, :, None], axis=1)
                words = np.where(valid[..., None], words, fill)
                bwords_host[t0:t1] = words.transpose(0, 3, 1, 2)
        return store_host, scales_host, bwords_host

    def _put_store(
        self,
        store_host: np.ndarray,
        scales_host: Optional[np.ndarray],
        bwords_host: Optional[np.ndarray] = None,
    ) -> None:
        self._store = self._device_put(jnp.asarray(store_host), P(self.axis, None, None, None))
        self._scales = (
            None
            if scales_host is None
            else self._device_put(jnp.asarray(scales_host), P(self.axis, None, None))
        )
        if bwords_host is not None:
            self._bwords = self._device_put(jnp.asarray(bwords_host), P(self.axis, None, None, None))

    # -- incremental ingestion ----------------------------------------------

    def extend(
        self,
        doc_embeddings: Union[Sequence[Array], Array],
        host_assemble: bool = False,
    ) -> None:
        """Append documents in place — doc ids continue from ``num_docs``.

        Only the partially-filled tail tile (plus, on a mesh, any trailing
        fake pad tiles, which are dropped) is fetched from the device
        (~1 MB); its real docs are dequantized, repacked together with the
        new docs, and the packed tiles are concatenated onto the store.
        int8 dequant -> requant round-trips losslessly (absmax, and hence
        the scale, is unchanged), so extending N times equals one build for
        the store and scales. (Prefilter sign bits of the repacked tail may
        differ from a from-scratch build for components whose int8 value is
        0 — the sketch sees the quantized sign; rerank scores are exact
        either way.) Neither the reference's CPU scoring nor its PLAID index
        supports incremental adds (a rebuild each time).

        Mesh-sharded indexes are repartitioned: the total tile count is
        re-padded to a multiple of ``DOC_TILE * n_shards`` so every chip
        keeps an equal tile count, and the device_put redistributes tiles
        (global doc ids are tile-order, so ids are stable).

        HBM peak: the default on-device concatenate transiently holds ~2x
        the index (old + concatenated copy) per chip — at 1M unpooled pages
        (8.2 GB int8 + 1 GB sign words single-chip) that exceeds a 16 GB
        v5e chip. Pass ``host_assemble=True`` to round-trip the old tiles
        through host RAM and re-upload once, bounding the device peak to
        ~1x the new index size (slower: one full download + upload).
        """
        if isinstance(doc_embeddings, (list, tuple)):
            new_docs = [np.asarray(d, dtype=np.float32) for d in doc_embeddings]
        else:
            new_docs = list(np.asarray(doc_embeddings, dtype=np.float32))
        if not new_docs:
            return
        n_added = len(new_docs)
        if any(d.shape[-1] != self.dim for d in new_docs):
            raise ValueError(f"dim mismatch: index dim {self.dim}")
        too_long = max(d.shape[0] for d in new_docs)
        if too_long > self.doc_tokens:
            raise ValueError(
                f"new docs up to {too_long} tokens > doc_tokens={self.doc_tokens}; "
                "pool upstream (compression.token_pooling)"
            )

        keep_tiles = self.num_docs // DOC_TILE
        tail = self.num_docs % DOC_TILE
        if tail:
            # (Np, DOC_TILE, D) -> per-doc fp32 rows of the tail tile
            tile = np.asarray(self._store[keep_tiles], np.float32)
            if self._scales is not None:
                tile = tile * np.asarray(self._scales[keep_tiles], np.float32)[..., None]
            tail_docs = [tile[:, lane, :] for lane in range(tail)]
            new_docs = tail_docs + new_docs

        num_docs_new = self.num_docs + n_added
        shard_multiple = DOC_TILE * (self.mesh.shape[self.axis] if self.mesh is not None else 1)
        n_total_tiles = round_up(num_docs_new, shard_multiple) // DOC_TILE
        n_new_tiles = n_total_tiles - keep_tiles
        store_h, scales_h, bwords_h = self._pack_host(new_docs, n_tiles=n_new_tiles)

        if host_assemble:
            # download old tiles, FREE the device buffers, then upload once:
            # device peak stays ~1x the new index (+ transfer staging).
            def fetch(old):
                return np.asarray(old[:keep_tiles]) if keep_tiles else None

            old_store, old_scales, old_bwords = fetch(self._store), None, None
            if self._scales is not None:
                old_scales = fetch(self._scales)
            if self._bwords is not None:
                old_bwords = fetch(self._bwords)
            self._store = self._scales = self._bwords = None

            def cat(old_host, new_host, spec):
                full = new_host if old_host is None else np.concatenate([old_host, new_host])
                return self._device_put(jnp.asarray(full), spec)

            self._store = cat(old_store, store_h, P(self.axis, None, None, None))
            if old_scales is not None or scales_h is not None:
                self._scales = cat(old_scales, scales_h, P(self.axis, None, None))
            if old_bwords is not None or bwords_h is not None:
                self._bwords = cat(old_bwords, bwords_h, P(self.axis, None, None, None))
        else:

            def cat(old, new_host, spec):
                # the new tile count alone need not divide over the mesh —
                # upload replicated, concat, then reshard the full store so
                # every chip keeps an equal tile count
                rep = P(*([None] * len(spec)))
                new_dev = self._device_put(jnp.asarray(new_host), rep)
                out = jnp.concatenate([old[:keep_tiles], new_dev]) if keep_tiles else new_dev
                return self._device_put(out, spec)

            self._store = cat(self._store, store_h, P(self.axis, None, None, None))
            if self._scales is not None:
                self._scales = cat(self._scales, scales_h, P(self.axis, None, None))
            if self._bwords is not None:
                self._bwords = cat(self._bwords, bwords_h, P(self.axis, None, None, None))
        self.num_docs = num_docs_new
        self.padded_docs = n_total_tiles * DOC_TILE
        # every cached fused-search executable is keyed on the OLD corpus
        # shape — permanently stranded after this resize; drop them so a
        # long-lived growing server doesn't leak compiles
        self._jit_cache.clear()

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        """Serialize the packed index (store tiles + scales + metadata) so
        serving can boot without re-padding/re-quantizing the corpus — the
        role of the reference's PLAID index directory (processing_utils.py:223-244)."""
        if not str(path).endswith(".npz"):  # np.savez appends it silently
            raise ValueError(f"Index path must end with .npz, got {path!r}")
        store = np.asarray(self._store)
        payload = {
            "store": store.view(np.uint16) if self.dtype == "bf16" else store,
            "num_docs": np.int64(self.num_docs),
            "doc_tokens": np.int64(self.doc_tokens),
            "dim": np.int64(self.dim),
            "dtype": np.bytes_(self.dtype.encode()),
        }
        if self._scales is not None:
            payload["scales"] = np.asarray(self._scales)
        if self._bwords is not None:
            payload["bwords"] = np.asarray(self._bwords)
            payload["coarse_pool"] = np.int64(self.coarse_pool)
        np.savez(path, **payload)

    @classmethod
    def load(
        cls,
        path: str,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        quantize_queries: bool = True,
        force_kernel: Optional[bool] = None,
    ) -> "CorpusIndex":
        """Restore an index written by :meth:`save` (re-sharding over a new
        mesh is allowed as long as the saved tile count divides over it)."""
        import ml_dtypes

        data = np.load(path)
        dtype = bytes(data["dtype"]).decode()
        self = object.__new__(cls)
        self._init_common(
            dtype, mesh, axis, quantize_queries, force_kernel,
            prefilter="binary" if "bwords" in data else None,
            coarse_pool=int(data["coarse_pool"]) if "coarse_pool" in data else 1,
        )
        self.num_docs = int(data["num_docs"])
        self.doc_tokens = int(data["doc_tokens"])
        self.dim = int(data["dim"])
        store = data["store"]
        if dtype == "bf16":
            store = store.view(ml_dtypes.bfloat16)
        self.padded_docs = store.shape[0] * DOC_TILE
        shard_multiple = DOC_TILE * (mesh.shape[axis] if mesh is not None else 1)
        if self.padded_docs % shard_multiple != 0:
            raise ValueError(
                f"Saved index has {store.shape[0]} tiles, not divisible over a "
                f"{mesh.shape[axis]}-way {axis!r} mesh axis"
            )
        self._put_store(
            store,
            data["scales"] if "scales" in data else None,
            data["bwords"] if "bwords" in data else None,
        )
        return self

    def _device_put(self, x: jnp.ndarray, spec: P) -> jnp.ndarray:
        if self.mesh is None:
            return jax.device_put(x)
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    @property
    def nbytes(self) -> int:
        n = self._store.size * self._store.dtype.itemsize
        if self._scales is not None:
            n += self._scales.size * self._scales.dtype.itemsize
        if self._bwords is not None:
            n += self._bwords.size * 4
        return n

    def _score_padded(
        self,
        queries: jnp.ndarray,
        store: Optional[jnp.ndarray] = None,
        scales: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """(B, Nq, D) -> (B, padded_docs) fp32 scores.

        ``store``/``scales`` default to this index's arrays; the fused
        jitted search paths pass them explicitly as jit ARGUMENTS (a jit
        that closes over a multi-GB device array captures it as a constant
        and serializes it through remote-attach tunnels at lowering)."""
        store = self._store if store is None else store
        scales = self._scales if scales is None else scales
        use_kernel = self.force_kernel if self.force_kernel is not None else _on_tpu()
        if use_kernel:
            # Off-TPU the Pallas kernel runs in interpreter mode — slow, but
            # it exercises the REAL production branch (incl. the shard_map
            # specs below) on the hermetic CPU mesh.
            kernel = self._kernel_fn(interpret=not _on_tpu())
            args = (queries, store) if scales is None else (queries, store, scales)
            if self.mesh is None:
                return kernel(*args)
            # Multi-chip: a pallas_call is opaque to GSPMD, so shard_map it
            # over the corpus axis — each chip scores its local doc shard;
            # the (B, C) output stays sharded over docs for the global top-k
            # (SURVEY.md §5: the corpus axis is this problem's long dimension).
            store_specs = (P(self.axis, None, None, None),) if self._scales is None else (
                P(self.axis, None, None, None), P(self.axis, None, None),
            )
            sharded = jax.shard_map(
                kernel,
                mesh=self.mesh,
                in_specs=(P(), *store_specs),
                out_specs=P(None, self.axis),
                check_vma=False,
            )
            return sharded(*args)
        # CPU/GPU fallback: plain XLA maxsim over the doc-major view (GSPMD
        # shards this automatically when a mesh is attached).
        if self.dtype == "int8":
            store = store.astype(jnp.float32) * scales[..., None]
        n_tiles, np_, t, d = store.shape
        docs = jnp.transpose(store, (0, 2, 1, 3)).reshape(n_tiles * t, np_, d).astype(jnp.float32)
        return maxsim(queries.astype(jnp.float32), docs)

    def _kernel_fn(self, interpret: bool = False):
        """Kernel closure: (queries_f32, store[, scales]) -> (B, C) scores."""
        if self.dtype == "int8":
            if self.quantize_queries:

                def kernel(q, store, scales):
                    q_int8, q_scales = quantize_per_token(q.astype(jnp.float32))
                    return maxsim_pallas_int8mxu_tiled(
                        q_int8, q_scales, store, scales, interpret=interpret
                    )

                return kernel
            return lambda q, store, scales: maxsim_pallas_int8_tiled(
                q.astype(jnp.bfloat16), store, scales, interpret=interpret
            )
        return lambda q, store: maxsim_pallas_tiled(
            q.astype(jnp.bfloat16), store, interpret=interpret
        )

    def score(self, query_embeddings: Union[Sequence[Array], Array]) -> np.ndarray:
        """Full score matrix ``(n_queries, num_docs)`` (reference
        ``score_multi_vector`` semantics)."""
        queries = self._prep_queries(query_embeddings)
        scores = self._score_padded(queries)
        return np.asarray(scores[:, : self.num_docs], dtype=np.float32)

    def search(
        self,
        query_embeddings: Union[Sequence[Array], Array],
        k: int = 10,
        candidates: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k ``(scores, doc_indices)`` per query — the PLAID-equivalent
        serving call (reference ``get_topk_plaid``, processing_utils.py:189).

        With ``prefilter="binary"``, a coarse sign-sketch pass shortlists
        ``candidates`` docs (default: ``default_candidates`` when set — see
        :meth:`tune_candidates` — else ``max(8*k, 64)``; per shard when a
        mesh is attached) and only those are rescored exactly. Returned
        scores are exact; only recall is approximate — measure it with
        :meth:`estimate_recall` on representative queries."""
        queries = self._prep_queries(query_embeddings)
        k = min(k, self.num_docs)
        if self.prefilter == "binary":
            return self._search_prefilter(queries, k, candidates)
        if candidates is not None:
            raise ValueError("candidates= requires an index built with prefilter='binary'")
        fn = self._fused_search_fn("exact", k)
        top_scores, top_idx = fn(queries, self._store, self._scales)
        return np.asarray(top_scores), np.asarray(top_idx)

    def _fused_search_fn(self, kind: str, k: int, c: Optional[int] = None):
        """One-dispatch search executable: the WHOLE search (coarse pass,
        masking, shortlist top-k, gather-rerank, final top-k) fused into a
        single jit so serving pays ONE device dispatch per sweep instead of
        one per eager op (each dispatch costs 10-40 ms RPC on
        remote-attached chips; measured in docs/PERF.md "Serving under
        concurrent load"). The corpus arrays are jit ARGUMENTS, never
        closures (a captured multi-GB constant serializes through the
        tunnel at lowering). Cached per (kind, k, candidates, corpus shape),
        LRU-bounded (direct callers with diverse k would otherwise pin every
        executable forever); extend() resizes the corpus and clears it."""
        key = (kind, k, c, self.num_docs, self.padded_docs)
        fn = self._jit_cache.pop(key, None)
        if fn is not None:
            self._jit_cache[key] = fn  # re-insert: most-recently-used at the end
            return fn
        num_docs, padded_docs = self.num_docs, self.padded_docs

        if kind == "exact":

            def compute(queries, store, scales):
                scores = self._score_padded(queries, store, scales)
                col = jnp.arange(padded_docs)[None, :]
                scores = jnp.where(col < num_docs, scores, -jnp.inf)
                return jax.lax.top_k(scores, k)

        elif kind == "tiered":
            coarse = self._binary_fn()

            def compute(queries, store, scales, bwords):
                q_words, q_valid = binarize_words(queries)
                sc = coarse(q_words, q_valid, bwords)
                col = jnp.arange(padded_docs)[None, :]
                sc = jnp.where(col < num_docs, sc, -jnp.inf)
                _, cand = jax.lax.top_k(sc, c)
                exact = self._rerank(queries, store, scales, cand)
                ts, pos = jax.lax.top_k(exact, k)
                return ts, jnp.take_along_axis(cand, pos, axis=1)

        elif kind == "tiered_mesh":
            compute = self._tiered_mesh_compute(k, c)
        else:
            raise ValueError(f"unknown fused-search kind {kind!r}")
        fn = jax.jit(compute)
        self._jit_cache[key] = fn
        while len(self._jit_cache) > _JIT_CACHE_MAX:
            self._jit_cache.pop(next(iter(self._jit_cache)))
        return fn

    # -- two-tier (binary prefilter) search ---------------------------------

    def _binary_fn(self):
        """Coarse-scorer closure: (q_words, q_valid, bwords) -> (B, C)."""
        use_kernel = self.force_kernel if self.force_kernel is not None else _on_tpu()
        if use_kernel:
            interpret = not _on_tpu()
            return lambda qw, qv, bw: binary_maxsim_pallas_tiled(
                qw, qv, bw, self.dim, interpret=interpret
            )
        return lambda qw, qv, bw: binary_maxsim_xla_tiled(qw, qv, bw, self.dim)

    def _rerank(self, queries, store, scales, cand):
        use_kernel = self.force_kernel if self.force_kernel is not None else _on_tpu()
        return gather_rerank(
            queries, store, scales, cand, use_kernel=use_kernel, interpret=not _on_tpu()
        )

    def _search_prefilter(
        self, queries: jnp.ndarray, k: int, candidates: Optional[int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        candidates = max(candidates or self.default_candidates or max(8 * k, 64), k)

        if self.mesh is None:
            c = min(candidates, self.num_docs)
            fn = self._fused_search_fn("tiered", k, c)
            top_scores, top_idx = fn(queries, self._store, self._scales, self._bwords)
            return np.asarray(top_scores), np.asarray(top_idx)
        c = min(candidates, self.padded_docs // self.mesh.shape[self.axis])
        fn = self._fused_search_fn("tiered_mesh", k, c)
        scales = self._scales if self._scales is not None else jnp.zeros((), jnp.float32)
        top_scores, top_idx = fn(queries, self._store, scales, self._bwords)
        return np.asarray(top_scores), np.asarray(top_idx)

    def _tiered_mesh_compute(self, k: int, c: int):
        """Mesh two-tier sweep body (jitted via _fused_search_fn): every
        chip shortlists ``c`` docs from ITS shard, reranks them exactly,
        and emits its local top-k; the global top-k over the concatenated
        per-shard winners equals the exact top-k of the union of shard
        candidate sets (a superset of the single-device candidate set, so
        recall can only improve)."""
        coarse = self._binary_fn()
        n_shards = self.mesh.shape[self.axis]
        c_local_docs = self.padded_docs // n_shards
        k_local = min(k, c)
        num_docs, axis = self.num_docs, self.axis
        has_scales = self._scales is not None

        def local_search(qw, qv, q, bw, store, scales):
            sc = coarse(qw, qv, bw)  # (B, c_local_docs)
            shard = jax.lax.axis_index(axis).astype(jnp.int32)
            gids = shard * c_local_docs + jnp.arange(c_local_docs, dtype=jnp.int32)
            sc = jnp.where(gids[None, :] < num_docs, sc, -jnp.inf)
            _, cand = jax.lax.top_k(sc, c)
            exact = self._rerank(q, store, scales if has_scales else None, cand)
            # shards holding only zero-padded fake docs (gid >= num_docs)
            # still shortlist them out of the -inf coarse row; their exact
            # rerank score is 0, which would beat real negative scores in
            # the global merge — mask them out of the local winners too
            exact = jnp.where(jnp.take(gids, cand) < num_docs, exact, -jnp.inf)
            ts, pos = jax.lax.top_k(exact, k_local)
            return ts, jnp.take(gids, jnp.take_along_axis(cand, pos, axis=1))

        shard4, shard3 = P(axis, None, None, None), P(axis, None, None)
        scale_spec = shard3 if has_scales else P()
        sharded = jax.shard_map(
            local_search,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), shard4, shard4, scale_spec),
            out_specs=(P(None, axis), P(None, axis)),
            check_vma=False,
        )

        def compute(queries, store, scales, bwords):
            q_words, q_valid = binarize_words(queries)
            all_s, all_i = sharded(q_words, q_valid, queries, bwords, store, scales)
            top_scores, pos = jax.lax.top_k(all_s, k)
            return top_scores, jnp.take_along_axis(all_i, pos, axis=1)

        return compute

    # -- recall management ---------------------------------------------------

    def exact_search(
        self, query_embeddings: Union[Sequence[Array], Array], k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k by scoring EVERY doc exactly, bypassing the prefilter —
        the recall oracle for :meth:`estimate_recall` (and an escape hatch
        when a caller needs guaranteed-exhaustive results from a two-tier
        index)."""
        queries = self._prep_queries(query_embeddings)
        k = min(k, self.num_docs)
        fn = self._fused_search_fn("exact", k)
        top_scores, top_idx = fn(queries, self._store, self._scales)
        return np.asarray(top_scores), np.asarray(top_idx)

    def estimate_recall(
        self,
        query_embeddings: Union[Sequence[Array], Array],
        k: int = 10,
        candidates: Optional[int] = None,
    ) -> float:
        """Measured recall@k of the two-tier path on sample queries: the
        mean fraction of the EXACT top-k that the sign-sketch shortlist +
        rerank returns. The coarse pass's recall is corpus-dependent (1.0 on
        corpora with genuinely relevant docs, but can collapse when all
        scores are an undifferentiated random band — docs/PERF.md), so
        serving deployments should measure it on their own queries rather
        than trust a fixed ``candidates``. Sample ~32+ representative
        queries for a stable estimate."""
        if self.prefilter != "binary":
            raise ValueError("estimate_recall requires an index built with prefilter='binary'")
        k = min(k, self.num_docs)
        _, exact_idx = self.exact_search(query_embeddings, k=k)
        _, tiered_idx = self.search(query_embeddings, k=k, candidates=candidates)
        hits = sum(
            len(set(e.tolist()) & set(t.tolist())) for e, t in zip(exact_idx, tiered_idx)
        )
        return hits / exact_idx.size

    def tune_candidates(
        self,
        query_embeddings: Union[Sequence[Array], Array],
        k: int = 10,
        target_recall: float = 0.95,
        max_candidates: Optional[int] = None,
    ) -> Tuple[int, float]:
        """Grow the shortlist until measured recall@k reaches the target
        (doubling from the default ``max(8k, 64)``), then pin the result as
        this index's default ``candidates`` for :meth:`search`. Returns
        ``(candidates, recall)`` — recall may be below target if the cap
        (default: corpus size) was hit, in which case search degenerates to
        exact scoring cost and callers should drop the prefilter."""
        if self.prefilter != "binary":
            raise ValueError("tune_candidates requires an index built with prefilter='binary'")
        cap = min(max_candidates or self.num_docs, self.num_docs)
        c = min(max(8 * k, 64), cap)
        _, exact_idx = self.exact_search(query_embeddings, k=min(k, self.num_docs))
        exact_sets = [set(row.tolist()) for row in exact_idx]
        while True:
            _, tiered_idx = self.search(query_embeddings, k=min(k, self.num_docs), candidates=c)
            hits = sum(len(s & set(t.tolist())) for s, t in zip(exact_sets, tiered_idx))
            recall = hits / exact_idx.size
            if recall >= target_recall or c >= cap:
                break
            c = min(2 * c, cap)
        self.default_candidates = c
        return c, recall

    def _prep_queries(self, qs: Union[Sequence[Array], Array]) -> jnp.ndarray:
        if isinstance(qs, (list, tuple)):
            padded = pad_sequences([np.asarray(q, np.float32) for q in qs], pad_multiple=16)
        else:
            arr = np.asarray(qs, dtype=np.float32)
            if arr.ndim == 2:
                arr = arr[None]
            padded = arr
        return jnp.asarray(padded)


@functools.partial(jax.jit, static_argnames=("dtype", "prefilter", "coarse_pool"))
def _pack_tiles_device(chunk: jnp.ndarray, dtype: str, prefilter: Optional[str],
                       coarse_pool: int = 1):
    """Pack (n*DOC_TILE, Np, D) fp32 docs into tile-major serving arrays ON
    DEVICE: (store, scales|None, bwords|None). Same math as
    CorpusIndex._pack_host (quantize_per_token / binarize_words +
    fill_doc_padding, optional coarse_pool group-sum before binarize), jitted
    so streamed ingestion never leaves the chip."""
    c, np_, d = chunk.shape
    tiled = chunk.reshape(c // DOC_TILE, DOC_TILE, np_, d).transpose(0, 2, 1, 3)
    if dtype == "int8":
        q, scale = quantize_per_token(tiled)
        store, scales = q, scale
    else:
        store, scales = tiled.astype(jnp.bfloat16), None
    bwords = None
    if prefilter == "binary":
        src = chunk
        if coarse_pool > 1:
            # padding tokens are zero by the add() convention, so the plain
            # group sum is the valid-masked sum (mirrors _pack_host)
            src = chunk.reshape(c, np_ // coarse_pool, coarse_pool, d).sum(axis=2)
        npc = src.shape[1]
        words, valid = binarize_words(src)  # (c, Npc, W), (c, Npc)
        words = fill_doc_padding(words, valid)
        bwords = words.reshape(c // DOC_TILE, DOC_TILE, npc, d // 32).transpose(0, 3, 2, 1)
    return store, scales, bwords


class DeviceIndexBuilder:
    """Streaming, device-resident index construction.

    The ingestion half of the serving story: model forwards hand padded
    ``(B, S, D)`` embeddings + validity masks straight to :meth:`add`;
    quantization, sign-packing and the tile-major layout all run on the
    accelerator, and only the finished packed index ever needs the host
    (for :meth:`CorpusIndex.save` — int8, 4x smaller than fp32 npz). No
    reference counterpart: colpali-engine round-trips embeddings through
    host RAM into the external PLAID crate.

    Args:
        doc_tokens: fixed token budget per doc AFTER pooling (inputs are
            padded or must already fit).
        dim: embedding dimension.
        dtype / prefilter: as in :class:`CorpusIndex`.
        pool_factor: optional on-device token pooling during ingestion —
            each added batch is pooled before quantize/pack, so
            embed -> pool -> index never leaves the chip. ``doc_tokens``
            then bounds the POOLED length (``S // pool_factor``).
        pool_method: ``"ward"`` (default) runs
            :func:`compression.token_pooling.ward_pool_padded` — batched
            EXACT Ward agglomerative clustering under jit, partition-
            identical to the reference scipy HierarchicalTokenPooler;
            ``"kmeans"`` runs the cheaper O(T^2)-per-sweep spherical
            k-means (:func:`kmeans_pool_padded`) at a measured retention
            cost (perf/pooling_retention.py).
        coarse_pool: sketch-only token pooling, as in :class:`CorpusIndex`
            (the sign sketch covers mean-pooled groups of ``coarse_pool``
            contiguous POOLED tokens; the exact store is untouched).
    """

    def __init__(self, doc_tokens: int, dim: int, dtype: str = "int8",
                 prefilter: Optional[str] = None,
                 pool_factor: Optional[int] = None, pool_iters: int = 10,
                 pool_method: str = "ward", coarse_pool: int = 1):
        self.doc_tokens = round_up(doc_tokens, 16)
        self.dim = dim
        self.dtype = dtype
        self.prefilter = prefilter
        self.pool_factor = pool_factor
        if coarse_pool > 1 and prefilter != "binary":
            raise ValueError("coarse_pool > 1 requires prefilter='binary'")
        if self.doc_tokens % coarse_pool != 0:
            raise ValueError(
                f"coarse_pool={coarse_pool} must divide doc_tokens={self.doc_tokens}"
            )
        self.coarse_pool = coarse_pool
        self.num_docs = 0
        self._built = False
        self._tiles: list = []  # [(store, scales, bwords)] per packed chunk
        self._pending: list = []  # device (B, Np, D) fp32 batches < one tile
        if pool_factor is not None and pool_factor > 1:
            from functools import partial

            from colpali_tpu.compression.token_pooling import (
                kmeans_pool_padded,
                ward_pool_padded,
            )

            if pool_method == "ward":
                self._pool = jax.jit(partial(ward_pool_padded, pool_factor=pool_factor))
            elif pool_method == "kmeans":
                self._pool = jax.jit(
                    partial(kmeans_pool_padded, pool_factor=pool_factor, iters=pool_iters)
                )
            else:
                raise ValueError(f"pool_method must be 'ward' or 'kmeans', got {pool_method!r}")
        else:
            self._pool = None

    def add(self, embeddings, mask=None) -> None:
        """Ingest a batch of documents.

        embeddings: ``(B, S, D)`` device array (padded model output).
        mask: optional ``(B, S)`` validity; invalid tokens are zeroed (the
        score-neutral padding convention). ``S`` must not exceed
        ``doc_tokens``; shorter batches are zero-padded up.
        """
        if self._built:
            raise RuntimeError(
                "builder already finalized by build(); create a new "
                "DeviceIndexBuilder (or use CorpusIndex.extend) to add more docs"
            )
        if self._pool is not None:
            m = (jnp.ones(embeddings.shape[:2], jnp.float32)
                 if mask is None else mask.astype(jnp.float32))
            embeddings, mask, _ = self._pool(embeddings, m)
        b, s, d = embeddings.shape
        if d != self.dim:
            raise ValueError(f"dim mismatch: builder {self.dim}, batch {d}")
        if s > self.doc_tokens:
            raise ValueError(
                f"batch has {s} tokens > doc_tokens={self.doc_tokens}; pool "
                "upstream (compression.token_pooling) or raise doc_tokens"
            )
        x = embeddings.astype(jnp.float32)
        if mask is not None:
            x = x * mask.astype(jnp.float32)[..., None]
        if s < self.doc_tokens:
            x = jnp.pad(x, ((0, 0), (0, self.doc_tokens - s), (0, 0)))
        self.num_docs += b
        self._pending.append(x)
        self._flush(final=False)

    def _flush(self, final: bool) -> None:
        buffered = sum(int(p.shape[0]) for p in self._pending)
        full = (buffered // DOC_TILE) * DOC_TILE
        target = round_up(buffered, DOC_TILE) if final else full
        if target == 0 or (not final and full == 0):
            return
        chunk = self._pending[0] if len(self._pending) == 1 else jnp.concatenate(self._pending)
        if final and buffered < target:
            chunk = jnp.pad(chunk, ((0, target - buffered), (0, 0), (0, 0)))
        take, rest = chunk[:target], chunk[target:]
        self._pending = [] if (final or rest.shape[0] == 0) else [rest]
        self._tiles.append(
            _pack_tiles_device(take, self.dtype, self.prefilter, self.coarse_pool)
        )

    def build(self, mesh: Optional[Mesh] = None, axis: str = "data") -> CorpusIndex:
        """Finalize into a :class:`CorpusIndex` (re-sharding onto ``mesh``)."""
        if self._built:
            raise RuntimeError("builder already finalized by build()")
        if self.num_docs == 0:
            raise ValueError("No documents added")
        self._built = True
        self._flush(final=True)
        store = jnp.concatenate([t[0] for t in self._tiles])
        scales = None if self.dtype != "int8" else jnp.concatenate([t[1] for t in self._tiles])
        bwords = None if self.prefilter is None else jnp.concatenate([t[2] for t in self._tiles])
        self._tiles = []

        shard_multiple = DOC_TILE * (mesh.shape[axis] if mesh is not None else 1)
        pad_tiles = (round_up(self.num_docs, shard_multiple) - store.shape[0] * DOC_TILE) // DOC_TILE
        if pad_tiles > 0:
            store = jnp.concatenate([store, jnp.zeros((pad_tiles, *store.shape[1:]), store.dtype)])
            if scales is not None:
                scales = jnp.concatenate([scales, jnp.ones((pad_tiles, *scales.shape[1:]), scales.dtype)])
            if bwords is not None:
                bwords = jnp.concatenate([bwords, jnp.zeros((pad_tiles, *bwords.shape[1:]), bwords.dtype)])

        index = object.__new__(CorpusIndex)
        index._init_common(self.dtype, mesh, axis, True, None, self.prefilter, self.coarse_pool)
        index.num_docs = self.num_docs
        index.doc_tokens = self.doc_tokens
        index.dim = self.dim
        index.padded_docs = store.shape[0] * DOC_TILE
        index._put_store(store, scales, bwords)
        return index
