"""Seq-major flash attention: a fused-softmax kernel with no layout glue.

**Status: NOT dispatched by the model zoo — a measured negative result,
kept with its tests as the minimal reproduction of a Mosaic layout
pitfall.** `models/layers.py::flash_attention_padded` (the production
path) uses the stock kernel with explicit transpose/pad glue instead.

The hypothesis: the embed pipeline's hottest op is non-causal
segment-masked attention in the vision towers, whose q/k/v arrive as
``(B, S, H, D)`` with D ∈ {72, 80}; feeding the stock kernel costs
materialized HBM passes (transpose to ``(B, H, S, D)``, pad D to 128, pad
S to a block multiple, GQA ``jnp.repeat``), so a kernel reading seq-major
blocks directly should win.

The measurement (perf/flash_seq_probe.py, v5e): numerics are correct
(max|diff| 0.002 bf16 vs the einsum path) but the kernel is 3-10x SLOWER
than the stock wrapper *including* its glue (15.2 ms vs 4.6 ms at the
ColQwen2 vision shape; 0.10x at the GQA text shape). Root cause: Mosaic
tiles the last two dims of a VMEM block, so a per-head 2D tile extracted
from a ``(1, bq, H, D)`` block (``q_ref[0, :, h, :]``) is not a DMA
stride — it lowers to a software relayout (vector shuffles across sublane
tiles), 16x per tensor per grid step. The DMA engine can do strided
per-head fetches, but BlockSpec cannot express them (a ``(1, bq, 1, D)``
block violates the last-two-dims rule for H > 1); only a hand-rolled
``make_async_copy`` pipeline from HBM refs could, and the projected win
(~1.7 ms/layer of glue at the 4.6 ms shape) did not justify it once the
stock kernel's glue was measured at module level (XLA fuses most of it).

Design notes that remain useful:
- Full-head blocks ``(1, bq, H, D)`` are one contiguous DMA; heads are
  statically unrolled in-kernel; head ``h`` reads kv head ``h // groups``
  (GQA without HBM repeat).
- Stores with interleaved unit dims (``o_ref[0, :, h, :]``) are an
  unsupported Mosaic shape cast; stores that only ADD leading unit dims
  (``o_ref[h, 0, :, :]`` into a head-major output) compile — probed
  on-device.
- Per-head scratch lives in row-sliced 2D buffers (slices at block_q
  multiples — sublane-aligned).

Algorithm: standard flash forward (running row-max/denominator, one pass
over kv blocks per q block), matching the reference semantics of
late-interaction attention stacks: tokens attend iff their segment ids
match (mirrors the stock kernel's SegmentIds), optional causal.
Reference behavior anchor: HF eager attention with additive masks
(modeling_qwen2_vl.py:276-312); numerics vs the repo's einsum path are
asserted in tests (interpret mode) and on-device (perf/flash_seq_probe.py).

Forward-only by design: the serving/embedding pipelines never
differentiate through it, and training steps use the GSPMD-partitionable
einsum path (a pallas_call is opaque to GSPMD).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128
_SUBLANES = 8


def _kernel(
    seg_q_ref,  # (1, bq, LANES) int32
    seg_kv_ref,  # (1, SUBLANES, bk) int32
    q_ref,  # (1, bq, H, D)
    k_ref,  # (1, bk, Hkv, D)
    v_ref,  # (1, bk, Hkv, D)
    o_ref,  # (1, bq, H, D)
    m_scr,  # (H*bq, LANES) f32, row-sliced per head
    l_scr,  # (H*bq, LANES) f32
    acc_scr,  # (H*bq, D) f32
    *,
    scale: float,
    causal: bool,
    seq_len: int,
    block_q: int,
    block_k: int,
    num_k: int,
    num_heads: int,
    groups: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute():
        # mask terms shared by every head, computed once per grid step
        sq = seg_q_ref[0, :, :1]  # (bq, 1)
        skv = seg_kv_ref[0, :1, :]  # (1, bk)
        mask = sq == skv
        shape = (block_q, block_k)
        k_idx = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        mask &= k_idx < seq_len
        if causal:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            mask &= k_idx <= q_idx

        for h in range(num_heads):
            q = q_ref[0, :, h, :]  # (bq, D)
            k = k_ref[0, :, h // groups, :]  # (bk, D)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # (bq, bk) f32
            s = jnp.where(mask, s, NEG_INF)

            rows = slice(h * block_q, (h + 1) * block_q)
            m_prev = m_scr[rows, :1]  # (bq, 1)
            l_prev = l_scr[rows, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
            m_next = jnp.maximum(m_prev, m_cur)
            # rows with no valid key keep exp(NEG_INF - NEG_INF) = 1 rows of
            # garbage in l; that only happens for fully-masked (padding)
            # rows, whose output callers mask downstream — same contract as
            # the stock kernel and the additive-bias einsum path.
            p = jnp.exp(s - m_next)  # (bq, bk)
            alpha = jnp.exp(m_prev - m_next)  # (bq, 1)
            l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            v = v_ref[0, :, h // groups, :]  # (bk, D)
            # rows past seq_len are OOB block reads: Pallas leaves them
            # undefined (NaN in interpret mode, garbage on device). p is
            # already 0 there, but 0 * NaN = NaN — zero them.
            kv_rows = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0
            )
            v = jnp.where(kv_rows < seq_len, v, 0)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, D)
            acc_scr[rows, :] = acc_scr[rows, :] * alpha + pv
            m_scr[rows, :] = jnp.broadcast_to(m_next, (block_q, _LANES))
            l_scr[rows, :] = jnp.broadcast_to(l_next, (block_q, _LANES))

    if causal:
        # blocks strictly above the diagonal contribute nothing — skip the
        # matmuls (the grid still visits; scratch is untouched)
        pl.when(ki * block_k <= qi * block_q + block_q - 1)(_compute)
    else:
        _compute()

    @pl.when(ki == num_k - 1)
    def _store():
        # o_ref is head-major (H, 1, bq, D): a (bq, D) tile stored at
        # [h, 0] only ADDS leading unit dims — a shape cast Mosaic
        # supports, unlike interleaved unit dims ((bq,D)->(1,bq,1,D),
        # which it rejects; probed on-device).
        for h in range(num_heads):
            rows = slice(h * block_q, (h + 1) * block_q)
            l = l_scr[rows, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[h, 0, :, :] = (acc_scr[rows, :] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "block_q", "block_k", "interpret")
)
def flash_seqmajor(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    segments: jnp.ndarray,  # (B, S) int — attend iff ids match
    scale: float,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over seq-major tensors. Returns ``(B, S, H, D)``.

    Tokens attend iff their segment ids match (padding = give pads an id no
    real token uses; their output rows are garbage, masked by callers).
    """
    b, s, h, d = q.shape
    hkv = k.shape[2]
    if h % hkv:
        raise ValueError(f"query heads {h} not a multiple of kv heads {hkv}")
    groups = h // hkv
    block_q = min(block_q, pl.cdiv(s, _SUBLANES) * _SUBLANES)
    block_k = min(block_k, pl.cdiv(s, _LANES) * _LANES)
    nq = pl.cdiv(s, block_q)
    nk = pl.cdiv(s, block_k)

    seg = segments.astype(jnp.int32)
    # lane/sublane-broadcast segment views (1D vectors are not Mosaic-friendly)
    seg_q = jnp.broadcast_to(seg[:, :, None], (b, s, _LANES))
    seg_kv = jnp.broadcast_to(seg[:, None, :], (b, _SUBLANES, s))

    grid = (b, nq, nk)
    kernel = functools.partial(
        _kernel,
        scale=scale,
        causal=causal,
        seq_len=s,
        block_q=block_q,
        block_k=block_k,
        num_k=nk,
        num_heads=h,
        groups=groups,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, _LANES), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, _SUBLANES, block_k), lambda bi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, block_q, h, d), lambda bi, qi, ki: (bi, qi, 0, 0)),
            pl.BlockSpec((1, block_k, hkv, d), lambda bi, qi, ki: (bi, ki, 0, 0)),
            pl.BlockSpec((1, block_k, hkv, d), lambda bi, qi, ki: (bi, ki, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (h, 1, block_q, d), lambda bi, qi, ki: (0, bi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((h, b, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h * block_q, _LANES), jnp.float32),
            pltpu.VMEM((h * block_q, _LANES), jnp.float32),
            pltpu.VMEM((h * block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # full-head blocks + per-head f32 scratch exceed the 16 MB
            # default scoped-vmem budget at H=16; v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seg_q, seg_kv, q, k, v)
    # kernel writes head-major; hand callers seq-major. XLA fuses this
    # transpose into the consumer (reshape + o_proj matmul) — it is not an
    # extra HBM pass in the traced graph.
    return jnp.transpose(out, (1, 2, 0, 3))
