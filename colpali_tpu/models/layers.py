"""Shared transformer building blocks (flax.linen).

One implementation each of RMSNorm / rotary / attention / gated MLP, reused by
every backbone — the reference instead inherits 10+ HF modeling files. All
blocks take a computation ``dtype`` (bf16 on TPU) and keep numerically
sensitive reductions (normalization statistics, softmax, rotary phases) in
float32, matching HF's mixed-precision conventions so checkpoints are
numerics-faithful.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Dtype = jnp.dtype


def upcast_dtype(dtype: Dtype) -> Dtype:
    """fp32 for everything except f64 inputs (x64 parity testing)."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu_pytorch_tanh — the activation Gemma and SigLIP use."""
    return nn.gelu(x, approximate=True)


ACTIVATIONS: dict[str, Callable] = {
    "gelu_pytorch_tanh": gelu_tanh,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "silu": nn.silu,
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
}


class RMSNorm(nn.Module):
    """RMS normalization with fp32 statistics.

    ``add_unit_offset=True`` is the Gemma convention (weight stored as
    deviation from 1, HF GemmaRMSNorm); ``False`` is the Llama/Qwen
    convention.
    """

    eps: float = 1e-6
    add_unit_offset: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        w = self.param("weight", nn.initializers.zeros if self.add_unit_offset else nn.initializers.ones,
                       (x.shape[-1],), self.param_dtype)
        up = upcast_dtype(dtype)
        xf = x.astype(up)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        scale = (1.0 + w.astype(up)) if self.add_unit_offset else w.astype(up)
        return (xf * scale).astype(dtype)


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary phase tables, fp32 (HF GemmaRotaryEmbedding convention).

    positions: ``(B, S)`` int -> cos/sin ``(B, S, head_dim)`` where the
    second half duplicates the first (rotate-half layout).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(inv_freq.dtype)[..., None] * inv_freq[None, None, :]  # (B, S, Dh/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding, rotate-half convention.

    x: ``(B, S, H, Dh)``; cos/sin: ``(B, S, Dh)`` where the second half
    duplicates the first (every table builder in this repo emits
    ``concat([f, f], -1)`` — rope_cos_sin, mrope_cos_sin,
    interleaved_mrope_cos_sin, the vision towers).

    Computed over HALF tables: out = concat(x1*c - x2*s, x2*c + x1*s).
    Value-identical to ``x*cos + rotate_half(x)*sin`` (same elementwise ops
    per element), but the naive form materializes rotate_half's concat as a
    full upcast copy before the multiply — measured +3.3 ms/layer on the
    ColQwen2 vision block (perf/attn_module_probe.py); this form reads x
    once and writes the output once.

    The multiply runs in x's own dtype (HF's apply_rotary_pos_emb casts
    cos/sin to the query dtype, i.e. bf16 math at bf16 runtime; tables are
    still generated in fp32). For fp32/f64 inputs this is identical to the
    old fp32-upcast path — the f64-exact parity suite is unaffected; at
    bf16 it saves another 0.8 ms/layer (perf/attn_module_probe2.py) and the
    rounding is the same order as the bf16 activations themselves.
    """
    half = x.shape[-1] // 2
    c = cos[:, :, None, :half].astype(x.dtype)
    s = sin[:, :, None, :half].astype(x.dtype)
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def make_attention_bias(attention_mask: jnp.ndarray, causal: bool, dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """Build an additive ``(B, 1, S, S)`` attention bias from a ``(B, S)``
    key-validity mask, optionally causal.

    Full (non-causal) masking over valid tokens is the PaliGemma prefix
    semantics (modeling_paligemma.py:206: inference zeroes the causal part).
    """
    b, s = attention_mask.shape
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        bias = bias + jnp.where(k_idx <= q_idx, 0.0, neg)[None, None]
    return jnp.maximum(bias, neg).astype(dtype)


# fp32 attention-logits budget for auto query chunking (see Attention.q_chunk)
_ATTN_LOGITS_BUDGET = 512 * 1024 * 1024

# flash (fused-softmax Pallas) attention: candidate sequence block sizes —
# the seq is padded up to a multiple of the chosen block and the pad masked
# via segment ids. 512 is fastest when it divides cleanly (flash-probe
# sweeps); 256 rescues shapes where 512 would pad heavily (768-patch vision:
# 25% tax at 512, zero at 256 — measured fwd 2.31 vs einsum 2.78 ms and
# fwd+bwd 3.72 vs 9.06 ms at B=8 S=768 H=16 D=80). 128 measured strictly
# worse than einsum at both probe shapes; not a candidate.
_FLASH_BLOCKS = (512, 256)
_FLASH_BLOCK = _FLASH_BLOCKS[0]  # kept for perf probes that sweep manually


def flash_block_for(seq_len: int) -> int:
    """Pick the block with the least sequence padding (ties -> larger)."""
    return min(_FLASH_BLOCKS, key=lambda blk: ((-seq_len) % blk, -blk))


def _flash_available() -> bool:
    """Flash path auto-eligibility: a single real TPU device. Multi-device
    runs keep the XLA path — a pallas_call is opaque to GSPMD, so under a
    tensor-parallel mesh it would force replication instead of sharding —
    UNLESS the caller declares the mesh via :func:`flash_mesh`, which routes
    attention through a ``shard_map`` so each chip runs the fused kernel on
    its local (batch, heads) shard (see :func:`flash_attention_sharded`)."""
    try:
        devs = jax.devices()
    except RuntimeError:
        return False
    return len(devs) == 1 and devs[0].platform == "tpu"


# (mesh, batch_axis, model_axis) declared by the training/serving driver so
# Attention can shard_map the flash kernel instead of falling back to einsum.
_FLASH_MESH_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "colpali_tpu_flash_mesh", default=None
)


@contextlib.contextmanager
def flash_mesh(mesh, batch_axis: str = "data", model_axis: str = "model"):
    """Declare the active device mesh for flash attention.

    A ``pallas_call`` is opaque to GSPMD: under a (data, model) mesh the
    stock flash kernel would force its operands replicated. But attention is
    embarrassingly parallel over (batch, heads) — exactly the axes the
    DP x megatron-TP layout shards — so inside this context ``Attention``
    wraps the kernel in ``jax.shard_map`` with q/k/v sharded
    ``P(batch_axis, None, model_axis, None)``: each chip runs the fused
    kernel on its local shard, zero collectives, and the surrounding
    row-parallel o_proj psum is unchanged. The context must be active while
    the step function is TRACED (wrap the body passed to ``jax.jit``, as
    ``training.trainer.shard_train_step`` does), since eligibility is a
    trace-time decision.
    """
    tok = _FLASH_MESH_CTX.set((mesh, batch_axis, model_axis))
    try:
        yield
    finally:
        _FLASH_MESH_CTX.reset(tok)


# w8a8 serving mode: when set, Attention/GatedMLP/MLP route their large
# projections through ops.quant_dense.int8_dot_general (int8 MXU, measured
# 2.08x bf16 raw / 1.67x with dequant — perf/int8_matmul_probe.py). The op
# self-gates by shape, so small glue (the 128-d retrieval head, patch
# embeds under 512) stays exact.
_QUANT_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "colpali_tpu_quant_dense", default=False
)


@contextlib.contextmanager
def quantized_acts(enable: bool = True):
    """Enable the dynamic w8a8 path for Dense projections inside this context.

    Like :func:`flash_mesh`, this is a TRACE-time decision: the context must
    be active while the forward is traced (wrap the first call of the jitted
    function, or the ``jax.jit`` call site for AOT lowering). A function
    already compiled outside the context keeps its exact bf16 program.

    CAVEAT (pinned by tests/ops/test_quant_dense.py): JAX's jaxpr trace
    cache is keyed on the *underlying function's identity* — even two
    separate ``jax.jit`` wrappers of the same function share it, so jitting
    the same ``fn`` once outside and once inside the context silently serves
    the first program to both. When toggling modes, give each mode its own
    function object: build the forward through a fresh closure per mode
    (what `load_retriever`-style factories do naturally), or thread an
    explicit ``quantized`` static argument instead of relying on the
    context alone.

    Intended for serving/embedding forwards. Training keeps bf16: the
    straight-through estimator questions and per-step weight re-quantization
    are not worth it for LoRA fine-tunes whose base weights are frozen.
    """
    tok = _QUANT_CTX.set(enable)
    try:
        yield
    finally:
        _QUANT_CTX.reset(tok)


def dense_dot_general():
    """The ``dot_general`` override for nn.Dense under the active quant
    policy (None = default exact path)."""
    if _QUANT_CTX.get():
        from colpali_tpu.ops.quant_dense import int8_dot_general

        return int8_dot_general
    return None


class QDense(nn.Module):
    """``nn.Dense`` with the serving quantization policy built in.

    The param tree is IDENTICAL to ``nn.Dense`` (``kernel``/``bias``, same
    initializers and ``param_dtype``), so checkpoints, loaders, and export
    are unaffected. Three execution modes, decided per call:

    - **stored int8**: the ``kernel`` leaf handed to ``apply`` is int8
      (produced offline by :func:`colpali_tpu.ops.quant_dense.quantize_params`)
      — matmul via :func:`stored_int8_apply` against the ``quant``
      collection's per-output-channel scale. No per-step weight quantize
      pass, and weight HBM traffic halves (int8 reads vs bf16).
    - **dynamic w8a8**: traced inside :func:`quantized_acts` —
      ``int8_dot_general`` (self-gating by shape; weights re-quantize
      in-jit).
    - **exact** (default): plain ``lax.dot_general`` in ``dtype``.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if kernel.dtype == jnp.int8:
            from colpali_tpu.ops.quant_dense import stored_int8_apply

            scale = self.get_variable("quant", "kernel_scale")
            if scale is None:
                raise ValueError(
                    f"{self.name}: int8 kernel but no 'quant' collection — pass "
                    "model.apply({'params': qp, 'quant': qc}, ...) with both trees "
                    "from ops.quant_dense.quantize_params()."
                )
            out_dtype = self.dtype or jnp.float32
            y = stored_int8_apply(x, kernel, scale, out_dtype)
            return y + bias.astype(out_dtype) if bias is not None else y
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        dg = dense_dot_general() or jax.lax.dot_general
        y = dg(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias if bias is not None else y


def _flash_mesh_ok(ctx, batch: int, heads: int, kv_heads: int, require_tpu: bool = True) -> bool:
    """shard_map flash eligibility: every mesh axis must divide its operand
    axis (batch over data, q AND kv heads over model) and — for the auto
    path — the mesh must be real TPU chips (the stock kernel has no
    interpret mode; CPU test meshes monkeypatch `_flash_kernel_call`)."""
    mesh, batch_axis, model_axis = ctx
    if require_tpu and any(d.platform != "tpu" for d in mesh.devices.flat):
        return False
    dsz = dict(mesh.shape).get(batch_axis, 1)
    msz = dict(mesh.shape).get(model_axis, 1)
    return batch % dsz == 0 and heads % msz == 0 and kv_heads % msz == 0


def flash_attention_sharded(
    q: jnp.ndarray,  # (B, S, H, D) post-rope, GLOBAL arrays
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    mask: jnp.ndarray,  # (B, S) validity or segment ids
    scale: float,
    causal: bool,
    ctx,
) -> jnp.ndarray:
    """Flash attention under a (data, model) mesh: ``shard_map`` the padded
    kernel with batch over the data axis and heads over the model axis.

    Per-shard semantics are exactly :func:`flash_attention_padded` — the
    GQA repeat happens INSIDE the shard (local ``H/m // Hkv/m`` preserves the
    group ratio), the seq/head-dim padding is shard-local, and segment ids
    replicate over model. Sequence stays unsharded: attention mixes tokens,
    so the sequence axis is the one place sharding would need collectives.
    """
    mesh, batch_axis, model_axis = ctx
    ba = batch_axis if batch_axis in mesh.shape else None
    ma = model_axis if model_axis in mesh.shape else None
    spec = P(ba, None, ma, None)
    fn = functools.partial(flash_attention_padded, scale=scale, causal=causal)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(ba, None)),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, mask)


def flash_auto_ok(batch: int, seq_len: int, heads: int, kv_heads: int, dtype) -> bool:
    """Attention's flash auto-rule, exposed for towers that prebuild the
    einsum-fallback biases ONCE when flash won't run (a segment bias built
    inside a scanned block is re-materialized every layer)."""
    ctx = _FLASH_MESH_CTX.get()
    pad_tax = ((-seq_len) % flash_block_for(seq_len)) / seq_len
    avail = (
        _flash_mesh_ok(ctx, batch, heads, kv_heads)
        if ctx is not None
        else _flash_available()
    )
    # tax bound re-measured with the 256 block in play: at S=212 (17.2% tax
    # to 256) flash TIES the einsum forward and wins the backward 0.93 vs
    # 1.21 ms (B=8 H=12 D=128 causal); the known flash-loses case (S=383,
    # 25% tax) stays excluded. 0.18 admits the measured win, keeps the
    # measured loss out.
    return dtype == jnp.bfloat16 and pad_tax <= 0.18 and avail


def segment_bias(segments: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
    """(B, S) segment ids -> (B, 1, S, S) additive fp32 bias (attend iff ids
    match) — the einsum-path equivalent of the flash kernel's SegmentIds."""
    s = segments.shape[1]
    neg = jnp.finfo(jnp.float32).min
    same = segments[:, None, :, None] == segments[:, None, None, :]
    bias = jnp.where(same, 0.0, neg).astype(jnp.float32)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        bias = jnp.maximum(bias + jnp.where(ki <= qi, 0.0, neg)[None, None], neg)
    return bias


def _flash_kernel_call(qt, kt, vt, seg, scale, causal, sizes):
    """The innermost stock-kernel dispatch, isolated so CPU-mesh tests can
    monkeypatch it (the stock TPU kernel has no interpret mode)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    return _fa.flash_attention(
        qt, kt, vt,
        segment_ids=_fa.SegmentIds(q=seg, kv=seg),
        causal=causal,
        sm_scale=scale,
        block_sizes=sizes,
    )


def flash_attention_padded(
    q: jnp.ndarray,  # (B, S, H, D) post-rope
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    mask: jnp.ndarray,  # (B, S) token validity (0/1) OR arbitrary segment ids
    scale: float,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused-softmax attention via the stock Pallas TPU flash kernel, with
    the padding this model zoo needs: head_dim padded up to 128 lanes
    (zeros change no logits; the padded value dims are sliced off) and the
    sequence padded to a _FLASH_BLOCK multiple with segment-id masking
    (pad tokens sit in segment 0, real tokens in 1 — cross-segment
    attention is masked, so real rows never see padding; pad rows produce
    garbage that callers already mask downstream, exactly like the additive
    -inf bias path). ``mask`` may carry ARBITRARY segment ids (tokens attend
    iff ids match) — this expresses windowed attention (Qwen2.5 vision:
    window_id per patch, -1 padding) for free; sequence padding uses id -2,
    which collides with nothing. GQA K/V heads are repeated up to the query
    head count.

    Why: materialized fp32 logits are the serving forward's hottest HBM
    stream — at the ColQwen2 vision shape (B=8, S=2464, 32 layers) they
    cost ~9 GB of traffic per layer, and the fused kernel measures 7.9 ms
    vs 16.8 ms/layer for the chunked einsum path (perf/flash_probe.py).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b, s, h, d = q.shape  # noqa: F841 (b kept for readability)
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    block = flash_block_for(s)
    d_pad = (-d) % 128
    s_pad = (-s) % block
    if d_pad or s_pad:
        # ONE pad op per tensor: separate d-pad + s-pad calls materialize
        # two full copies each (measured in perf/attn_module_probe.py)
        spec = ((0, 0), (0, s_pad), (0, 0), (0, d_pad))
        q = jnp.pad(q, spec)
        k = jnp.pad(k, spec)
        v = jnp.pad(v, spec)
    seg = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, s_pad)), constant_values=-2)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, S, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    blk = min(block, s + s_pad)
    sizes = _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = _flash_kernel_call(qt, kt, vt, seg, scale, causal, sizes)
    out = out.transpose(0, 2, 1, 3)  # (B, S, H, D)
    return out[:, :s, :, :d]


class Attention(nn.Module):
    """Multi-head attention with optional GQA/MQA and rotary embeddings.

    Matches the HF eager attention path: fp32 softmax, ``head_dim**-0.5``
    scaling (configurable), additive bias mask.
    """

    num_heads: int
    head_dim: int
    num_kv_heads: Optional[int] = None  # None -> MHA
    use_bias: bool = False  # bias on q/k/v projections
    out_bias: Optional[bool] = None  # bias on o_proj; None -> same as use_bias
    scale: Optional[float] = None
    out_dim: Optional[int] = None
    qk_norm_eps: Optional[float] = None  # per-head RMS q/k norm (Gemma3, Qwen3)
    qk_norm_offset: bool = True  # Gemma convention (1+w); False for Qwen3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # query-chunked attention: scan over q blocks, bounding logits memory at
    # O(B*H*chunk*S) instead of O(B*H*S^2) — q rows are independent, so
    # results are identical to the dense path. None (default) sizes the
    # chunk from _ATTN_LOGITS_BUDGET (a 32x16-head 2976-token vision batch
    # would otherwise materialize 18.7 GB of fp32 logits — past one chip's
    # HBM); an explicit int forces that chunk (pass >= S for dense).
    q_chunk: Optional[int] = None
    # fused-softmax Pallas flash kernel: None = auto (single real TPU device
    # AND the caller passed a token mask instead of a custom additive bias
    # AND bf16 compute); True/False force. See flash_attention_padded.
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
        rope: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        segments: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, s, model_dim = x.shape
        kv_heads = self.num_kv_heads or self.num_heads
        scale = self.scale if self.scale is not None else self.head_dim**-0.5
        dense = lambda feats, name, bias: QDense(  # noqa: E731
            feats, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        q = dense(self.num_heads * self.head_dim, "q_proj", self.use_bias)(x).reshape(
            b, s, self.num_heads, self.head_dim
        )
        k = dense(kv_heads * self.head_dim, "k_proj", self.use_bias)(x).reshape(b, s, kv_heads, self.head_dim)
        v = dense(kv_heads * self.head_dim, "v_proj", self.use_bias)(x).reshape(b, s, kv_heads, self.head_dim)

        if self.qk_norm_eps is not None:
            q = RMSNorm(eps=self.qk_norm_eps, add_unit_offset=self.qk_norm_offset,
                        param_dtype=self.param_dtype, name="q_norm")(q)
            k = RMSNorm(eps=self.qk_norm_eps, add_unit_offset=self.qk_norm_offset,
                        param_dtype=self.param_dtype, name="k_norm")(k)

        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        flash = self.use_flash
        mesh_ctx = _FLASH_MESH_CTX.get()
        if flash is None:
            # auto: any padding-mask/causal/full attention (no CUSTOM additive
            # bias), bf16 compute, single real TPU device, and a sequence
            # where the _FLASH_BLOCK padding tax stays under 15%. Measured
            # boundaries, both directions: the old block-multiple-or->=2048
            # rule silently dropped the 1496-patch (384-token-cap) vision
            # stack to the einsum path (534 vs 663 pages/min at 768); a 35%
            # threshold then flipped the 383-token TEXT stack onto flash
            # (pad to 512 = 34% tax) and LOST to the fused einsum at that
            # length (417 pages/min) — short-seq logits fit comfortably and
            # the einsum path fuses better than a mostly-padding kernel.
            flash = attn_bias is None and flash_auto_ok(
                b, s, self.num_heads, kv_heads, self.dtype
            )
        if flash:
            if attn_bias is not None:
                raise ValueError(
                    "use_flash=True cannot honor a custom additive attn_bias "
                    "(the kernel only supports segment/causal masking) — pass "
                    "mask/segments, or leave use_flash unset so the auto rule "
                    "routes biased attention to the einsum path"
                )
            seg = segments if segments is not None else mask
            if seg is None:
                seg = jnp.ones((b, s), jnp.int32)
            if mesh_ctx is not None:
                if not _flash_mesh_ok(mesh_ctx, b, self.num_heads, kv_heads, require_tpu=False):
                    raise ValueError(
                        f"flash_mesh axes must divide batch={b}, heads={self.num_heads}, "
                        f"kv_heads={kv_heads} (mesh shape {dict(mesh_ctx[0].shape)})"
                    )
                out = flash_attention_sharded(q, k, v, seg, scale, causal, mesh_ctx)
            else:
                out = flash_attention_padded(q, k, v, seg, scale, causal=causal)
            out = out.reshape(b, s, self.num_heads * self.head_dim)
            o_bias = self.use_bias if self.out_bias is None else self.out_bias
            return dense(self.out_dim or model_dim, "o_proj", o_bias)(out.astype(self.dtype))
        if attn_bias is None and segments is not None:
            # segment-equality mask (windowed attention): attend iff ids match
            attn_bias = segment_bias(segments, causal=causal)
        elif attn_bias is None and mask is not None:
            attn_bias = make_attention_bias(mask.astype(jnp.int32), causal=causal)
        elif attn_bias is None and causal:
            # causal-only (no padding mask): the flash path honors `causal`,
            # so the einsum fallback must too or semantics differ per backend
            attn_bias = make_attention_bias(jnp.ones((b, s), jnp.int32), causal=True)

        groups = self.num_heads // kv_heads
        qg = q.reshape(b, s, kv_heads, groups, self.head_dim)
        up = upcast_dtype(self.dtype)

        def attend(qg_blk, bias_blk):
            # (B, kv, groups, Sq_blk, Sk) logits, fp32 accumulation on MXU.
            logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg_blk, k, preferred_element_type=up) * scale
            if bias_blk is not None:
                logits = logits + bias_blk[:, :, None, :, :].astype(up)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            return jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)

        if self.q_chunk is not None:
            chunk = self.q_chunk
        else:
            per_q_row = b * kv_heads * groups * s * 4  # fp32 logits bytes
            chunk = max(128, _ATTN_LOGITS_BUDGET // per_q_row // 128 * 128)
        if s <= chunk:
            out = attend(qg, attn_bias)
        else:
            # scan over query blocks; q rows are independent so this is
            # value-identical to the dense path at O(chunk*S) logits memory
            pad = (-s) % chunk
            qg_p = jnp.pad(qg, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
            n_blocks = (s + pad) // chunk
            qg_blocks = qg_p.reshape(b, n_blocks, chunk, kv_heads, groups, self.head_dim)
            if attn_bias is not None and attn_bias.shape[2] > 1:
                bias_p = jnp.pad(attn_bias, ((0, 0), (0, 0), (0, pad), (0, 0)))
                bias_blocks = bias_p.reshape(*attn_bias.shape[:2], n_blocks, chunk, -1)

                def step(_, i):
                    return None, attend(qg_blocks[:, i], bias_blocks[:, :, i])
            else:
                # None or a query-broadcast (B, H, 1, Sk) bias: same for
                # every block
                def step(_, i):
                    return None, attend(qg_blocks[:, i], attn_bias)

            _, blocks = jax.lax.scan(step, None, jnp.arange(n_blocks))
            # (n_blocks, B, chunk, h, g, d) -> (B, S, h, g, d)
            out = jnp.moveaxis(blocks, 0, 1).reshape(b, s + pad, kv_heads, groups, self.head_dim)[:, :s]

        out = out.reshape(b, s, self.num_heads * self.head_dim)
        o_bias = self.use_bias if self.out_bias is None else self.out_bias
        return dense(self.out_dim or model_dim, "o_proj", o_bias)(out)


class GatedMLP(nn.Module):
    """SwiGLU/GeGLU MLP: down(act(gate(x)) * up(x)) — Gemma/Qwen style."""

    intermediate_size: int
    activation: str = "gelu_pytorch_tanh"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda feats, name: QDense(  # noqa: E731
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        gate = dense(self.intermediate_size, "gate_proj")(x)
        up = dense(self.intermediate_size, "up_proj")(x)
        act = ACTIVATIONS[self.activation]
        return dense(x.shape[-1], "down_proj")(act(gate) * up)


class MLP(nn.Module):
    """Plain 2-layer MLP with bias (SigLIP/ViT style)."""

    intermediate_size: int
    activation: str = "gelu_pytorch_tanh"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = QDense(self.intermediate_size, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        h = ACTIVATIONS[self.activation](h)
        return QDense(x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)


#: named jax.checkpoint policies for the remat-policy knob. "dots" saves
#: every matmul output and recomputes only the cheap elementwise glue in
#: the backward — the middle ground between full remat (extra full forward
#: recompute, minimal HBM) and no remat (no recompute, OOM at 2B+ on one
#: v5e chip — measured in perf/train_bench.py --no-remat).
REMAT_POLICIES = {
    None: None,
    "dots": jax.checkpoint_policies.checkpoint_dots,
    "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}

# trace-time remat-policy override, same pattern as quantized_acts(): model
# families that don't thread an explicit remat_policy attribute (qwen2_vl
# does) pick the active context policy up here when remat=True. Measured on
# ColQwen2-2B LoRA (perf/train_bench.py --decompose): "dots" cuts the step
# 255.0 -> 246.4 ms vs full remat by skipping the text recompute pass.
_REMAT_POLICY_CTX = contextvars.ContextVar("colpali_tpu_remat_policy", default=None)


@contextlib.contextmanager
def remat_policy_ctx(name: Optional[str]):
    """Activate a named REMAT_POLICIES entry for models traced inside.

    Trace-time only (like quantized_acts): wrap the FIRST (compiling) call
    of the jitted train step; later cached executions ignore it."""
    if name not in REMAT_POLICIES:
        raise ValueError(f"unknown remat policy {name!r}; options: {sorted(k for k in REMAT_POLICIES if k)}")
    token = _REMAT_POLICY_CTX.set(name)
    try:
        yield
    finally:
        _REMAT_POLICY_CTX.reset(token)


def remat_layer(layer_cls, remat: bool, remat_policy=None):
    """``jax.checkpoint``-wrap a layer class per the (remat, policy) knobs.

    ``remat_policy``: a REMAT_POLICIES name, an actual jax policy callable,
    or None — which falls back to the active :func:`remat_policy_ctx`."""
    if not remat:
        return layer_cls
    if remat_policy is None:
        remat_policy = _REMAT_POLICY_CTX.get()
    if isinstance(remat_policy, (str, type(None))):
        if remat_policy not in REMAT_POLICIES:
            raise ValueError(
                f"unknown remat policy {remat_policy!r}; options: "
                f"{sorted(k for k in REMAT_POLICIES if k)}"
            )
        policy = REMAT_POLICIES[remat_policy]
    else:
        policy = remat_policy
    return nn.remat(layer_cls, policy=policy) if policy is not None else nn.remat(layer_cls)


def scanned_stack(
    layer_cls,
    layer_kwargs: dict,
    num_layers: int,
    num_args: int,
    remat: bool = False,
    scanned_args: int = 0,
    collect: bool = False,
    remat_policy=None,
):
    """Build an ``nn.scan`` class over ``num_layers`` copies of a layer.

    One traced layer instead of N: compile time and HLO size drop by
    ~num_layers (the TPU-first choice for deep stacks). Params live at
    ``<name>/layer/...`` with a leading stacked layer axis — use
    :func:`colpali_tpu.core.hf_loader.stack_layer_params` to convert from the
    unrolled ``layers_{i}`` checkpoint layout. ``remat=True`` additionally
    wraps the layer in ``jax.checkpoint`` (the reference's
    gradient_checkpointing_enable, colmodel_torch_training.py:44-55).

    The first ``scanned_args`` layer arguments (after the carry) are scanned
    over their leading (per-layer) axis; the rest broadcast to every layer.
    This is how heterogeneous-but-periodic stacks (Gemma3 sliding/global
    alternation, Qwen3-VL deepstack injection) stay scannable: pass the
    per-layer selector as a scanned input and select inside the layer.

    ``collect=True`` additionally returns the per-layer outputs as the scan's
    ys (a stacked ``(num_layers, ...)`` array) — for stacks whose intermediate
    activations are tapped from outside (Qwen3-VL's deepstack mergers).
    """
    lcls = remat_layer(layer_cls, remat, remat_policy)

    class Body(nn.Module):
        @nn.compact
        def __call__(self, carry, *bargs):
            out = lcls(**layer_kwargs, name="layer")(carry, *bargs)
            return out, (out if collect else None)

    return nn.scan(
        Body,
        # 'quant' = stored-int8 kernel scales (ops/quant_dense.quantize_params):
        # stacked per layer like the params they mirror; absent -> ignored.
        variable_axes={"params": 0, "quant": 0},
        split_rngs={"params": True},
        length=num_layers,
        in_axes=tuple(0 if i < scanned_args else nn.broadcast for i in range(num_args)),
    )


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """L2 normalization; with eps=0 matches torch ``x / x.norm()`` exactly
    (NaN on zero rows, like the reference); pass eps>0 for clamped variants
    (ColModernVBert uses clamp_min 1e-12)."""
    up = upcast_dtype(x.dtype)
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(up)), axis=axis, keepdims=True))
    if eps > 0:
        norm = jnp.maximum(norm, eps)
    return (x.astype(up) / norm).astype(x.dtype)
