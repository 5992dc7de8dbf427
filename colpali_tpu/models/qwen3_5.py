"""Qwen3.5 / Qwen3-Next hybrid backbone + ColQwen3_5 / BiQwen3_5.

Behavioral spec:
- transformers Qwen3Next (modeling_qwen3_next.py) — the architecture family
  the reference's ``Qwen3_5Model`` backbone belongs to: decoder layers
  alternate GatedDeltaNet linear attention (:440-775) with gated full
  attention (output * sigmoid(gate), per-head q/k RMSNorm with unit offset,
  PARTIAL rotary :321-400), RMSNorm with unit offset, dense or sparse-MoE
  MLPs (:793-855).
- reference ColQwen3_5
  (/root/reference/colpali_engine/models/qwen3_5/colqwen3_5/modeling_colqwen3_5.py):
  pixel unpadding + ``dim = config.dim or 128`` head over the last hidden
  state; vision tower exposes patch_size / spatial_merge_size (Qwen3-VL
  style — we reuse our Qwen3VisionTower).

TPU-first notes:
- The gated delta rule runs CHUNKED: the in-chunk "forward substitution"
  (a sequential 64-step loop in the torch fallback) is one triangular solve
  ``(I - T)^{-1}`` on the MXU; the cross-chunk recurrence is a
  ``jax.lax.scan`` carrying the (Dk, Dv) state per head.
- The MoE block is a correctness-first dense dispatch (every expert over all
  tokens, masked combine). Capacity-based expert-parallel dispatch over a
  mesh axis is the production path; for retrieval fine-tunes (LoRA on dense
  projections) this block is frozen anyway.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import (
    remat_layer,
    QDense,
    Dtype,
    GatedMLP,
    RMSNorm,
    make_attention_bias,
    scanned_stack,
    upcast_dtype,
)
from colpali_tpu.models.qwen3_vl import Qwen3VisionTower, Qwen3VLVisionConfig


@dataclasses.dataclass(frozen=True)
class Qwen35TextConfig:
    """Hybrid text decoder (Qwen3-Next family)."""

    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 5120
    num_hidden_layers: int = 48
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 256
    rope_theta: float = 10_000_000.0
    partial_rotary_factor: float = 0.25
    rms_norm_eps: float = 1e-6
    mrope_section: tuple = ()  # empty -> single full-width section
    # linear attention (GatedDeltaNet)
    linear_num_value_heads: int = 32
    linear_num_key_heads: int = 16
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    # layer pattern: every `full_attention_interval`-th layer is full attention
    full_attention_interval: int = 4
    layer_types: Optional[tuple] = None
    # MoE (num_experts == 0 -> dense MLP)
    num_experts: int = 0
    num_experts_per_tok: int = 10
    moe_intermediate_size: int = 512
    shared_expert_intermediate_size: int = 512
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    mlp_only_layers: tuple = ()
    # capacity-based dispatch: per-expert buffer = ceil(T*K/E * factor) tokens
    # (overflow dropped, GShard-style). 0 -> exact dense dispatch (every
    # expert computes every token; router weights mask the output).
    moe_capacity_factor: float = 0.0

    def layer_type(self, i: int) -> str:
        if self.layer_types is not None:
            return self.layer_types[i]
        return "full_attention" if (i + 1) % self.full_attention_interval == 0 else "linear_attention"

    def is_moe_layer(self, i: int) -> bool:
        return (
            self.num_experts > 0
            and i not in self.mlp_only_layers
            and (i + 1) % self.decoder_sparse_step == 0
        )

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen35TextConfig":
        rope_scaling = cfg.get("rope_scaling") or {}
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"],
            rope_theta=cfg.get("rope_theta", 10_000_000.0),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.25),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            mrope_section=tuple(rope_scaling.get("mrope_section", ())),
            linear_num_value_heads=cfg.get("linear_num_value_heads", 32),
            linear_num_key_heads=cfg.get("linear_num_key_heads", 16),
            linear_key_head_dim=cfg.get("linear_key_head_dim", 128),
            linear_value_head_dim=cfg.get("linear_value_head_dim", 128),
            linear_conv_kernel_dim=cfg.get("linear_conv_kernel_dim", 4),
            layer_types=tuple(cfg["layer_types"]) if cfg.get("layer_types") else None,
            num_experts=cfg.get("num_experts", 0) or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 10),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 512),
            shared_expert_intermediate_size=cfg.get("shared_expert_intermediate_size", 512),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            decoder_sparse_step=cfg.get("decoder_sparse_step", 1),
            mlp_only_layers=tuple(cfg.get("mlp_only_layers", ()) or ()),
        )


@dataclasses.dataclass(frozen=True)
class Qwen35VLConfig:
    vision: Qwen3VLVisionConfig = dataclasses.field(default_factory=Qwen3VLVisionConfig)
    text: Qwen35TextConfig = dataclasses.field(default_factory=Qwen35TextConfig)
    dim: int = 128  # reference: getattr(config, "dim", 128)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen35VLConfig":
        text_cfg = cfg.get("text_config", cfg)
        return cls(
            vision=Qwen3VLVisionConfig.from_hf_config(cfg["vision_config"]),
            text=Qwen35TextConfig.from_hf_config(text_cfg),
            dim=cfg.get("dim", 128),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
        )


def _l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """FLA-style l2norm (modeling_qwen3_next.py:436-439)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def chunk_gated_delta_rule(
    query: jnp.ndarray,  # (B, S, H, Dk)
    key: jnp.ndarray,  # (B, S, H, Dk)
    value: jnp.ndarray,  # (B, S, H, Dv)
    g: jnp.ndarray,  # (B, S, H) log-decay
    beta: jnp.ndarray,  # (B, S, H)
    chunk_size: int = 64,
) -> jnp.ndarray:
    """Chunked gated delta rule (HF torch_chunk_gated_delta_rule,
    modeling_qwen3_next.py:440-517), fp32, q/k l2-normalized.

    The in-chunk correction matrix is obtained with one triangular solve per
    chunk instead of the reference's sequential row recurrence; the
    cross-chunk state update is a lax.scan.
    """
    in_dtype = query.dtype
    b, s, h, dk = query.shape
    dv = value.shape[-1]
    q = _l2norm(query.astype(jnp.float32))
    k = _l2norm(key.astype(jnp.float32))
    v = value.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    # (B, H, S, D)
    q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    g = jnp.swapaxes(g, 1, 2)
    beta = jnp.swapaxes(beta, 1, 2)

    pad = (-s) % chunk_size
    if pad:
        q, k, v = (jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, k, v))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
        beta = jnp.pad(beta, ((0, 0), (0, 0), (0, pad)))
    total = s + pad
    n = total // chunk_size
    c = chunk_size

    q = q * dk**-0.5
    v_beta = v * beta[..., None]
    k_beta = k * beta[..., None]
    # chunked: (B, H, N, C, D)
    q, k, v, k_beta, v_beta = (
        x.reshape(b, h, n, c, x.shape[-1]) for x in (q, k, v, k_beta, v_beta)
    )
    g = jnp.cumsum(g.reshape(b, h, n, c), axis=-1)

    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lower_incl = col <= row
    strict_lower = col < row

    # Mask the exponent BEFORE exp, not after: in the upper triangle
    # g_row - g_col is a POSITIVE cumulative-decay sum that overflows exp to
    # inf once a chunk accumulates ~88 of log-decay (~64 tokens at typical
    # gate values). The forward `where` hides the inf, but its backward
    # multiplies the masked branch's vjp by a zero cotangent -> 0 * inf = NaN
    # (this killed every finetune gradient above ~56 tokens). Masked first,
    # the taken-region diffs are <= 0 and exp stays <= 1 everywhere.
    diff = jnp.where(lower_incl, g[..., :, None] - g[..., None, :], 0.0)
    decay = jnp.where(lower_incl, jnp.exp(diff), 0.0)
    t_mat = jnp.where(strict_lower, -(k_beta @ jnp.swapaxes(k, -1, -2)) * decay, 0.0)
    eye = jnp.eye(c, dtype=jnp.float32)
    # attn = (I - T)^(-1): replaces the reference's 63-step row recurrence
    attn = jax.scipy.linalg.solve_triangular(eye - t_mat, jnp.broadcast_to(eye, t_mat.shape), lower=True)

    v2 = attn @ v_beta  # (B, H, N, C, Dv)
    k_cumdecay = attn @ (k_beta * jnp.exp(g)[..., None])

    # scan over chunks: carry the (Dk, Dv) recurrent state per (B, H)
    def step(state, inputs):
        q_i, k_i, v2_i, kcd_i, g_i = inputs  # leading dims (B, H)
        attn_local = jnp.where(lower_incl, (q_i @ jnp.swapaxes(k_i, -1, -2)) * _decay_of(g_i), 0.0)
        v_prime = kcd_i @ state
        v_new = v2_i - v_prime
        out_i = (q_i * jnp.exp(g_i)[..., None]) @ state + attn_local @ v_new
        g_last = g_i[..., -1]
        new_state = state * jnp.exp(g_last)[..., None, None] + jnp.swapaxes(
            k_i * jnp.exp(g_last[..., None] - g_i)[..., None], -1, -2
        ) @ v_new
        return new_state, out_i

    def _decay_of(g_i):
        # same mask-before-exp discipline as `decay` above (backward safety)
        d = jnp.where(lower_incl, g_i[..., :, None] - g_i[..., None, :], 0.0)
        return jnp.where(lower_incl, jnp.exp(d), 0.0)

    init = jnp.zeros((b, h, dk, dv), jnp.float32)
    # move chunk axis to scan position 0
    xs = (
        jnp.moveaxis(q, 2, 0),
        jnp.moveaxis(k, 2, 0),
        jnp.moveaxis(v2, 2, 0),
        jnp.moveaxis(k_cumdecay, 2, 0),
        jnp.moveaxis(g, 2, 0),
    )
    _, outs = jax.lax.scan(step, init, xs)
    out = jnp.moveaxis(outs, 0, 2).reshape(b, h, total, dv)[:, :, :s]
    return jnp.swapaxes(out, 1, 2).astype(in_dtype)  # (B, S, H, Dv)


class GatedDeltaNet(nn.Module):
    """Linear-attention token mixer (HF Qwen3NextGatedDeltaNet, :564-775)."""

    config: Qwen35TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, s, _ = x.shape
        hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
        dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
        key_dim, value_dim = dk * hk, dv * hv
        rep = hv // hk

        # zero out padding tokens (HF apply_mask_to_padding_states)
        x = x * attention_mask[..., None].astype(x.dtype)

        qkvz = QDense(2 * key_dim + 2 * value_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="in_proj_qkvz")(x)
        ba = QDense(2 * hv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="in_proj_ba")(x)

        # interleaved per-k-head layout (HF fix_query_key_value_ordering)
        qkvz = qkvz.reshape(b, s, hk, 2 * dk + 2 * rep * dv)
        query = qkvz[..., :dk]
        key = qkvz[..., dk : 2 * dk]
        value = qkvz[..., 2 * dk : 2 * dk + rep * dv].reshape(b, s, hv, dv)
        z = qkvz[..., 2 * dk + rep * dv :].reshape(b, s, hv, dv)
        ba = ba.reshape(b, s, hk, 2 * rep)
        b_gate = ba[..., :rep].reshape(b, s, hv)
        a_gate = ba[..., rep:].reshape(b, s, hv)

        # causal depthwise conv over the concatenated qkv channels
        mixed = jnp.concatenate(
            [query.reshape(b, s, key_dim), key.reshape(b, s, key_dim), value.reshape(b, s, value_dim)],
            axis=-1,
        )
        conv_kernel = self.param(
            "conv1d_kernel", nn.initializers.lecun_normal(),
            (cfg.linear_conv_kernel_dim, 2 * key_dim + value_dim), self.param_dtype,
        )
        padded = jnp.pad(mixed, ((0, 0), (cfg.linear_conv_kernel_dim - 1, 0), (0, 0)))
        windows = jnp.stack(
            [padded[:, i : i + s] for i in range(cfg.linear_conv_kernel_dim)], axis=-2
        )  # (B, S, K, C)
        mixed = jnp.einsum("bskc,kc->bsc", windows, conv_kernel.astype(windows.dtype))
        mixed = nn.silu(mixed)

        query = mixed[..., :key_dim].reshape(b, s, hk, dk)
        key = mixed[..., key_dim : 2 * key_dim].reshape(b, s, hk, dk)
        value = mixed[..., 2 * key_dim :].reshape(b, s, hv, dv)

        beta = nn.sigmoid(b_gate)
        a_log = self.param("A_log", nn.initializers.zeros, (hv,), jnp.float32)
        dt_bias = self.param("dt_bias", nn.initializers.ones, (hv,), jnp.float32)
        g = -jnp.exp(a_log) * nn.softplus(a_gate.astype(jnp.float32) + dt_bias)

        if rep > 1:
            query = jnp.repeat(query, rep, axis=2)
            key = jnp.repeat(key, rep, axis=2)

        core = chunk_gated_delta_rule(query, key, value, g, beta)  # (B, S, Hv, Dv)

        # gated RMSNorm (norm before gate), then silu(z) gate (:68-84)
        up = upcast_dtype(self.dtype)
        cf = core.astype(up)
        var = jnp.mean(jnp.square(cf), axis=-1, keepdims=True)
        normed = cf * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        w = self.param("norm_weight", nn.initializers.ones, (dv,), self.param_dtype)
        normed = (w.astype(up) * normed) * nn.silu(z.astype(jnp.float32))
        out = normed.astype(self.dtype).reshape(b, s, value_dim)
        return QDense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="out_proj")(out)


class GatedAttention(nn.Module):
    """Full attention with output gating and partial rotary
    (HF Qwen3NextAttention, :321-400)."""

    config: Qwen35TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, rope):
        cfg = self.config
        b, s, _ = x.shape
        nh, kvh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        dense = lambda feats, name: QDense(  # noqa: E731
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        qg = dense(nh * d * 2, "q_proj")(x).reshape(b, s, nh, 2 * d)
        q, gate = qg[..., :d], qg[..., d:]
        k = dense(kvh * d, "k_proj")(x).reshape(b, s, kvh, d)
        v = dense(kvh * d, "v_proj")(x).reshape(b, s, kvh, d)

        # unit-offset per-head RMSNorm (Qwen3Next convention, :215-226)
        q = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=True, param_dtype=self.param_dtype,
                    name="q_norm")(q)
        k = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=True, param_dtype=self.param_dtype,
                    name="k_norm")(k)

        cos, sin = rope  # (B, S, rotary_dim)
        rd = cos.shape[-1]

        def rot(t):
            t_rot, t_pass = t[..., :rd], t[..., rd:]
            half = rd // 2
            rotated = jnp.concatenate([-t_rot[..., half:], t_rot[..., :half]], axis=-1)
            t_rot = t_rot * cos[:, :, None, :] + rotated * sin[:, :, None, :]
            return jnp.concatenate([t_rot, t_pass], axis=-1).astype(t.dtype)

        q, k = rot(q.astype(jnp.float32)), rot(k.astype(jnp.float32))

        groups = nh // kvh
        qg_ = q.reshape(b, s, kvh, groups, d)
        up = upcast_dtype(self.dtype)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg_, k, preferred_element_type=up) * d**-0.5
        logits = logits + attn_bias[:, :, None, :, :].astype(up)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v.astype(self.dtype))
        out = out.reshape(b, s, nh * d)
        out = out * nn.sigmoid(gate.reshape(b, s, nh * d).astype(jnp.float32)).astype(self.dtype)
        return dense(cfg.hidden_size, "o_proj")(out)


class StackedExperts(nn.Module):
    """All experts' gated-MLP weights stacked on a leading expert axis so the
    expert FFN is three batched MXU einsums. Param paths:
    ``experts/{gate,up,down}_proj`` with shapes (E, d, f)/(E, d, f)/(E, f, d)
    (the loader stacks HF's per-expert ``mlp.experts.N.*`` weights). The
    expert axis is the expert-parallel shard dimension."""

    num_experts: int
    d_model: int
    d_ff: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xin: jnp.ndarray) -> jnp.ndarray:
        """(E, C, d) -> (E, C, d): each expert transforms its own token slice."""
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal",
                                                in_axis=1, out_axis=2)
        gp = self.param("gate_proj", init, (self.num_experts, self.d_model, self.d_ff),
                        self.param_dtype).astype(self.dtype)
        up = self.param("up_proj", init, (self.num_experts, self.d_model, self.d_ff),
                        self.param_dtype).astype(self.dtype)
        dp = self.param("down_proj", init, (self.num_experts, self.d_ff, self.d_model),
                        self.param_dtype).astype(self.dtype)
        g = jnp.einsum("ecd,edf->ecf", xin, gp)
        u = jnp.einsum("ecd,edf->ecf", xin, up)
        return jnp.einsum("ecf,efd->ecd", nn.silu(g) * u, dp)


class SparseMoeBlock(nn.Module):
    """Router + top-k experts + shared expert (HF Qwen3NextSparseMoeBlock,
    :793-855), TPU-first.

    Dispatch is GShard-style: a one-hot (token, expert, capacity-slot)
    dispatch tensor turns routing into two MXU matmuls (gather into (E, C, d)
    expert buffers, weighted scatter back), with per-expert capacity
    ``ceil(T*K/E * moe_capacity_factor)`` and overflow dropped in slot-major
    priority order (a token's 1st choice beats any token's 2nd choice).
    Sharding the expert axis over the mesh gives expert parallelism — GSPMD
    turns the dispatch einsums into all_to_alls. ``moe_capacity_factor=0``
    selects the exact dense path (every expert computes every token) used for
    parity testing and tiny models."""

    config: Qwen35TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, s, d = x.shape
        flat = x.reshape(-1, d)
        num_tokens = flat.shape[0]
        n_exp, k = cfg.num_experts, cfg.num_experts_per_tok
        logits = QDense(n_exp, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="gate")(flat)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_w, top_i = jax.lax.top_k(probs, k)
        if cfg.norm_topk_prob:
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

        experts = StackedExperts(n_exp, d, cfg.moe_intermediate_size,
                                 dtype=self.dtype, param_dtype=self.param_dtype, name="experts")
        onehot = jax.nn.one_hot(top_i, n_exp, dtype=jnp.float32)  # (T, K, E)
        if cfg.moe_capacity_factor > 0:
            capacity = min(num_tokens, int(math.ceil(num_tokens * k / n_exp * cfg.moe_capacity_factor)))
            # slot-major priority: all 1st choices claim buffer slots before
            # any 2nd choice (GShard position = running count per expert)
            oh_flat = onehot.transpose(1, 0, 2).reshape(k * num_tokens, n_exp)
            slot = jnp.sum((jnp.cumsum(oh_flat, axis=0) - 1.0) * oh_flat, axis=-1)  # (K*T,)
            keep = (slot < capacity).astype(jnp.float32)
            slot_oh = jax.nn.one_hot(slot.astype(jnp.int32), capacity, dtype=jnp.float32)
            disp_flat = (oh_flat * keep[:, None])[:, :, None] * slot_oh[:, None, :]  # (K*T, E, C)
            dispatch = disp_flat.reshape(k, num_tokens, n_exp, capacity).transpose(1, 0, 2, 3)
            # router weights stay f32 through the one-hots (HF casts the
            # router to float, :807), the data-path einsums run in self.dtype
            combine = jnp.sum(dispatch * top_w[..., None, None], axis=1).astype(self.dtype)
            dispatch = jnp.sum(dispatch, axis=1).astype(self.dtype)  # (T, E, C) 0/1
            # dispatch/combine are one-hot gathers dressed as matmuls — run
            # them at HIGHEST so the TPU MXU doesn't round the gathered
            # activations to bf16 (they're memory-bound, not FLOP-bound)
            hp = jax.lax.Precision.HIGHEST
            expert_in = jnp.einsum("td,tec->ecd", flat, dispatch, precision=hp)
            expert_out = experts(expert_in)
            out = jnp.einsum("ecd,tec->td", expert_out, combine, precision=hp)
        else:
            # exact dense dispatch: (E, T, d) compute, router weights combine
            w_te = jnp.sum(onehot * top_w[..., None], axis=1).astype(self.dtype)  # (T, E)
            all_out = experts(jnp.broadcast_to(flat[None], (n_exp, num_tokens, d)))
            out = jnp.einsum("etd,te->td", all_out, w_te, precision=jax.lax.Precision.HIGHEST)

        shared = GatedMLP(
            intermediate_size=cfg.shared_expert_intermediate_size, activation="silu",
            dtype=self.dtype, param_dtype=self.param_dtype, name="shared_expert",
        )(flat)
        shared_gate = QDense(1, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                               name="shared_expert_gate")(flat)
        out = out + nn.sigmoid(shared_gate.astype(jnp.float32)).astype(self.dtype) * shared
        return out.reshape(b, s, d)


class HybridDecoderLayer(nn.Module):
    config: Qwen35TextConfig
    layer_idx: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, rope, attention_mask):
        cfg = self.config
        norm = lambda name: RMSNorm(  # noqa: E731
            eps=cfg.rms_norm_eps, add_unit_offset=True, param_dtype=self.param_dtype, name=name
        )
        residual = x
        h = norm("input_layernorm")(x)
        if cfg.layer_type(self.layer_idx) == "linear_attention":
            h = GatedDeltaNet(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_attn")(
                h, attention_mask
            )
        else:
            h = GatedAttention(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="self_attn")(
                h, attn_bias, rope
            )
        x = residual + h
        residual = x
        h = norm("post_attention_layernorm")(x)
        if cfg.is_moe_layer(self.layer_idx):
            h = SparseMoeBlock(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")(h)
        else:
            h = GatedMLP(intermediate_size=cfg.intermediate_size, activation="silu",
                         dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")(h)
        return residual + h


class _HybridGroup(nn.Module):
    """One period of the hybrid pattern (``full_attention_interval`` layers):
    the scannable unit — within a period the layer param trees differ
    (linear vs full attention), across periods they repeat. Params live at
    ``sub_{j}`` (use :func:`colpali_tpu.core.hf_loader.group_hybrid_params`
    to convert from the unrolled checkpoint layout)."""

    config: Qwen35TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, rope, attention_mask):
        for j in range(self.config.full_attention_interval):
            x = HybridDecoderLayer(
                self.config, j, dtype=self.dtype, param_dtype=self.param_dtype, name=f"sub_{j}"
            )(x, attn_bias, rope, attention_mask)
        return x


class HybridDecoder(nn.Module):
    """Qwen3.5/Qwen3-Next hybrid stack over pre-merged embeddings.

    ``scan_layers=True`` scans over pattern periods (one traced period
    instead of num_layers/interval copies — a 48-layer stack traces 4
    layers). Requires the strictly periodic configuration: layer types
    repeating every ``full_attention_interval``, no ``mlp_only_layers``,
    ``decoder_sparse_step == 1``."""

    config: Qwen35TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            interval = cfg.full_attention_interval
            periodic = all(
                cfg.layer_type(i) == cfg.layer_type(i % interval)
                for i in range(cfg.num_hidden_layers)
            )
            if (cfg.num_hidden_layers % interval or not periodic
                    or cfg.mlp_only_layers or cfg.decoder_sparse_step != 1):
                raise ValueError(
                    "scan_layers requires a strictly periodic hybrid pattern: "
                    "num_hidden_layers divisible by full_attention_interval, "
                    "layer_types repeating each period, no mlp_only_layers, "
                    "decoder_sparse_step == 1"
                )
            self.layer_stack = scanned_stack(
                _HybridGroup, layer_kwargs, cfg.num_hidden_layers // interval,
                num_args=3, remat=self.remat,
            )(name="layers")
        else:
            lcls = remat_layer(HybridDecoderLayer, self.remat)
            self.layers = [
                lcls(cfg, i, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=True, param_dtype=self.param_dtype)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds, attn_bias, position_ids, attention_mask):
        cfg = self.config
        # partial-rotary phases; with multimodal sections the channels mix
        # like qwen3_vl's interleaved M-RoPE over the rotary dims
        rd = cfg.rotary_dim
        # all-T sectioning when no multimodal sections are configured (the
        # three position channels are equal for text, so this is exact)
        sections = cfg.mrope_section or (rd // 2, 0, 0)
        from colpali_tpu.models.qwen3_vl import interleaved_mrope_cos_sin

        cos, sin = interleaved_mrope_cos_sin(position_ids, rd, cfg.rope_theta, sections)
        x = inputs_embeds.astype(self.dtype)
        if self.scan_layers:
            x, _ = self.layer_stack(x, attn_bias, (cos, sin), attention_mask)
        else:
            for layer in self.layers:
                x = layer(x, attn_bias, (cos, sin), attention_mask)
        return self.norm(x)


class Qwen35VLBackbone(nn.Module):
    """Qwen3-VL-style vision tower + hybrid decoder."""

    config: Qwen35VLConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.visual = Qwen3VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                       scan_layers=self.scan_layers, remat=self.remat)
        self.language_model = HybridDecoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                            scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        vision_hpos: Optional[jnp.ndarray] = None,
        vision_wpos: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        pos_idx: Optional[jnp.ndarray] = None,
        pos_weight: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        inputs_embeds = self.language_model.embed(input_ids)
        if pixel_values is not None:
            feats, _deepstack = self.visual(
                pixel_values, vision_hpos, vision_wpos, patch_mask, pos_idx, pos_weight
            )
            image_mask = input_ids == cfg.image_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, feats)
        if position_ids is None:
            pos = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
            position_ids = jnp.broadcast_to(pos[None], (3, *pos.shape))
        attn_bias = make_attention_bias(attention_mask, causal=True)
        return self.language_model(inputs_embeds, attn_bias, position_ids, attention_mask)


class ColQwen3_5(nn.Module):  # noqa: N801 — reference naming
    """Late-interaction retriever over the Qwen3.5 hybrid backbone."""

    config: Qwen35VLConfig
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen35VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.config.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_id
        return self.head(hidden, attention_mask, image_mask)


class BiQwen3_5(nn.Module):  # noqa: N801
    config: Qwen35VLConfig
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen35VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(DenseHeadConfig(pooling_strategy=self.pooling_strategy),
                              dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        return self.head(hidden, attention_mask)
