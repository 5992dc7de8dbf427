"""Qwen2.5-VL backbone + ColQwen2_5 / BiQwen2_5 (flax.linen).

Behavioral spec:
- transformers Qwen2_5_VLModel (modeling_qwen2_5_vl.py): vision tower like
  Qwen2-VL but with RMSNorm blocks, biased SwiGLU MLPs, RMSNorm ln_q in the
  patch merger, and WINDOW attention — all blocks except
  ``fullatt_block_indexes`` attend only within 112px windows
  (:306-460). Text decoder = Qwen2 with M-RoPE (identical math to qwen2_vl).
- reference ColQwen2_5
  (/root/reference/colpali_engine/models/qwen2_5/colqwen2_5/modeling_colqwen2_5.py):
  same unpadding + 128-d head pattern as ColQwen2.

TPU-first window attention: HF reorders the patch sequence into window groups
for varlen flash attention; we keep the native merge order and express
windows as an attention-bias equality mask on host-computed per-patch window
ids — identical math, static shapes, and the patch merger's 4-groups are
untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import (
    remat_layer,
    QDense,
    ACTIVATIONS,
    Attention,
    Dtype,
    RMSNorm,
    flash_auto_ok,
    make_attention_bias,
    segment_bias,
)
from colpali_tpu.models.qwen2_vl import Qwen2Decoder, Qwen2TextConfig


@dataclasses.dataclass(frozen=True)
class Qwen25VLVisionConfig:
    """Defaults = Qwen2.5-VL-3B vision tower."""

    depth: int = 32
    hidden_size: int = 1280  # embed dim (renamed from embed_dim in 2.5)
    num_heads: int = 16
    intermediate_size: int = 3420
    out_hidden_size: int = 2048
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)
    in_channels: int = 3
    hidden_act: str = "silu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen25VLVisionConfig":
        return cls(
            depth=cfg.get("depth", 32),
            hidden_size=cfg.get("hidden_size", 1280),
            num_heads=cfg.get("num_heads", 16),
            intermediate_size=cfg.get("intermediate_size", 3420),
            out_hidden_size=cfg.get("out_hidden_size", 2048),
            patch_size=cfg.get("patch_size", 14),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            window_size=cfg.get("window_size", 112),
            fullatt_block_indexes=tuple(cfg.get("fullatt_block_indexes", (7, 15, 23, 31))),
            in_channels=cfg.get("in_channels", 3),
            hidden_act=cfg.get("hidden_act", "silu"),
        )


@dataclasses.dataclass(frozen=True)
class Qwen25VLConfig:
    vision: Qwen25VLVisionConfig = dataclasses.field(default_factory=Qwen25VLVisionConfig)
    text: Qwen2TextConfig = dataclasses.field(default_factory=Qwen2TextConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    video_token_id: int = 151656

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen25VLConfig":
        text_cfg = cfg.get("text_config", cfg)
        return cls(
            vision=Qwen25VLVisionConfig.from_hf_config(cfg["vision_config"]),
            text=Qwen2TextConfig.from_hf_config(text_cfg),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            video_token_id=cfg.get("video_token_id", 151656),
        )


class Qwen25VisionBlock(nn.Module):
    """One Qwen2.5 vision block. ``is_full`` is a scalar bool selecting full
    attention over the windowed bias (fullatt_block_indexes) — passed per
    block so the stack is uniform and scannable; concrete (folded) on the
    unrolled path."""

    config: Qwen25VLVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_full, seg_full, seg_window, rope):
        cfg = self.config
        # both attention flavors are SEGMENT-EQUALITY masks (tokens attend
        # iff ids match): full attention = validity ids (valid=1, pad=-1),
        # windowed = per-patch window ids (pad=-1). Passing ids instead of a
        # prebuilt (B,1,P,P) bias lets Attention route to the fused flash
        # kernel on TPU — windowed varlen attention costs nothing extra
        # there. When flash is OFF the tower passes PREBUILT (B,1,P,P)
        # biases instead (ndim 4): a bias built inside a scanned block is
        # re-materialized every layer, ~P^2 fp32 per block.
        selected = jnp.where(
            jnp.asarray(is_full)[..., None, None, None] if seg_full.ndim == 4
            else jnp.asarray(is_full),
            seg_full, seg_window,
        )
        attn_kwargs = (
            {"attn_bias": selected} if seg_full.ndim == 4 else {"segments": selected}
        )
        residual = x
        h = RMSNorm(eps=1e-6, add_unit_offset=False, param_dtype=self.param_dtype, name="norm1")(x)
        h = Attention(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            use_bias=True,
            out_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(h, rope=rope, **attn_kwargs)
        x = residual + h
        residual = x
        h = RMSNorm(eps=1e-6, add_unit_offset=False, param_dtype=self.param_dtype, name="norm2")(x)
        h = BiasedGatedMLP(
            intermediate_size=cfg.intermediate_size,
            activation=cfg.hidden_act,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(h)
        return residual + h


class BiasedGatedMLP(nn.Module):
    """SwiGLU MLP WITH bias — Qwen2.5 vision blocks use bias=True
    (modeling_qwen2_5_vl.py:271)."""

    intermediate_size: int
    activation: str = "silu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda feats, name: QDense(  # noqa: E731
            feats, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        gate = dense(self.intermediate_size, "gate_proj")(x)
        up = dense(self.intermediate_size, "up_proj")(x)
        return dense(x.shape[-1], "down_proj")(ACTIVATIONS[self.activation](gate) * up)


class Qwen25VisionTower(nn.Module):
    """Qwen2.5 vision tower with mask-based window attention.

    Extra host-computed input vs qwen2_vl: ``window_id (B, P)`` int32 —
    per-patch window assignment (-1 for padding).
    """

    config: Qwen25VLVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, patches, hpos, wpos, patch_mask, window_id):
        cfg = self.config
        x = QDense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embed",
        )(patches.astype(self.dtype))

        freq_dim = cfg.head_dim // 4
        inv_freq = 1.0 / (10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) * 2 / (cfg.head_dim // 2)))
        hfreq = hpos.astype(jnp.float32)[..., None] * inv_freq
        wfreq = wpos.astype(jnp.float32)[..., None] * inv_freq
        half = jnp.concatenate([hfreq, wfreq], axis=-1)
        emb = jnp.concatenate([half, half], axis=-1)
        rope = (jnp.cos(emb), jnp.sin(emb))

        # segment ids for both attention flavors (see Qwen25VisionBlock):
        # full layers attend among valid patches (valid=1, pad=-1); windowed
        # layers attend within a window (window_id >= 0, pad=-1)
        seg_full = jnp.where(patch_mask, 1, -1).astype(jnp.int32)
        seg_window = window_id.astype(jnp.int32)
        b, p = seg_full.shape
        if not flash_auto_ok(b, p, cfg.num_heads, cfg.num_heads, self.dtype):
            # flash won't run (pad tax / dtype / platform): prebuild BOTH
            # (B,1,P,P) einsum biases ONCE here instead of letting each
            # block derive one from ids — inside a scanned stack that
            # derivation re-materializes ~P^2 fp32 per layer
            seg_full = segment_bias(seg_full)
            seg_window = segment_bias(seg_window)

        flags = jnp.asarray([i in cfg.fullatt_block_indexes for i in range(cfg.depth)])
        block_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            from colpali_tpu.models.layers import scanned_stack

            x, _ = scanned_stack(
                Qwen25VisionBlock, block_kwargs, cfg.depth, num_args=4,
                remat=self.remat, scanned_args=1,
            )(name="blocks")(x, flags, seg_full, seg_window, rope)
        else:
            lcls = remat_layer(Qwen25VisionBlock, self.remat)
            for i in range(cfg.depth):
                x = lcls(**block_kwargs, name=f"blocks_{i}")(x, flags[i], seg_full, seg_window, rope)

        merge = cfg.spatial_merge_size**2
        b, p, _ = x.shape
        x = RMSNorm(eps=1e-6, add_unit_offset=False, param_dtype=self.param_dtype, name="ln_q")(x)
        x = x.reshape(b, p // merge, merge * cfg.hidden_size)
        x = QDense(
            merge * cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="merger_fc1"
        )(x)
        x = ACTIVATIONS["gelu"](x)
        return QDense(
            cfg.out_hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="merger_fc2"
        )(x)


class Qwen25VLBackbone(nn.Module):
    config: Qwen25VLConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.visual = Qwen25VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                        scan_layers=self.scan_layers, remat=self.remat)
        self.language_model = Qwen2Decoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                           scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        vision_hpos: Optional[jnp.ndarray] = None,
        vision_wpos: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        window_id: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        inputs_embeds = self.language_model.embed(input_ids)
        if pixel_values is not None:
            feats = self.visual(pixel_values, vision_hpos, vision_wpos, patch_mask, window_id)
            image_mask = input_ids == cfg.image_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, feats)
        if position_ids is None:
            pos = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
            position_ids = jnp.broadcast_to(pos[None], (3, *pos.shape))
        # route the whole causal text stack once (same as Qwen2VLBackbone):
        # (B, S) mask -> causal flash when eligible at this shape, else one
        # prebuilt additive bias shared by every scanned layer
        b, s = attention_mask.shape
        tc = self.config.text
        if flash_auto_ok(b, s, tc.num_attention_heads, tc.num_key_value_heads, self.dtype):
            attn_bias = attention_mask.astype(jnp.int32)
        else:
            attn_bias = make_attention_bias(attention_mask, causal=True)
        return self.language_model(inputs_embeds, attn_bias, position_ids)


class ColQwen2_5(nn.Module):  # noqa: N801 — reference naming
    """Late-interaction retriever over Qwen2.5-VL."""

    config: Qwen25VLConfig
    dim: int = 128
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen25VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_id
        return self.head(hidden, attention_mask, image_mask)


class BiQwen2_5(nn.Module):  # noqa: N801
    """Single-vector retriever over Qwen2.5-VL."""

    config: Qwen25VLConfig
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen25VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        return self.head(hidden, attention_mask)
