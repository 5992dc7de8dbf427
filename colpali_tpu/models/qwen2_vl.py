"""Qwen2-VL backbone + ColQwen2 / BiQwen2 (flax.linen).

Behavioral spec:
- transformers Qwen2VLModel (modeling_qwen2_vl.py): NaViT-style vision tower
  over pre-patchified inputs (patch feature = 3*2*14*14 = 1176), 2D vision
  rotary in merge-block order (:673-701), PatchMerger over groups of 4
  consecutive merge-ordered patches (:255-268), Qwen2 text decoder with
  3-channel M-RoPE (:156-199) and causal attention.
- reference ColQwen2
  (/root/reference/colpali_engine/models/qwen2/colqwen2/modeling_colqwen2.py):
  128-d custom_text_proj over last hidden state, L2 norm, attention-mask
  zeroing; left padding.

TPU-first design — dynamic resolution on a static-shape compiler:
the reference feeds ragged patch sequences with cu_seqlens varlen attention;
here every image's patch sequence is padded to a shared bucket ``P`` and the
vision tower runs one batched forward with a patch-validity mask (full
attention within each image). Patch/rope/position metadata that depends on
image geometry is computed host-side by the processor (cheap integer work)
and passed as arrays, so the jitted model sees only static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import (
    QDense,
    ACTIVATIONS,
    Attention,
    Dtype,
    GatedMLP,
    RMSNorm,
    flash_auto_ok,
    make_attention_bias,
    remat_layer,
    scanned_stack,
)


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    """Defaults = Qwen2-VL-2B vision tower."""

    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    hidden_size: int = 1536  # output dim (= LM hidden)
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen2VLVisionConfig":
        return cls(
            depth=cfg.get("depth", 32),
            embed_dim=cfg.get("embed_dim", 1280),
            num_heads=cfg.get("num_heads", 16),
            mlp_ratio=cfg.get("mlp_ratio", 4.0),
            hidden_size=cfg.get("hidden_size", 1536),
            patch_size=cfg.get("patch_size", 14),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            in_channels=cfg.get("in_channels", 3),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
        )


@dataclasses.dataclass(frozen=True)
class Qwen2TextConfig:
    """Defaults = Qwen2-VL-2B text decoder."""

    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int = 128
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    mrope_section: tuple = (16, 24, 24)
    attention_bias: bool = True  # Qwen2: bias on q/k/v; Llama/SmolLM: False

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen2TextConfig":
        rope_scaling = cfg.get("rope_scaling") or {}
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=head_dim,
            rope_theta=cfg.get("rope_theta", 1000000.0),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            # without mrope, any sectioning is equivalent for text (all three
            # position channels are equal); one full-width section is cleanest
            mrope_section=tuple(rope_scaling.get("mrope_section", (head_dim // 2,))),
            attention_bias=cfg.get("attention_bias", True),
        )


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Qwen2VLVisionConfig = dataclasses.field(default_factory=Qwen2VLVisionConfig)
    text: Qwen2TextConfig = dataclasses.field(default_factory=Qwen2TextConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    video_token_id: int = 151656

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen2VLConfig":
        text_cfg = cfg.get("text_config", cfg)
        return cls(
            vision=Qwen2VLVisionConfig.from_hf_config(cfg["vision_config"]),
            text=Qwen2TextConfig.from_hf_config(text_cfg),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            video_token_id=cfg.get("video_token_id", 151656),
        )


class Qwen2VisionBlock(nn.Module):
    config: Qwen2VLVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, patch_mask, rope):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        residual = x
        h = ln("norm1")(x)
        h = Attention(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            use_bias=True,
            out_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(h, rope=rope, mask=patch_mask, causal=False)
        x = residual + h
        residual = x
        h = ln("norm2")(x)
        hidden_dim = int(cfg.embed_dim * cfg.mlp_ratio)
        h = QDense(hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(h)
        h = ACTIVATIONS[cfg.hidden_act](h)
        h = QDense(cfg.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)
        return residual + h


class Qwen2VisionTower(nn.Module):
    """Vision tower over padded per-image patch sequences.

    Inputs (host-computed by the processor):
      patches:    (B, P, patch_dim)  — pre-patchified pixels, zero-padded
      hpos, wpos: (B, P) int32       — per-patch grid positions, merge order
      patch_mask: (B, P) bool        — valid-patch mask

    Output: (B, P // merge^2, hidden_size) merged image features (valid
    groups first — padding is at the tail of each row).
    """

    config: Qwen2VLVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: object = None  # name in layers.REMAT_POLICIES ("dots", ...)

    @nn.compact
    def __call__(self, patches, hpos, wpos, patch_mask):
        cfg = self.config
        x = QDense(
            cfg.embed_dim, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embed"
        )(patches.astype(self.dtype))

        # 2D rotary phases: half the (half-)head rotates with h, half with w
        # (HF rot_pos_emb, modeling_qwen2_vl.py:673-701).
        freq_dim = cfg.head_dim // 4
        inv_freq = 1.0 / (10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) * 2 / (cfg.head_dim // 2)))
        hfreq = hpos.astype(jnp.float32)[..., None] * inv_freq
        wfreq = wpos.astype(jnp.float32)[..., None] * inv_freq
        half = jnp.concatenate([hfreq, wfreq], axis=-1)  # (B, P, head_dim/2)
        emb = jnp.concatenate([half, half], axis=-1)
        rope = (jnp.cos(emb), jnp.sin(emb))

        # full attention among the image's valid patches; the mask is passed
        # down (not a prebuilt additive bias) so Attention can route to the
        # fused flash kernel on TPU (XLA CSEs the per-layer bias otherwise)
        mask32 = patch_mask.astype(jnp.int32)

        block_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            x, _ = scanned_stack(
                Qwen2VisionBlock, block_kwargs, cfg.depth, num_args=2, remat=self.remat,
                remat_policy=self.remat_policy,
            )(name="blocks")(x, mask32, rope)
        else:
            lcls = remat_layer(Qwen2VisionBlock, self.remat, self.remat_policy)
            for i in range(cfg.depth):
                x = lcls(**block_kwargs, name=f"blocks_{i}")(x, mask32, rope)

        # PatchMerger: LN -> group 4 consecutive merge-ordered patches -> MLP
        merge = cfg.spatial_merge_size**2
        b, p, _ = x.shape
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="ln_q")(x)
        x = x.reshape(b, p // merge, merge * cfg.embed_dim)
        x = QDense(
            merge * cfg.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="merger_fc1"
        )(x)
        x = ACTIVATIONS["gelu"](x)
        return QDense(cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="merger_fc2")(x)


def mrope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    theta: float,
    mrope_section: tuple,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3-channel M-RoPE phase tables mixed per section.

    position_ids: (3, B, S) [temporal, height, width] positions. Returns
    cos/sin (B, S, head_dim), interleaving channel sections as HF's
    apply_multimodal_rotary_pos_emb (modeling_qwen2_vl.py:156-199).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, S, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (3, B, S, head_dim)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    sections = list(mrope_section) * 2
    starts = [sum(sections[:i]) for i in range(len(sections))]
    cos_parts = [
        jax.lax.dynamic_slice_in_dim(cos[i % 3], st, sz, axis=-1)
        for i, (st, sz) in enumerate(zip(starts, sections))
    ]
    sin_parts = [
        jax.lax.dynamic_slice_in_dim(sin[i % 3], st, sz, axis=-1)
        for i, (st, sz) in enumerate(zip(starts, sections))
    ]
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


class Qwen2DecoderLayer(nn.Module):
    config: Qwen2TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn, rope):
        # attn: (B, 1, S, S) prebuilt additive bias -> einsum path, or
        # (B, S) validity mask -> causal flash (the backbone routes once,
        # at the decoder's shape — see Qwen2VLBackbone.__call__)
        cfg = self.config
        attn_kwargs = (
            dict(mask=attn, causal=True) if attn.ndim == 2 else dict(attn_bias=attn)
        )
        residual = x
        h = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype,
                    name="input_layernorm")(x)
        h = Attention(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            use_bias=cfg.attention_bias,  # Qwen2: bias on q/k/v; Llama: none
            out_bias=False,
            out_dim=cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(h, rope=rope, **attn_kwargs)
        x = residual + h
        residual = x
        h = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype,
                    name="post_attention_layernorm")(x)
        h = GatedMLP(
            intermediate_size=cfg.intermediate_size,
            activation="silu",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(h)
        return residual + h


class Qwen2Decoder(nn.Module):
    """Qwen2(-VL) text decoder over pre-merged input embeddings."""

    config: Qwen2TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: object = None  # name in layers.REMAT_POLICIES ("dots", ...)

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype
        )
        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            self.layer_stack = scanned_stack(
                Qwen2DecoderLayer, layer_kwargs, cfg.num_hidden_layers, num_args=2, remat=self.remat,
                remat_policy=self.remat_policy,
            )(name="layers")
        else:
            lcls = remat_layer(Qwen2DecoderLayer, self.remat, self.remat_policy)
            self.layers = [
                lcls(**layer_kwargs, name=f"layers_{i}") for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds, attn_bias, position_ids):
        """position_ids: (3, B, S) M-RoPE positions."""
        cfg = self.config
        rope = mrope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
        x = inputs_embeds.astype(self.dtype)
        if self.scan_layers:
            x, _ = self.layer_stack(x, attn_bias, rope)
        else:
            for layer in self.layers:
                x = layer(x, attn_bias, rope)
        return self.norm(x)


class Qwen2VLBackbone(nn.Module):
    """Vision tower + decoder; returns last hidden states."""

    config: Qwen2VLConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: object = None  # name in layers.REMAT_POLICIES ("dots", ...)

    def setup(self):
        cfg = self.config
        self.visual = Qwen2VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                       scan_layers=self.scan_layers, remat=self.remat,
                                       remat_policy=self.remat_policy)
        self.language_model = Qwen2Decoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                           scan_layers=self.scan_layers, remat=self.remat,
                                           remat_policy=self.remat_policy)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        vision_hpos: Optional[jnp.ndarray] = None,
        vision_wpos: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """
        Args:
            input_ids / attention_mask: (B, S); left padding supported
                (positions come from ``position_ids``).
            pixel_values: (B, P, 1176) padded pre-patchified pixels, or None.
            vision_hpos / vision_wpos / patch_mask: (B, P) host-computed
                vision geometry (see processors.qwen2_vl).
            position_ids: (3, B, S) M-RoPE positions (host-computed); falls
                back to text-only positions when None.
        """
        cfg = self.config
        inputs_embeds = self.language_model.embed(input_ids)

        if pixel_values is not None:
            feats = self.visual(pixel_values, vision_hpos, vision_wpos, patch_mask)  # (B, P/4, H)
            image_mask = input_ids == cfg.image_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, feats)

        if position_ids is None:
            # text-only: all three channels share sequential positions,
            # computed from the attention mask (left-padding aware) —
            # HF get_rope_index text path (modeling_qwen2_vl.py:1053-1058)
            pos = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
            position_ids = jnp.broadcast_to(pos[None], (3, *pos.shape))

        # route the WHOLE text stack once: a (B, S) mask when the causal
        # flash kernel is eligible at this shape (fwd ties / bwd wins the
        # einsum at the doc lengths that qualify — see flash_auto_ok), else
        # one prebuilt additive bias shared by every scanned layer
        b, s = attention_mask.shape
        tc = self.config.text
        if flash_auto_ok(b, s, tc.num_attention_heads, tc.num_key_value_heads, self.dtype):
            attn = attention_mask.astype(jnp.int32)
        else:
            attn = make_attention_bias(attention_mask, causal=True)
        return self.language_model(inputs_embeds, attn, position_ids)


class ColQwen2(nn.Module):
    """Late-interaction retriever over Qwen2-VL (reference
    modeling_colqwen2.py:26-75)."""

    config: Qwen2VLConfig
    dim: int = 128
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    remat_policy: object = None  # name in layers.REMAT_POLICIES ("dots", ...)

    def setup(self):
        self.model = Qwen2VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                     scan_layers=self.scan_layers, remat=self.remat,
                                     remat_policy=self.remat_policy)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_id
        return self.head(hidden, attention_mask, image_mask)


class BiQwen2(nn.Module):
    """Single-vector retriever over Qwen2-VL (reference
    modeling_biqwen2.py:7-77). Default pooling = last token (left padding)."""

    config: Qwen2VLConfig
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.model = Qwen2VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        return self.head(hidden, attention_mask)
