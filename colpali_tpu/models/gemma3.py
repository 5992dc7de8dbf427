"""Gemma3 backbone + ColGemma3 / BiGemma3 (flax.linen).

Behavioral spec:
- transformers Gemma3Model (modeling_gemma3.py): SigLIP tower (reused from
  our paligemma stack) -> 4x4 avg-pool to 256 soft tokens -> RMSNorm ->
  matmul projection (:693-726); Gemma3 text decoder with alternating
  sliding/full attention layers, per-layer rope theta (local 10k / global 1M
  with linear scaling), per-head q/k RMSNorm, sandwich layernorms, scaled
  word embeddings; image tokens attend bidirectionally within their image
  block on top of the causal mask (:729-759, :935-948).
- reference ColGemma3 / BiGemma3
  (/root/reference/colpali_engine/models/gemma3/): 128-d head / Matryoshka
  dense head (embedding_dim in {768, 1536, 2560}).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig, SiglipVisionConfig
from colpali_tpu.models.layers import (
    remat_layer,
    Attention,
    Dtype,
    GatedMLP,
    RMSNorm,
    rope_cos_sin,
    scanned_stack,
)
from colpali_tpu.models.siglip import SiglipVisionTower


@dataclasses.dataclass(frozen=True)
class Gemma3TextConfig:
    """Defaults = Gemma3-4B text decoder."""

    vocab_size: int = 262208
    hidden_size: int = 2560
    intermediate_size: int = 10240
    num_hidden_layers: int = 34
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: int = 256
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_scaling_factor: float = 8.0  # linear scaling on full-attention layers
    rms_norm_eps: float = 1e-6
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 1024
    sliding_window_pattern: int = 6  # every 6th layer is full attention
    layer_types: Optional[tuple] = None

    def layer_type(self, i: int) -> str:
        if self.layer_types is not None:
            return self.layer_types[i]
        return "sliding_attention" if (i + 1) % self.sliding_window_pattern else "full_attention"

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Gemma3TextConfig":
        rope_scaling = cfg.get("rope_scaling") or {}
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim", 256),
            rope_theta=cfg.get("rope_theta", 1_000_000.0),
            rope_local_base_freq=cfg.get("rope_local_base_freq", 10_000.0),
            rope_scaling_factor=rope_scaling.get("factor", 1.0),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar", 256),
            sliding_window=cfg.get("sliding_window", 1024),
            sliding_window_pattern=cfg.get("sliding_window_pattern", 6),
            layer_types=tuple(cfg["layer_types"]) if cfg.get("layer_types") else None,
        )


@dataclasses.dataclass(frozen=True)
class Gemma3Config:
    vision: SiglipVisionConfig = dataclasses.field(
        default_factory=lambda: SiglipVisionConfig(image_size=896)
    )
    text: Gemma3TextConfig = dataclasses.field(default_factory=Gemma3TextConfig)
    mm_tokens_per_image: int = 256
    image_token_index: int = 262144

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Gemma3Config":
        return cls(
            vision=SiglipVisionConfig.from_hf_config(cfg["vision_config"]),
            text=Gemma3TextConfig.from_hf_config(cfg["text_config"]),
            mm_tokens_per_image=cfg.get("mm_tokens_per_image", 256),
            image_token_index=cfg.get("image_token_index", cfg.get("image_token_id", 262144)),
        )


def gemma3_attention_bias(
    attention_mask: jnp.ndarray,
    image_token_mask: Optional[jnp.ndarray],
    sliding_window: Optional[int],
) -> jnp.ndarray:
    """(B, 1, S, S) additive bias: causal (optionally sliding-window), OR'd
    with bidirectional attention inside each contiguous image-token block
    (HF token_type_ids_mask_function, modeling_gemma3.py:729-759)."""
    b, s = attention_mask.shape
    neg = jnp.finfo(jnp.float32).min
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    allowed = k_idx <= q_idx
    if sliding_window is not None:
        allowed = allowed & (q_idx - k_idx < sliding_window)
    allowed = jnp.broadcast_to(allowed[None], (b, s, s))

    if image_token_mask is not None:
        is_image = image_token_mask.astype(jnp.int32)
        new_block = is_image * (1 - jnp.pad(is_image, ((0, 0), (1, 0)))[:, :-1])
        group = jnp.cumsum(new_block, axis=1) - 1
        group = jnp.where(image_token_mask, group, -1)  # (B, S)
        same_image = (group[:, :, None] == group[:, None, :]) & image_token_mask[:, :, None] & (
            image_token_mask[:, None, :]
        )
        allowed = allowed | same_image

    valid_key = attention_mask[:, None, :] > 0
    bias = jnp.where(allowed & valid_key, 0.0, neg)
    return bias[:, None, :, :]


class Gemma3DecoderLayer(nn.Module):
    """One Gemma3 block. ``is_sliding`` is a scalar bool selecting the
    sliding-window bias + local rope vs the full-attention bias + scaled
    global rope — passed per layer so the stack is uniform and scannable
    (a concrete constant on the unrolled path, so XLA folds the selects)."""

    config: Gemma3TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_sliding, bias_full, bias_sliding, rope_global, rope_local):
        cfg = self.config
        attn_bias = jnp.where(is_sliding, bias_sliding, bias_full)
        rope = (
            jnp.where(is_sliding, rope_local[0], rope_global[0]),
            jnp.where(is_sliding, rope_local[1], rope_global[1]),
        )
        norm = lambda name: RMSNorm(  # noqa: E731
            eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name=name
        )
        residual = x
        h = norm("input_layernorm")(x)
        h = Attention(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            use_bias=False,
            scale=cfg.query_pre_attn_scalar**-0.5,
            out_dim=cfg.hidden_size,
            qk_norm_eps=cfg.rms_norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(h, attn_bias=attn_bias, rope=rope)
        h = norm("post_attention_layernorm")(h)
        x = residual + h
        residual = x
        h = norm("pre_feedforward_layernorm")(x)
        h = GatedMLP(
            intermediate_size=cfg.intermediate_size,
            activation="gelu_pytorch_tanh",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(h)
        h = norm("post_feedforward_layernorm")(h)
        return residual + h


class Gemma3Decoder(nn.Module):
    """Gemma3 text stack over PRE-SCALED input embeddings (the sqrt(hidden)
    embed scale is applied by the backbone before image merge, matching HF's
    Gemma3TextScaledWordEmbedding)."""

    config: Gemma3TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False  # scan over layers: 1 traced layer, fast compile
    remat: bool = False  # rematerialize layer activations in the backward pass

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype
        )
        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            # the sliding/global alternation rides along as a scanned flag
            self.layer_stack = scanned_stack(
                Gemma3DecoderLayer,
                layer_kwargs,
                cfg.num_hidden_layers,
                num_args=5,
                remat=self.remat,
                scanned_args=1,
            )(name="layers")
        else:
            lcls = remat_layer(Gemma3DecoderLayer, self.remat)
            self.layers = [
                lcls(**layer_kwargs, name=f"layers_{i}") for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype)

    def embed(self, input_ids):
        normalizer = jnp.asarray(self.config.hidden_size**0.5, dtype=self.dtype)
        return self.embed_tokens(input_ids) * normalizer

    def __call__(self, inputs_embeds, attn_bias_full, attn_bias_sliding, position_ids):
        cfg = self.config
        # global layers use linear-scaled rope on theta=1M; sliding layers
        # use unscaled local theta
        pos_global = position_ids.astype(jnp.float32) / cfg.rope_scaling_factor
        rope_global = rope_cos_sin(pos_global, cfg.head_dim, cfg.rope_theta)
        rope_local = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_local_base_freq)

        x = inputs_embeds.astype(self.dtype)
        flags = jnp.asarray(
            [cfg.layer_type(i) == "sliding_attention" for i in range(cfg.num_hidden_layers)]
        )
        if self.scan_layers:
            x, _ = self.layer_stack(
                x, flags, attn_bias_full, attn_bias_sliding, rope_global, rope_local
            )
        else:
            for i, layer in enumerate(self.layers):
                x = layer(x, flags[i], attn_bias_full, attn_bias_sliding, rope_global, rope_local)
        return self.norm(x)


class Gemma3Backbone(nn.Module):
    """SigLIP tower + avg-pool projector + Gemma3 decoder."""

    config: Gemma3Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_tower = SiglipVisionTower(
            cfg.vision,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            scan_layers=self.scan_layers,
            remat=self.remat,
        )
        self.mm_soft_emb_norm = RMSNorm(eps=cfg.vision.layer_norm_eps, param_dtype=self.param_dtype)
        self.mm_input_projection = self.param(
            "mm_input_projection",
            nn.initializers.zeros_init(),
            (cfg.vision.hidden_size, cfg.text.hidden_size),
            self.param_dtype,
        )
        self.language_model = Gemma3Decoder(
            cfg.text,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            scan_layers=self.scan_layers,
            remat=self.remat,
        )

    def get_image_features(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, mm_tokens_per_image, text_hidden)."""
        cfg = self.config
        vision_out = self.vision_tower(pixel_values)  # (B, P, V)
        b, p, v = vision_out.shape
        side = cfg.vision.image_size // cfg.vision.patch_size
        tokens_side = int(cfg.mm_tokens_per_image**0.5)
        kernel = side // tokens_side
        grid = vision_out.reshape(b, side, side, v)
        pooled = nn.avg_pool(grid, (kernel, kernel), strides=(kernel, kernel))  # (B, ts, ts, V)
        pooled = pooled.reshape(b, tokens_side * tokens_side, v)
        normed = self.mm_soft_emb_norm(pooled)
        return jnp.matmul(normed, self.mm_input_projection.astype(normed.dtype))

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        safe_ids = jnp.where(input_ids == cfg.image_token_index, 0, input_ids)
        inputs_embeds = self.language_model.embed(safe_ids)

        image_token_mask = None
        if pixel_values is not None:
            image_features = self.get_image_features(pixel_values)
            image_token_mask = input_ids == cfg.image_token_index
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_token_mask, image_features)

        bias_full = gemma3_attention_bias(attention_mask, image_token_mask, None)
        bias_sliding = gemma3_attention_bias(attention_mask, image_token_mask, cfg.text.sliding_window)
        b, s = input_ids.shape
        position_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        return self.language_model(inputs_embeds, bias_full, bias_sliding, position_ids)


class ColGemma3(nn.Module):
    """Late-interaction retriever over Gemma3 (reference
    modeling_colgemma.py:20-100)."""

    config: Gemma3Config
    dim: int = 128
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Gemma3Backbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None):
        hidden = self.model(input_ids, attention_mask, pixel_values)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_index
        return self.head(hidden, attention_mask, image_mask)


class BiGemma3(nn.Module):
    """Matryoshka dense retriever over Gemma3 (reference
    modeling_bigemma.py:7-127): mean pool -> truncate to embedding_dim ->
    L2 norm."""

    config: Gemma3Config
    pooling_strategy: str = "mean"
    embedding_dim: Optional[int] = None  # {768, 1536, 2560}
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Gemma3Backbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy, embedding_dim=self.embedding_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None):
        hidden = self.model(input_ids, attention_mask, pixel_values)
        return self.head(hidden, attention_mask)
