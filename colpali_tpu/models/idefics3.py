"""Idefics3/SmolVLM backbone + ColIdefics3 (ColSmol) / BiIdefics3.

Behavioral spec:
- transformers Idefics3Model (modeling_idefics3.py): SigLIP-style vision
  tower over fixed-size image tiles (the processor splits big images into
  ``image_size``^2 sub-images + one global tile), pixel-shuffle connector
  (:390-409) + linear modality projection (:274-282), Llama (SmolLM2) causal
  text decoder, image features spliced at <image> token slots.
- reference ColIdefics3
  (/root/reference/colpali_engine/models/idefics3/colidefics3/modeling_colidefics3.py):
  projection layer named ``linear`` (not custom_text_proj), dim 128.

TPU-first: tiles are a static ``(B, T, S, S, 3)`` array with a per-tile
validity mask; the vision tower runs once over ``B*T`` tiles. All tiles are
full-size squares (the processor guarantees this), so position ids are the
plain arange — no NaViT bucket interpolation needed at runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import (
    Dtype,
    QDense,
    flash_auto_ok,
    make_attention_bias,
    remat_layer,
)
from colpali_tpu.models.qwen2_vl import Qwen2Decoder, Qwen2TextConfig
from colpali_tpu.models.siglip import SiglipEncoderLayer


@dataclasses.dataclass(frozen=True)
class Idefics3VisionConfig:
    """Defaults = SmolVLM vision tower (SigLIP-B/16-512)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 512
    patch_size: int = 16
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Idefics3VisionConfig":
        return cls(
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            image_size=cfg.get("image_size", 512),
            patch_size=cfg.get("patch_size", 16),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-6),
        )


@dataclasses.dataclass(frozen=True)
class Idefics3Config:
    vision: Idefics3VisionConfig = dataclasses.field(default_factory=Idefics3VisionConfig)
    text: Qwen2TextConfig = dataclasses.field(default_factory=Qwen2TextConfig)
    scale_factor: int = 4  # pixel shuffle (SmolVLM: 512/16=32 -> 8x8=64 tokens)
    image_token_id: int = 49153

    @property
    def image_seq_len(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        return (side // self.scale_factor) ** 2

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Idefics3Config":
        return cls(
            vision=Idefics3VisionConfig.from_hf_config(cfg["vision_config"]),
            text=Qwen2TextConfig.from_hf_config({**cfg["text_config"], "attention_bias": False}),
            scale_factor=cfg.get("scale_factor", 2),
            image_token_id=cfg.get("image_token_id", 49153),
        )


def pixel_shuffle(x: jnp.ndarray, scale_factor: int) -> jnp.ndarray:
    """(B, S, D) -> (B, S/r^2, D*r^2), HF Idefics3Connector.pixel_shuffle
    (modeling_idefics3.py:396-405)."""
    bsz, seq, embed_dim = x.shape
    height = width = int(seq**0.5)
    x = x.reshape(bsz, height, width, embed_dim)
    x = x.reshape(bsz, height, width // scale_factor, embed_dim * scale_factor)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(bsz, width // scale_factor, height // scale_factor, embed_dim * scale_factor**2)
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(bsz, seq // scale_factor**2, embed_dim * scale_factor**2)


class Idefics3VisionTower(nn.Module):
    """SigLIP-style tower over full-size square tiles (B*, S, S, 3)."""

    config: Idefics3VisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)
        # HF Idefics3 buckets fractional coords with a 1e-6 epsilon
        # (modeling_idefics3.py:134-160); even for full-size tiles this does
        # NOT give arange (e.g. side 4 -> [0, 0, 1, 2]) — the checkpoints
        # were trained with exactly this lookup, so we reproduce it.
        import numpy as np

        side = cfg.image_size // cfg.patch_size
        boundaries = np.arange(1 / side, 1.0, 1 / side)
        frac = np.arange(side) / side * (1 - 1e-6)
        coord = np.searchsorted(boundaries, frac, side="right")
        pos_ids = (coord[:, None] * side + coord[None, :]).reshape(-1)
        pos = nn.Embed(
            cfg.num_patches, cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="position_embedding",
        )(jnp.asarray(pos_ids)[None, :])
        x = x + pos
        # Idefics3 encoder layers are structurally SigLIP layers
        layer_kwargs = dict(config=_as_siglip(cfg), dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            from colpali_tpu.models.layers import scanned_stack

            x, _ = scanned_stack(
                SiglipEncoderLayer, layer_kwargs, cfg.num_hidden_layers,
                num_args=0, remat=self.remat,
            )(name="layers")(x)
        else:
            lcls = remat_layer(SiglipEncoderLayer, self.remat)
            for i in range(cfg.num_hidden_layers):
                x = lcls(**layer_kwargs, name=f"layers_{i}")(x)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="post_layernorm",
        )(x)


def _as_siglip(cfg: Idefics3VisionConfig):
    from colpali_tpu.models.configs import SiglipVisionConfig

    return SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps,
    )


class Idefics3Backbone(nn.Module):
    config: Idefics3Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_model = Idefics3VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                                scan_layers=self.scan_layers, remat=self.remat)
        self.modality_projection = QDense(
            cfg.text.hidden_size, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.text_model = Qwen2Decoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                       scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        tile_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """
        Args:
            input_ids / attention_mask: (B, S_text).
            pixel_values: (B, T, S, S, 3) image tiles (sub-images + global),
                zero-padded over T; None for text-only.
            tile_mask: (B, T) validity; valid tiles must come first per row.
        """
        cfg = self.config
        inputs_embeds = self.text_model.embed(input_ids)

        if pixel_values is not None:
            b, t = pixel_values.shape[:2]
            tiles = pixel_values.reshape(b * t, *pixel_values.shape[2:])
            hidden = self.vision_model(tiles)  # (B*T, P, V)
            shuffled = pixel_shuffle(hidden, cfg.scale_factor)  # (B*T, seq, V*r^2)
            feats = self.modality_projection(shuffled)  # (B*T, seq, H)
            feats = feats.reshape(b, t * feats.shape[1], feats.shape[2])
            image_mask = input_ids == cfg.image_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, feats)

        # route the whole causal text stack once, same as Qwen2VLBackbone:
        # (B, S) mask -> flash when eligible at this shape, else one
        # prebuilt additive bias shared by every (scanned) layer
        b, s = input_ids.shape
        tc = cfg.text
        if flash_auto_ok(b, s, tc.num_attention_heads, tc.num_key_value_heads, self.dtype):
            attn_bias = attention_mask.astype(jnp.int32)
        else:
            attn_bias = make_attention_bias(attention_mask, causal=True)
        pos = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
        position_ids = jnp.broadcast_to(pos[None], (3, b, s))
        return self.text_model(inputs_embeds, attn_bias, position_ids)


class ColIdefics3(nn.Module):
    """Late-interaction retriever over Idefics3/SmolVLM (ColSmol). The
    projection layer is named ``linear`` (reference
    modeling_colidefics3.py:20)."""

    config: Idefics3Config
    dim: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Idefics3Backbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(
            dim=self.dim, proj_name="linear", dtype=self.dtype, param_dtype=self.param_dtype
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None, tile_mask=None):
        hidden = self.model(input_ids, attention_mask, pixel_values, tile_mask)
        return self.head(hidden, attention_mask)


class BiIdefics3(nn.Module):
    """Single-vector retriever over Idefics3."""

    config: Idefics3Config
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Idefics3Backbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None, tile_mask=None):
        hidden = self.model(input_ids, attention_mask, pixel_values, tile_mask)
        return self.head(hidden, attention_mask)
