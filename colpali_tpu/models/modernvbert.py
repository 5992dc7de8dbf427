"""ModernVBERT: bidirectional-encoder VLM + ColModernVBert / BiModernVBert.

The only model the reference implements from scratch
(/root/reference/colpali_engine/models/modernvbert/modeling_modernvbert.py,
476 LoC): SigLIP2 vision tower + ModernBERT (ettin-encoder) text tower joined
by a pixel-shuffle connector, with a DecoupledEmbedding (frozen base vocab +
trainable additional vocab) and token-level inputs_merger.

Components and their specs:
- vision: SigLIP vision transformer (structure shared with our paligemma
  tower).
- text: ModernBERT (HF modeling_modernbert.py) — bidirectional encoder with
  alternating global/local (sliding window) attention, per-layer rope theta,
  fused-GeGLU MLPs (Wi -> chunk(input, gate) -> act(input)*gate -> Wo),
  bias-free LayerNorms, attn_norm skipped on layer 0.
- connector: pixel shuffle + linear projection (reference :183-210; same
  shuffle math as Idefics3).
- merger: image hidden blocks spliced into <image> runs (reference
  inputs_merger :310-345) — equivalent to our cumsum-indexed merge.
- ColModernVBert head: 128-d custom_text_proj with L2 norm clamped at 1e-12
  (reference colvbert/modeling_colmodernvbert.py:57-67).
- ModernVBertForMaskedLM head (reference :411-476): ModernBERT MLM head +
  optional additional-vocab projection.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig, SiglipVisionConfig
from colpali_tpu.models.idefics3 import pixel_shuffle
from colpali_tpu.models.layers import (
    remat_layer,
    QDense,
    ACTIVATIONS,
    Attention,
    Dtype,
    rope_cos_sin,
)
from colpali_tpu.models.siglip import SiglipVisionTower


@dataclasses.dataclass(frozen=True)
class ModernBertTextConfig:
    """Defaults = ettin-encoder-150m-ish ModernBERT."""

    vocab_size: int = 50368
    hidden_size: int = 768
    intermediate_size: int = 1152
    num_hidden_layers: int = 22
    num_attention_heads: int = 12
    norm_eps: float = 1e-5
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    local_attention: int = 128  # window size (tokens attend +/- window/2)
    global_attn_every_n_layers: int = 3
    hidden_activation: str = "gelu"
    attention_bias: bool = False
    mlp_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "ModernBertTextConfig":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            norm_eps=cfg.get("norm_eps", 1e-5),
            global_rope_theta=cfg.get("global_rope_theta", 160000.0),
            local_rope_theta=cfg.get("local_rope_theta", 10000.0),
            local_attention=cfg.get("local_attention", 128),
            global_attn_every_n_layers=cfg.get("global_attn_every_n_layers", 3),
            hidden_activation=cfg.get("hidden_activation", "gelu"),
            attention_bias=cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
        )


@dataclasses.dataclass(frozen=True)
class ModernVBertConfig:
    vision: SiglipVisionConfig = dataclasses.field(
        default_factory=lambda: SiglipVisionConfig(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
            num_attention_heads=12, image_size=512, patch_size=16,
        )
    )
    text: ModernBertTextConfig = dataclasses.field(default_factory=ModernBertTextConfig)
    pixel_shuffle_factor: int = 4
    additional_vocab_size: int = 128
    image_token_id: int = 50407

    @property
    def image_seq_len(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        return (side // self.pixel_shuffle_factor) ** 2

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "ModernVBertConfig":
        """Build from a checkpoint config.json. The reference assembles its
        config from backbone model NAMES (configuration_modernvbert.py:67-135)
        and serializes only a SUMMARY of each backbone (embed_dim/image_size/
        patch_size/... for vision; hidden_size/num_hidden_layers/... for
        text) plus ``vision_model_name``/``text_model_name`` pointers. When
        those pointers resolve to local config dirs (absolute, or relative to
        the checkpoint dir recorded as ``_checkpoint_dir`` by
        hf_loader.load_hf_config), merge the full backbone config underneath
        the summary; absent keys keep the published ModernVBERT-base
        defaults. Reference key spellings (``embed_dim``) are normalized."""
        ckpt_dir = cfg.get("_checkpoint_dir")

        def resolved(sub: Mapping[str, Any], name_key: str) -> Dict[str, Any]:
            merged: Dict[str, Any] = {}
            name = sub.get(name_key)
            if name:
                for base in ([ckpt_dir] if ckpt_dir else []) + [""]:
                    path = os.path.join(base, name, "config.json") if base else os.path.join(name, "config.json")
                    if os.path.exists(path):
                        with open(path) as f:
                            backbone = json.load(f)
                        # composite backbone configs (e.g. a full SiglipModel
                        # config) nest the vision tower one level down
                        merged.update(backbone.get("vision_config", backbone))
                        break
            merged.update(sub)
            if "embed_dim" in merged and "hidden_size" not in merged:
                merged["hidden_size"] = merged["embed_dim"]
            return merged

        kwargs: Dict[str, Any] = {}
        if "vision_config" in cfg:
            kwargs["vision"] = SiglipVisionConfig.from_hf_config(
                resolved(cfg["vision_config"], "vision_model_name"))
        if "text_config" in cfg:
            kwargs["text"] = ModernBertTextConfig.from_hf_config(
                resolved(cfg["text_config"], "text_model_name"))
        for key in ("pixel_shuffle_factor", "additional_vocab_size", "image_token_id"):
            if key in cfg:
                kwargs[key] = cfg[key]
        return cls(**kwargs)


class DecoupledEmbed(nn.Module):
    """Frozen-able base vocab + always-trainable additional vocab
    (reference DecoupledEmbedding, modeling_modernvbert.py:17-104). Ids >=
    vocab_size index the additional table."""

    vocab_size: int
    additional_vocab_size: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        base = nn.Embed(self.vocab_size, self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="tok_embeddings")
        if self.additional_vocab_size == 0:
            return base(input_ids)
        extra = nn.Embed(self.additional_vocab_size, self.features, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="additional_embedding")
        is_extra = input_ids >= self.vocab_size
        base_out = base(jnp.where(is_extra, 0, input_ids))
        extra_out = extra(jnp.where(is_extra, input_ids - self.vocab_size, 0))
        return jnp.where(is_extra[..., None], extra_out, base_out)


class ModernBertLayer(nn.Module):
    """One ModernBERT block. ``layer_idx`` selects the global/local bias+rope
    pair (global every ``global_attn_every_n_layers``) and bypasses
    ``attn_norm`` for layer 0 (HF uses nn.Identity there) — passed per layer
    so the stack is uniform and scannable. The attn_norm PARAM exists for
    every layer (synthesize ``scale=ones`` for layer 0 when converting HF
    checkpoints; its output is selected away, so the value is irrelevant).
    On the unrolled path ``layer_idx`` is concrete and XLA folds the
    selects."""

    config: ModernBertTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layer_idx, bias_global, bias_local, rope_global, rope_local):
        cfg = self.config
        i = jnp.asarray(layer_idx)
        is_global = (i % cfg.global_attn_every_n_layers) == 0
        attn_bias = jnp.where(is_global, bias_global, bias_local)
        rope = (
            jnp.where(is_global, rope_global[0], rope_local[0]),
            jnp.where(is_global, rope_global[1], rope_local[1]),
        )
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.norm_eps, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        residual = x
        h = jnp.where(i == 0, x, ln("attn_norm")(x))  # layer 0: Identity
        h = Attention(
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            use_bias=cfg.attention_bias,
            out_bias=cfg.attention_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(h, attn_bias=attn_bias, rope=rope)
        x = residual + h
        residual = x
        h = ln("mlp_norm")(x)
        wi = QDense(2 * cfg.intermediate_size, use_bias=cfg.mlp_bias, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="Wi")(h)
        inp, gate = jnp.split(wi, 2, axis=-1)
        h = QDense(cfg.hidden_size, use_bias=cfg.mlp_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="Wo")(ACTIVATIONS[cfg.hidden_activation](inp) * gate)
        return residual + h


class ModernBertEncoder(nn.Module):
    """Bidirectional ModernBERT stack over pre-merged embeddings."""

    config: ModernBertTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False  # scan over layers: 1 traced layer, fast compile
    remat: bool = False  # rematerialize layer activations in the backward pass

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask):
        cfg = self.config
        import jax

        b, s, _ = inputs_embeds.shape
        x = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="emb_norm")(inputs_embeds.astype(self.dtype))

        neg = jnp.finfo(jnp.float32).min
        valid = attention_mask[:, None, None, :] > 0
        global_bias = jnp.where(valid, 0.0, neg).astype(jnp.float32)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        in_window = jnp.abs(q_idx - k_idx) <= cfg.local_attention // 2
        local_bias = jnp.where(valid & in_window[None, None], 0.0, neg).astype(jnp.float32)

        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        rope_global = rope_cos_sin(positions, cfg.head_dim, cfg.global_rope_theta)
        rope_local = rope_cos_sin(positions, cfg.head_dim, cfg.local_rope_theta)

        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            from colpali_tpu.models.layers import scanned_stack

            stack = scanned_stack(
                ModernBertLayer, layer_kwargs, cfg.num_hidden_layers,
                num_args=5, remat=self.remat, scanned_args=1,
            )(name="layers")
            x, _ = stack(x, jnp.arange(cfg.num_hidden_layers), global_bias, local_bias,
                         rope_global, rope_local)
        else:
            lcls = remat_layer(ModernBertLayer, self.remat)
            for i in range(cfg.num_hidden_layers):
                x = lcls(**layer_kwargs, name=f"layers_{i}")(
                    x, i, global_bias, local_bias, rope_global, rope_local
                )
        return nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="final_norm")(x)


class ModernVBertModel(nn.Module):
    """Vision tower + connector + ModernBERT encoder; returns last hidden."""

    config: ModernVBertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_model = SiglipVisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                              scan_layers=self.scan_layers, remat=self.remat)
        self.modality_projection = QDense(
            cfg.text.hidden_size, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.embeddings = DecoupledEmbed(
            cfg.text.vocab_size, cfg.additional_vocab_size, cfg.text.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.text_model = ModernBertEncoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                            scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        tile_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """pixel_values: (B, T, S, S, 3) image tiles (Idefics3-style
        splitting); valid tiles first per row."""
        cfg = self.config
        inputs_embeds = self.embeddings(input_ids)
        if pixel_values is not None:
            b, t = pixel_values.shape[:2]
            tiles = pixel_values.reshape(b * t, *pixel_values.shape[2:])
            hidden = self.vision_model(tiles)
            shuffled = pixel_shuffle(hidden, cfg.pixel_shuffle_factor)
            feats = self.modality_projection(shuffled)
            feats = feats.reshape(b, t * feats.shape[1], feats.shape[2])
            image_mask = input_ids == cfg.image_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, feats)
        return self.text_model(inputs_embeds, attention_mask)


class ColModernVBert(nn.Module):
    """Late-interaction retriever over ModernVBERT; L2 norm clamped at 1e-12
    (reference modeling_colmodernvbert.py:57-67)."""

    config: ModernVBertConfig
    dim: int = 128
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = ModernVBertModel(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, norm_eps=1e-12, dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, tile_mask=None):
        hidden = self.model(input_ids, attention_mask, pixel_values, tile_mask)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_id
        return self.head(hidden, attention_mask, image_mask)


class BiModernVBert(nn.Module):
    """Single-vector retriever over ModernVBERT (pooling cls/last/mean,
    reference bivbert/modeling_bimodernvbert.py:8-65)."""

    config: ModernVBertConfig
    pooling_strategy: str = "mean"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = ModernVBertModel(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, input_ids, attention_mask, pixel_values=None, tile_mask=None):
        hidden = self.model(input_ids, attention_mask, pixel_values, tile_mask)
        return self.head(hidden, attention_mask)


class ModernVBertForMaskedLM(nn.Module):
    """MLM head over ModernVBERT (reference modeling_modernvbert.py:411-476):
    dense head (ModernBERT prediction head: Dense -> act -> LayerNorm) ->
    decoder to vocab, plus an additional-vocab projection."""

    config: ModernVBertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.model = ModernVBertModel(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head_dense = QDense(cfg.text.hidden_size, use_bias=False, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.head_norm = nn.LayerNorm(epsilon=cfg.text.norm_eps, use_bias=False, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.decoder = QDense(cfg.text.vocab_size, dtype=self.dtype, param_dtype=self.param_dtype)
        if cfg.additional_vocab_size > 0:
            self.additional_fc = QDense(cfg.additional_vocab_size, use_bias=False, dtype=self.dtype,
                                          param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, tile_mask=None):
        hidden = self.model(input_ids, attention_mask, pixel_values, tile_mask)
        proj = self.head_norm(ACTIVATIONS["gelu"](self.head_dense(hidden)))
        logits = self.decoder(proj)
        if self.config.additional_vocab_size > 0:
            logits = jnp.concatenate([logits, self.additional_fc(proj)], axis=-1)
        return logits
