"""Qwen2.5-Omni thinker + ColQwen2_5Omni (audio & video document retrieval).

Behavioral spec:
- transformers Qwen2_5OmniThinker (modeling_qwen2_5_omni.py): Whisper-style
  audio encoder over 100-frame windows (conv k3 + conv k3/s2, sinusoid
  positions restarting per chunk, bidirectional attention within chunks,
  pair-average pooling -> LayerNorm -> projection, :683-860), the Qwen2.5-VL
  vision tower, and a Qwen2.5 text decoder.
- reference ColQwen2_5Omni
  (/root/reference/colpali_engine/models/qwen_omni/colqwen_omni/modeling_colqwen_omni.py):
  ``lm_head = Identity`` and the 128-d head over the logits (== hidden
  states), query prefix "Query: ", audio/video documents.

TPU-first: audio is chunked host-side into fixed 2*n_window-frame windows and
batched as ``(num_chunks, 2*n_window, mel)`` with frame-validity masks —
convolutions, positions, and within-chunk attention are all static-shape.
Position ids: audio tokens take sequential text-style positions (exact for
audio+text documents; Omni's chunked audio/video interleaving for mixed
audio-video inputs is not implemented).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import (
    Dtype,
    QDense,
    flash_auto_ok,
    make_attention_bias,
    remat_layer,
)
from colpali_tpu.models.qwen2_5_vl import Qwen25VisionTower, Qwen25VLVisionConfig
from colpali_tpu.models.qwen2_vl import Qwen2Decoder, Qwen2TextConfig


@dataclasses.dataclass(frozen=True)
class OmniAudioConfig:
    """Defaults = Qwen2.5-Omni-3B audio encoder (Whisper-large-v3-style)."""

    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    n_window: int = 100
    max_source_positions: int = 1500
    output_dim: int = 2048

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "OmniAudioConfig":
        return cls(
            num_mel_bins=cfg.get("num_mel_bins", 128),
            d_model=cfg.get("d_model", 1280),
            encoder_layers=cfg.get("encoder_layers", 32),
            encoder_attention_heads=cfg.get("encoder_attention_heads", 20),
            encoder_ffn_dim=cfg.get("encoder_ffn_dim", 5120),
            n_window=cfg.get("n_window", 100),
            max_source_positions=cfg.get("max_source_positions", 1500),
            output_dim=cfg.get("output_dim", 2048),
        )


@dataclasses.dataclass(frozen=True)
class QwenOmniConfig:
    audio: OmniAudioConfig = dataclasses.field(default_factory=OmniAudioConfig)
    vision: Qwen25VLVisionConfig = dataclasses.field(default_factory=Qwen25VLVisionConfig)
    text: Qwen2TextConfig = dataclasses.field(default_factory=Qwen2TextConfig)
    audio_token_id: int = 151646
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "QwenOmniConfig":
        thinker = cfg.get("thinker_config", cfg)
        return cls(
            audio=OmniAudioConfig.from_hf_config(thinker["audio_config"]),
            vision=Qwen25VLVisionConfig.from_hf_config(thinker["vision_config"]),
            text=Qwen2TextConfig.from_hf_config(thinker["text_config"]),
            audio_token_id=thinker.get("audio_token_id", cfg.get("audio_token_id", 151646)),
            image_token_id=thinker.get("image_token_id", cfg.get("image_token_id", 151655)),
            video_token_id=thinker.get("video_token_id", cfg.get("video_token_id", 151656)),
            vision_start_token_id=thinker.get("vision_start_token_id", 151652),
        )


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper sinusoid table (HF SinusoidsPositionEmbedding, :683-699)."""
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


class OmniAudioEncoderLayer(nn.Module):
    config: OmniAudioConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=name)  # noqa: E731
        residual = x
        h = ln("self_attn_layer_norm")(x)
        h = OmniAudioAttention(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="self_attn")(
            h, attn_bias
        )
        x = residual + h
        residual = x
        h = ln("final_layer_norm")(x)
        h = QDense(cfg.encoder_ffn_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = QDense(cfg.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)
        return residual + h


class OmniAudioAttention(nn.Module):
    """Whisper-style MHA: q/v/out have bias, k does not (:576-579)."""

    config: OmniAudioConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.config
        b, s, _ = x.shape
        dense = lambda bias, name: QDense(  # noqa: E731
            cfg.d_model, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense(True, "q_proj")(x).reshape(b, s, cfg.encoder_attention_heads, cfg.head_dim)
        k = dense(False, "k_proj")(x).reshape(b, s, cfg.encoder_attention_heads, cfg.head_dim)
        v = dense(True, "v_proj")(x).reshape(b, s, cfg.encoder_attention_heads, cfg.head_dim)
        import jax

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * cfg.head_dim**-0.5 + attn_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, cfg.d_model)
        return dense(True, "o_proj")(out)


class OmniAudioEncoder(nn.Module):
    """Audio tower over fixed-size chunk windows.

    Inputs:
      chunks:      (N, 2*n_window, mel) — mel frames, zero-padded
      frame_mask:  (N, 2*n_window) bool — valid mel frames (right-aligned)

    Output: (N, n_window // 2, output_dim) per-chunk audio tokens; valid
    token count per chunk = floor(ceil(valid_frames / 2) / 2).
    """

    config: OmniAudioConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, chunks: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = chunks.astype(self.dtype)
        # conv k3 pad1 (+gelu, masked), then conv k3 stride2 pad1 (+gelu)
        x = nn.Conv(cfg.d_model, kernel_size=(3,), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False) * frame_mask[..., None].astype(self.dtype)
        x = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(2,), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)  # (N, n_window, d)

        pos = sinusoid_positions(cfg.max_source_positions, cfg.d_model)[: x.shape[1]]
        x = x + jnp.asarray(pos, dtype=self.dtype)[None]

        # after-cnn frame validity: ceil(valid/2) frames per chunk
        valid_frames = frame_mask.sum(axis=1)
        after_cnn = (valid_frames - 1) // 2 + 1
        frame_idx = jnp.arange(x.shape[1])[None, :]
        after_mask = frame_idx < after_cnn[:, None]
        attn_bias = make_attention_bias(after_mask.astype(jnp.int32), causal=False)

        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            from colpali_tpu.models.layers import scanned_stack

            x, _ = scanned_stack(
                OmniAudioEncoderLayer, layer_kwargs, cfg.encoder_layers,
                num_args=1, remat=self.remat,
            )(name="layers")(x, attn_bias)
        else:
            lcls = remat_layer(OmniAudioEncoderLayer, self.remat)
            for i in range(cfg.encoder_layers):
                x = lcls(**layer_kwargs, name=f"layers_{i}")(x, attn_bias)

        # pair-average pool -> LayerNorm -> projection (:818-824)
        n, s, d = x.shape
        x = x.reshape(n, s // 2, 2, d).mean(axis=2)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="ln_post")(x)
        return QDense(cfg.output_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(x)


class QwenOmniBackbone(nn.Module):
    """Thinker backbone: audio + vision towers merged into the Qwen2.5 LM."""

    config: QwenOmniConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.audio_tower = OmniAudioEncoder(cfg.audio, dtype=self.dtype, param_dtype=self.param_dtype,
                                            scan_layers=self.scan_layers, remat=self.remat)
        self.visual = Qwen25VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                        scan_layers=self.scan_layers, remat=self.remat)
        self.language_model = Qwen2Decoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                           scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        audio_chunks: Optional[jnp.ndarray] = None,  # (B, C, 2*n_window, mel)
        audio_frame_mask: Optional[jnp.ndarray] = None,  # (B, C, 2*n_window)
        pixel_values: Optional[jnp.ndarray] = None,
        vision_hpos: Optional[jnp.ndarray] = None,
        vision_wpos: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        window_id: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        inputs_embeds = self.language_model.embed(input_ids)

        if audio_chunks is not None:
            b, c = audio_chunks.shape[:2]
            feats = self.audio_tower(
                audio_chunks.reshape(b * c, *audio_chunks.shape[2:]),
                audio_frame_mask.reshape(b * c, -1),
            )  # (B*C, n_window//2, out)
            feats = feats.reshape(b, c * feats.shape[1], feats.shape[2])
            audio_mask = input_ids == cfg.audio_token_id
            inputs_embeds = merge_image_embeddings(inputs_embeds, audio_mask, feats)

        if pixel_values is not None:
            vfeats = self.visual(pixel_values, vision_hpos, vision_wpos, patch_mask, window_id)
            vis_mask = (input_ids == cfg.image_token_id) | (input_ids == cfg.video_token_id)
            inputs_embeds = merge_image_embeddings(inputs_embeds, vis_mask, vfeats)

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


class ColQwen2_5Omni(nn.Module):  # noqa: N801 — reference naming
    """Late-interaction retriever over the Omni thinker (audio/video/image
    documents; reference modeling_colqwen_omni.py:10-101)."""

    config: QwenOmniConfig
    dim: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = QwenOmniBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, **modal_kwargs):
        hidden = self.model(input_ids, attention_mask, **modal_kwargs)
        return self.head(hidden, attention_mask)


class BiQwen2_5Omni(nn.Module):  # noqa: N801
    config: QwenOmniConfig
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.model = QwenOmniBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.head = DenseHead(DenseHeadConfig(pooling_strategy=self.pooling_strategy),
                              dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, **modal_kwargs):
        hidden = self.model(input_ids, attention_mask, **modal_kwargs)
        return self.head(hidden, attention_mask)
