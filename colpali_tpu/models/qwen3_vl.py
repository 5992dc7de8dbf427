"""Qwen3-VL backbone + ColQwen3 / BiQwen3 (flax.linen).

Behavioral spec:
- transformers Qwen3VLModel (modeling_qwen3_vl.py): vision tower with learned
  absolute position embeddings bilinearly interpolated to the image grid
  (:642-702), LayerNorm blocks with gelu-tanh MLPs, DEEPSTACK — patch-merger
  features tapped from intermediate vision layers are ADDED to the LM's
  hidden states at image positions in the first N decoder layers (:876-882);
  Qwen3 text decoder with per-head q/k RMSNorm and INTERLEAVED M-RoPE
  (:298-313: [THTHWHTHW...] channel layout instead of Qwen2's chunked
  sections).
- reference ColQwen3
  (/root/reference/colpali_engine/models/qwen3/colqwen3/modeling_colqwen3.py):
  dim=320 multi-vector head.

TPU-first: same padded per-image patch layout as our qwen2_vl; the position
interpolation's gather indices/weights are host-computed (they depend only on
integer grid geometry) so the jitted model does 4 embedding lookups + a
weighted sum.
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
    remat_layer,
    QDense,
    ACTIVATIONS,
    Attention,
    Dtype,
    GatedMLP,
    RMSNorm,
    flash_auto_ok,
    make_attention_bias,
    scanned_stack,
)


@dataclasses.dataclass(frozen=True)
class Qwen3VLVisionConfig:
    """Defaults = Qwen3-VL-4B vision tower."""

    depth: int = 27
    hidden_size: int = 1152
    num_heads: int = 16
    intermediate_size: int = 4304
    out_hidden_size: int = 2560
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple = (8, 16, 24)
    in_channels: int = 3
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def num_grid_per_side(self) -> int:
        return int(self.num_position_embeddings**0.5)

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen3VLVisionConfig":
        return cls(
            depth=cfg.get("depth", 27),
            hidden_size=cfg.get("hidden_size", 1152),
            num_heads=cfg.get("num_heads", 16),
            intermediate_size=cfg.get("intermediate_size", 4304),
            out_hidden_size=cfg.get("out_hidden_size", 2560),
            patch_size=cfg.get("patch_size", 16),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            num_position_embeddings=cfg.get("num_position_embeddings", 2304),
            deepstack_visual_indexes=tuple(cfg.get("deepstack_visual_indexes", (8, 16, 24))),
            in_channels=cfg.get("in_channels", 3),
            hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
        )


@dataclasses.dataclass(frozen=True)
class Qwen3TextConfig:
    """Defaults = Qwen3-VL-4B text decoder."""

    vocab_size: int = 151936
    hidden_size: int = 2560
    intermediate_size: int = 9728
    num_hidden_layers: int = 36
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 5000000.0
    rms_norm_eps: float = 1e-6
    mrope_section: tuple = (24, 20, 20)

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen3TextConfig":
        rope_scaling = cfg.get("rope_scaling") or {}
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"],
            rope_theta=cfg.get("rope_theta", 5000000.0),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            mrope_section=tuple(rope_scaling.get("mrope_section", (24, 20, 20))),
        )


@dataclasses.dataclass(frozen=True)
class Qwen3VLConfig:
    vision: Qwen3VLVisionConfig = dataclasses.field(default_factory=Qwen3VLVisionConfig)
    text: Qwen3TextConfig = dataclasses.field(default_factory=Qwen3TextConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    video_token_id: int = 151656

    @classmethod
    def from_hf_config(cls, cfg: Mapping[str, Any]) -> "Qwen3VLConfig":
        text_cfg = cfg.get("text_config", cfg)
        return cls(
            vision=Qwen3VLVisionConfig.from_hf_config(cfg["vision_config"]),
            text=Qwen3TextConfig.from_hf_config(text_cfg),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            video_token_id=cfg.get("video_token_id", 151656),
        )


def pos_embed_interp_indices(
    grid_thw: tuple, num_grid_per_side: int, merge_size: int
) -> tuple:
    """Host-side: per-patch 4-tap bilinear gather indices and weights into the
    learned position table, emitted in merge-block patch order (HF
    fast_pos_embed_interpolate, modeling_qwen3_vl.py:642-702)."""
    import numpy as np

    t, h, w = grid_thw
    side = num_grid_per_side
    h_idxs = np.linspace(0, side - 1, h)
    w_idxs = np.linspace(0, side - 1, w)
    h_floor = h_idxs.astype(np.int32)
    w_floor = w_idxs.astype(np.int32)
    h_ceil = np.clip(h_floor + 1, None, side - 1)
    w_ceil = np.clip(w_floor + 1, None, side - 1)
    dh = (h_idxs - h_floor).astype(np.float32)
    dw = (w_idxs - w_floor).astype(np.float32)

    idx = np.stack(
        [
            (h_floor[:, None] * side + w_floor[None, :]),
            (h_floor[:, None] * side + w_ceil[None, :]),
            (h_ceil[:, None] * side + w_floor[None, :]),
            (h_ceil[:, None] * side + w_ceil[None, :]),
        ],
        axis=-1,
    ).reshape(h * w, 4)
    wgt = np.stack(
        [
            (1 - dh)[:, None] * (1 - dw)[None, :],
            (1 - dh)[:, None] * dw[None, :],
            dh[:, None] * (1 - dw)[None, :],
            dh[:, None] * dw[None, :],
        ],
        axis=-1,
    ).reshape(h * w, 4)

    # row-major (h, w) -> merge-block patch order, then repeat over t
    order = (
        np.arange(h * w)
        .reshape(h // merge_size, merge_size, w // merge_size, merge_size)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    idx = np.tile(idx[order], (t, 1))
    wgt = np.tile(wgt[order], (t, 1))
    return idx.astype(np.int32), wgt.astype(np.float32)


class Qwen3VisionPatchMerger(nn.Module):
    """norm -> group merge^2 patches -> fc1 -> GELU -> fc2
    (modeling_qwen3_vl.py:93-105). ``postshuffle_norm`` applies the LN on the
    grouped features (deepstack mergers) instead of per-patch."""

    config: Qwen3VLVisionConfig
    postshuffle_norm: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        merge = cfg.spatial_merge_size**2
        b, p, _ = x.shape
        ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm")
        if self.postshuffle_norm:
            x = x.reshape(b, p // merge, merge * cfg.hidden_size)
            x = ln(x)
        else:
            x = ln(x)
            x = x.reshape(b, p // merge, merge * cfg.hidden_size)
        x = QDense(merge * cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_fc1")(x)
        x = ACTIVATIONS["gelu"](x)
        return QDense(cfg.out_hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_fc2")(x)


class Qwen3VisionBlock(nn.Module):
    config: Qwen3VLVisionConfig
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
        h = QDense(cfg.intermediate_size, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_fc1")(h)
        h = ACTIVATIONS[cfg.hidden_act](h)
        h = QDense(cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_fc2")(h)
        return residual + h


class Qwen3VisionTower(nn.Module):
    """Returns (merged_features, deepstack_features list).

    With ``scan_layers=True`` the blocks run under one ``nn.scan`` that also
    collects every layer's output, so the deepstack taps read from the
    stacked ys instead of breaking the scan."""

    config: Qwen3VLVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, patches, hpos, wpos, patch_mask, pos_idx, pos_weight):
        cfg = self.config
        x = QDense(cfg.hidden_size, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embed")(patches.astype(self.dtype))

        # bilinear-interpolated learned position embeddings (host indices)
        table = nn.Embed(cfg.num_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pos_embed")
        taps = table(pos_idx)  # (B, P, 4, hidden)
        x = x + jnp.sum(taps * pos_weight[..., None].astype(self.dtype), axis=2)

        freq_dim = cfg.head_dim // 4
        inv_freq = 1.0 / (10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) * 2 / (cfg.head_dim // 2)))
        hfreq = hpos.astype(jnp.float32)[..., None] * inv_freq
        wfreq = wpos.astype(jnp.float32)[..., None] * inv_freq
        half = jnp.concatenate([hfreq, wfreq], axis=-1)
        emb = jnp.concatenate([half, half], axis=-1)
        rope = (jnp.cos(emb), jnp.sin(emb))

        # mask (not a prebuilt bias) so Attention can take the TPU flash path
        mask32 = patch_mask.astype(jnp.int32)

        block_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            stack = scanned_stack(
                Qwen3VisionBlock, block_kwargs, cfg.depth, num_args=2,
                remat=self.remat, collect=True,
            )(name="blocks")
            x, ys = stack(x, mask32, rope)
            taps = [ys[i] for i in cfg.deepstack_visual_indexes]
        else:
            taps = []
            for i in range(cfg.depth):
                x = Qwen3VisionBlock(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                     name=f"blocks_{i}")(x, mask32, rope)
                if i in cfg.deepstack_visual_indexes:
                    taps.append(x)
        deepstack = [
            Qwen3VisionPatchMerger(
                cfg, postshuffle_norm=True, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"deepstack_merger_{k}",
            )(tap)
            for k, tap in enumerate(taps)
        ]
        merged = Qwen3VisionPatchMerger(cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="merger")(x)
        return merged, deepstack


def interleaved_mrope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    theta: float,
    mrope_section: tuple,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved M-RoPE (HF apply_interleaved_mrope,
    modeling_qwen3_vl.py:298-313): start from the T channel, then overwrite
    every 3rd frequency with H (offset 1) and W (offset 2)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, S, head/2)
    half = head_dim // 2
    chan = jax.lax.broadcasted_iota(jnp.int32, (half,), 0)
    sel = jnp.zeros((half,), jnp.int32)  # default T
    sel = jnp.where((chan % 3 == 1) & (chan < mrope_section[1] * 3), 1, sel)
    sel = jnp.where((chan % 3 == 2) & (chan < mrope_section[2] * 3), 2, sel)
    mixed = jnp.take_along_axis(
        jnp.moveaxis(freqs, 0, -1),  # (B, S, half, 3)
        jnp.broadcast_to(sel[None, None, :, None], (*freqs.shape[1:3], half, 1)),
        axis=-1,
    )[..., 0]
    emb = jnp.concatenate([mixed, mixed], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


class Qwen3DecoderLayer(nn.Module):
    """One Qwen3 block + optional deepstack injection.

    ``inj_stack`` is the (n_deepstack, B, S, D) tensor of image-position
    visual features (already scattered to sequence positions); layer ``i``
    adds slice ``i`` when ``i < n_deepstack`` (HF _deepstack_process,
    modeling_qwen3_vl.py:876-882). Taking the slice by a clamped dynamic
    index keeps the layer uniform, so the whole stack scans."""

    config: Qwen3TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layer_idx, attn_bias, rope, inj_stack=None):
        # attn_bias: (B, 1, S, S) prebuilt additive bias -> einsum path, or
        # (B, S) validity mask -> causal flash (routed once per trace by
        # Qwen3VLBackbone, same pattern as Qwen2VLBackbone)
        cfg = self.config
        attn_kwargs = (
            dict(mask=attn_bias, causal=True) if attn_bias.ndim == 2
            else dict(attn_bias=attn_bias)
        )
        residual = x
        h = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype,
                    name="input_layernorm")(x)
        h = Attention(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            use_bias=False,
            out_dim=cfg.hidden_size,
            qk_norm_eps=cfg.rms_norm_eps,
            qk_norm_offset=False,  # Qwen3 RMSNorm has no unit offset
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(h, rope=rope, **attn_kwargs)
        x = residual + h
        residual = x
        h = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype,
                    name="post_attention_layernorm")(x)
        h = GatedMLP(intermediate_size=cfg.intermediate_size, activation="silu", dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(h)
        x = residual + h
        if inj_stack is not None:
            n_ds = inj_stack.shape[0]
            i = jnp.asarray(layer_idx)  # concrete int on the unrolled path
            inj = jax.lax.dynamic_index_in_dim(
                inj_stack.astype(x.dtype), jnp.minimum(i, n_ds - 1), 0, keepdims=False
            )
            x = x + inj * (i < n_ds).astype(x.dtype)
        return x


class Qwen3Decoder(nn.Module):
    """Qwen3 text stack with deepstack visual injection."""

    config: Qwen3TextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False  # scan over layers: 1 traced layer, fast compile
    remat: bool = False  # rematerialize layer activations in the backward pass

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            # the layer index is a scanned input: the deepstack injection
            # becomes a clamped dynamic slice inside the (uniform) layer
            self.layer_stack = scanned_stack(
                Qwen3DecoderLayer,
                layer_kwargs,
                cfg.num_hidden_layers,
                num_args=4,
                remat=self.remat,
                scanned_args=1,
            )(name="layers")
        else:
            lcls = remat_layer(Qwen3DecoderLayer, self.remat)
            self.layers = [
                lcls(**layer_kwargs, name=f"layers_{i}") for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, add_unit_offset=False, param_dtype=self.param_dtype)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds, attn_bias, position_ids, image_mask=None, deepstack=None):
        cfg = self.config
        rope = interleaved_mrope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
        x = inputs_embeds.astype(self.dtype)

        inj_stack = None
        if deepstack is not None and len(deepstack) > 0:
            # scatter each deepstack feature to its image-token positions once,
            # outside the layer stack (HF _deepstack_process,
            # modeling_qwen3_vl.py:876-882) -> (n_deepstack, B, S, D)
            injs = []
            for ds in deepstack:
                n_img = ds.shape[1]
                idx = jnp.clip(jnp.cumsum(image_mask, axis=1) - 1, 0, n_img - 1)
                scattered = jnp.take_along_axis(ds.astype(x.dtype), idx[..., None], axis=1)
                injs.append(jnp.where(image_mask[..., None], scattered, 0))
            inj_stack = jnp.stack(injs)

        if self.scan_layers:
            idxs = jnp.arange(cfg.num_hidden_layers)
            x, _ = self.layer_stack(x, idxs, attn_bias, rope, inj_stack)
        else:
            for i, layer in enumerate(self.layers):
                x = layer(x, i, attn_bias, rope, inj_stack)
        return self.norm(x)


class Qwen3VLBackbone(nn.Module):
    config: Qwen3VLConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.visual = Qwen3VisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                       scan_layers=self.scan_layers, remat=self.remat)
        self.language_model = Qwen3Decoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
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
        image_mask = None
        deepstack = None
        if pixel_values is not None:
            feats, deepstack = self.visual(
                pixel_values, vision_hpos, vision_wpos, patch_mask, pos_idx, pos_weight
            )
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
        return self.language_model(inputs_embeds, attn_bias, position_ids, image_mask, deepstack)


class ColQwen3(nn.Module):
    """Late-interaction retriever over Qwen3-VL — 320-dim head (reference
    modeling_colqwen3.py:49)."""

    config: Qwen3VLConfig
    dim: int = 320
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen3VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                     scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_id
        return self.head(hidden, attention_mask, image_mask)


class BiQwen3(nn.Module):
    """Single-vector retriever over Qwen3-VL."""

    config: Qwen3VLConfig
    pooling_strategy: str = "last"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = Qwen3VLBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                     scan_layers=self.scan_layers, remat=self.remat)
        self.head = DenseHead(DenseHeadConfig(pooling_strategy=self.pooling_strategy),
                              dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask, pixel_values=None, **vision_kwargs):
        hidden = self.model(input_ids, attention_mask, pixel_values, **vision_kwargs)
        return self.head(hidden, attention_mask)
