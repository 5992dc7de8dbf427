"""SigLIP vision tower in flax.linen.

Behavioral spec: transformers SiglipVisionModel (HF modeling_siglip.py) as
used by PaliGemma with ``vision_use_head=False`` — patch conv + learned
position embeddings, pre-LN encoder with gelu-tanh MLPs, final post_layernorm,
no CLS token and no pooling head.

TPU notes: images are NHWC (JAX conv convention; the HF loader transposes
torch's OIHW conv kernel to HWIO). The patchify conv is a single
448/14 -> 32x32 valid conv that XLA maps onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.configs import SiglipVisionConfig
from colpali_tpu.models.layers import MLP, Attention, Dtype, scanned_stack, remat_layer


class SiglipEncoderLayer(nn.Module):
    config: SiglipVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        residual = x
        x = ln("layer_norm1")(x)
        x = Attention(
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(x)
        x = residual + x
        residual = x
        x = ln("layer_norm2")(x)
        x = MLP(
            intermediate_size=cfg.intermediate_size,
            activation="gelu_pytorch_tanh",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(x)
        return residual + x


class SiglipVisionTower(nn.Module):
    """Full vision tower: (B, H, W, 3) pixel values -> (B, patches, hidden)."""

    config: SiglipVisionConfig
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
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, num_patches, hidden)

        pos = nn.Embed(
            cfg.num_patches,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="position_embedding",
        )(jnp.arange(x.shape[1])[None, :])
        x = x + pos

        layer_kwargs = dict(config=cfg, dtype=self.dtype, param_dtype=self.param_dtype)
        if self.scan_layers:
            x, _ = scanned_stack(
                SiglipEncoderLayer, layer_kwargs, cfg.num_hidden_layers, num_args=0, remat=self.remat
            )(name="layers")(x)
        else:
            lcls = remat_layer(SiglipEncoderLayer, self.remat)
            for i in range(cfg.num_hidden_layers):
                x = lcls(**layer_kwargs, name=f"layers_{i}")(x)

        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="post_layernorm"
        )(x)
