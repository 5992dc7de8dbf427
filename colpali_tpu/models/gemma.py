"""Gemma decoder LM in flax.linen.

Behavioral spec: transformers GemmaModel (HF modeling_gemma.py) — RMSNorm
with unit offset and fp32 statistics, rotary theta 10000 over the full head,
GQA/MQA attention scaled by head_dim**-0.5, gelu-tanh gated MLP, and the
sqrt(hidden_size) embedding normalizer applied to inputs_embeds
(modeling_gemma.py:400-401).

The decoder takes ``inputs_embeds`` (PaliGemma merges image features into the
embedding stream before the LM) and an additive attention bias, so the same
module serves causal LM and PaliGemma's full-prefix attention.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.configs import GemmaConfig
from colpali_tpu.models.layers import Attention, Dtype, GatedMLP, RMSNorm, rope_cos_sin, scanned_stack, remat_layer


class GemmaDecoderLayer(nn.Module):
    config: GemmaConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, rope):
        # attn_mask is the (B, S) token-validity mask; PaliGemma attention is
        # always full bidirectional over valid tokens (prefix-LM inference
        # masking) — passing the mask instead of a prebuilt additive bias
        # lets Attention route to the fused flash kernel on TPU.
        cfg = self.config
        residual = x
        x = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name="input_layernorm")(x)
        x = Attention(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(x, rope=rope, mask=attn_mask, causal=False)
        x = residual + x
        residual = x
        x = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name="post_attention_layernorm")(x)
        x = GatedMLP(
            intermediate_size=cfg.intermediate_size,
            activation="gelu_pytorch_tanh",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(x)
        return residual + x


class GemmaDecoder(nn.Module):
    """Gemma transformer stack over pre-merged input embeddings."""

    config: GemmaConfig
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
            self.layer_stack = scanned_stack(
                GemmaDecoderLayer, layer_kwargs, cfg.num_hidden_layers, num_args=2, remat=self.remat
            )(name="layers")
        else:
            lcls = remat_layer(GemmaDecoderLayer, self.remat)
            self.layers = [
                lcls(**layer_kwargs, name=f"layers_{i}") for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Raw token embeddings (no normalizer — applied in __call__)."""
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: jnp.ndarray,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b, s, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        rope = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

        # Gemma scales the merged embedding stream by sqrt(hidden_size),
        # computed in the activation dtype (HF: modeling_gemma.py:400).
        normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype=self.dtype)
        x = inputs_embeds.astype(self.dtype) * normalizer

        if self.scan_layers:
            x, _ = self.layer_stack(x, attention_mask, rope)
        else:
            for layer in self.layers:
                x = layer(x, attention_mask, rope)
        return self.norm(x)
