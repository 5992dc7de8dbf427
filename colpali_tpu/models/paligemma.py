"""PaliGemma backbone + ColPali / BiPali retrieval models (flax.linen).

Behavioral spec:
- transformers PaliGemmaModel: vision tower -> linear projector -> divide by
  sqrt(text hidden) -> splice into <image> token slots -> Gemma decoder with
  FULL (non-causal) attention over the prefix at inference
  (modeling_paligemma.py:206,244,355).
- ColPali head: /root/reference/colpali_engine/models/paligemma/colpali/
  modeling_colpali.py:40-78 (128-dim custom_text_proj, L2 norm, mask).
- BiPali / BiPaliProj: .../bipali/modeling_bipali.py:9-149 (mean pool over
  attention mask; Proj variant adds a 1024-dim linear).

Positions are 1-indexed (modeling_paligemma.py:347: "Paligemma positions are
1-indexed").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.common import DenseHead, MultiVectorHead, merge_image_embeddings
from colpali_tpu.models.configs import DenseHeadConfig, PaliGemmaConfig
from colpali_tpu.models.gemma import GemmaDecoder
from colpali_tpu.models.layers import Dtype, QDense
from colpali_tpu.models.siglip import SiglipVisionTower


class PaliGemmaBackbone(nn.Module):
    """SigLIP + projector + Gemma; returns last hidden states."""

    config: PaliGemmaConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.vision_tower = SiglipVisionTower(cfg.vision, dtype=self.dtype, param_dtype=self.param_dtype,
                                              scan_layers=self.scan_layers, remat=self.remat)
        self.multi_modal_projector = QDense(
            cfg.projection_dim, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.language_model = GemmaDecoder(cfg.text, dtype=self.dtype, param_dtype=self.param_dtype,
                                           scan_layers=self.scan_layers, remat=self.remat)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """
        Args:
            input_ids: ``(B, S)`` token ids (image tokens included).
            attention_mask: ``(B, S)`` 1 = real token, 0 = padding.
            pixel_values: ``(B, H, W, 3)`` normalized pixels (NHWC), or None
                for text-only (query) inputs.

        Returns:
            ``(B, S, hidden)`` last hidden states.
        """
        cfg = self.config
        # Image tokens may be >= vocab in some checkpoints; HF replaces them
        # with id 0 before embedding (modeling_paligemma.py:330-334).
        safe_ids = jnp.where(input_ids == cfg.image_token_index, 0, input_ids)
        inputs_embeds = self.language_model.embed(safe_ids)

        if pixel_values is not None:
            image_hidden = self.vision_tower(pixel_values)
            image_features = self.multi_modal_projector(image_hidden)
            image_features = image_features / jnp.asarray(cfg.text.hidden_size**0.5, dtype=self.dtype)
            image_mask = input_ids == cfg.image_token_index
            inputs_embeds = merge_image_embeddings(inputs_embeds, image_mask, image_features)

        # Whole input is "prefix": full bidirectional attention over valid
        # tokens (inference-mode PaliGemma masking). The raw mask goes down
        # so Attention can use the fused flash kernel on TPU.
        b, s = input_ids.shape
        position_ids = jnp.broadcast_to(jnp.arange(1, s + 1)[None, :], (b, s))  # 1-indexed
        return self.language_model(inputs_embeds, attention_mask, position_ids)


class ColPali(nn.Module):
    """Late-interaction multi-vector retriever over PaliGemma.

    Forward output matches the reference ColPali.forward
    (modeling_colpali.py:59-78): ``(B, S, 128)`` L2-normalized, mask-zeroed
    per-token embeddings.
    """

    config: PaliGemmaConfig
    dim: int = 128
    mask_non_image_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False

    def setup(self):
        self.model = PaliGemmaBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype,
                                       scan_layers=self.scan_layers, remat=self.remat)
        self.head = MultiVectorHead(dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        hidden = self.model(input_ids, attention_mask, pixel_values)
        image_mask = None
        if pixel_values is not None and self.mask_non_image_embeddings:
            image_mask = input_ids == self.config.image_token_index
        return self.head(hidden, attention_mask, image_mask)


class BiPali(nn.Module):
    """Single-vector (bi-encoder) retriever over PaliGemma.

    ``projection_dim=1024`` gives BiPaliProj (modeling_bipali.py:87-149).
    """

    config: PaliGemmaConfig
    pooling_strategy: str = "mean"
    projection_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.model = PaliGemmaBackbone(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.head = DenseHead(
            DenseHeadConfig(pooling_strategy=self.pooling_strategy, projection_dim=self.projection_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        hidden = self.model(input_ids, attention_mask, pixel_values)
        return self.head(hidden, attention_mask)


class BiPaliProj(BiPali):
    """BiPali with the trained 1024-d projection head — the reference's
    separate class (modeling_bipali.py:87-149); here just BiPali with the
    projection default flipped on."""

    projection_dim: Optional[int] = 1024
