"""Heads and merge utilities shared by every ColVision model family.

The reference copy-pastes the projection-head forward into 18 model classes
(e.g. modeling_colpali.py:59-78, modeling_colqwen2.py:48-75); here it is one
module reused everywhere.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from colpali_tpu.models.configs import DenseHeadConfig
from colpali_tpu.models.layers import Dtype, QDense, l2_normalize


def merge_image_embeddings(
    inputs_embeds: jnp.ndarray,
    image_token_mask: jnp.ndarray,
    image_features: jnp.ndarray,
) -> jnp.ndarray:
    """Splice image features into the embedding stream at image-token slots.

    JAX equivalent of HF's ``masked_scatter`` (modeling_paligemma.py:355):
    the k-th True position in row b receives ``image_features[b, k]``.

    Args:
        inputs_embeds: ``(B, S, D)`` token embeddings.
        image_token_mask: ``(B, S)`` bool, True at image-token positions.
        image_features: ``(B, n_img, D)`` projected image patch features; row
            b must have exactly ``n_img`` True positions (or fewer; extra
            features are ignored).
    """
    n_img = image_features.shape[1]
    idx = jnp.clip(jnp.cumsum(image_token_mask, axis=1) - 1, 0, n_img - 1)
    scattered = jnp.take_along_axis(image_features, idx[..., None], axis=1)
    return jnp.where(image_token_mask[..., None], scattered.astype(inputs_embeds.dtype), inputs_embeds)


class MultiVectorHead(nn.Module):
    """Late-interaction head: linear -> L2 normalize -> mask padding.

    Reference semantics: modeling_colpali.py:66-78 (`custom_text_proj`).
    """

    dim: int = 128
    norm_eps: float = 0.0  # ColModernVBert clamps at 1e-12, others at 0
    proj_name: str = "custom_text_proj"  # ColIdefics3 names it "linear"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: jnp.ndarray,
        image_token_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        proj = QDense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=self.proj_name)(
            hidden_states
        )
        proj = l2_normalize(proj, eps=self.norm_eps)
        proj = proj * attention_mask[..., None].astype(proj.dtype)
        if image_token_mask is not None:
            proj = proj * image_token_mask[..., None].astype(proj.dtype)
        return proj


class DenseHead(nn.Module):
    """Bi-encoder head: pool (cls/last/mean) -> optional projection ->
    optional Matryoshka truncation -> L2 normalize.

    Reference semantics: modeling_bipali.py:71-84, modeling_biqwen2.py:27-77,
    modeling_bigemma.py:36-58.
    """

    config: DenseHeadConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mask = attention_mask.astype(jnp.float32)
        if cfg.pooling_strategy == "mean":
            pooled = jnp.sum(hidden_states * mask[..., None], axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1, keepdims=True), 1.0
            )
        elif cfg.pooling_strategy == "cls":
            pooled = hidden_states[:, 0]
        elif cfg.pooling_strategy == "last":
            # literal last position — the reference assumes left padding
            # (modeling_biqwen2.py:66: "use last token since we are left padding")
            pooled = hidden_states[:, -1]
        else:
            raise ValueError(f"Unknown pooling strategy: {cfg.pooling_strategy}")

        if cfg.projection_dim is not None:
            pooled = QDense(cfg.projection_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(
                pooled
            )
        if cfg.embedding_dim is not None:
            pooled = pooled[..., : cfg.embedding_dim]
        return l2_normalize(pooled)
