"""HF checkpoint -> JAX pytree weight conversion.

The reference loads HF checkpoints through transformers' ``from_pretrained``
with per-model ``_checkpoint_conversion_mapping`` regex remaps
(modeling_colpali.py:25-38, tests/models/test_checkpoint_key_mappings.py).
Here the same knowledge lives in one module: normalize checkpoint keys across
transformers-version layouts and merged-LoRA exports, then mechanically
translate torch tensors (Linear out,in / Conv OIHW / Embedding) into flax
param pytrees (kernel in,out / HWIO / embedding).

Works from either an in-memory state dict (numpy/torch tensors) or a
directory of ``*.safetensors`` shards.
"""

from __future__ import annotations

import json
import os
import re

import jax
from typing import Any, Callable, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

# Key normalization regexes: old/LoRA-merged layouts -> transformers>=4.52
# PaliGemma layout. Mirrors the knowledge in the reference's
# _checkpoint_conversion_mapping (modeling_colpali.py:25-31) — patterns
# rewritten for the layout this loader consumes.
PALIGEMMA_KEY_REMAPS: Tuple[Tuple[str, str], ...] = (
    (r"^base_model\.model\.", ""),  # merged-LoRA exports
    (r"^model\.language_model\.model\.", "model.language_model."),  # transformers<5 nesting
    (r"^model\.language_model\.lm_head\.", "lm_head."),
    (r"^language_model\.model\.", "model.language_model."),
    (r"^vision_tower\.", "model.vision_tower."),
    (r"^multi_modal_projector\.", "model.multi_modal_projector."),
    (r"\.lora_[AB]\.", ".__lora__."),  # marker: unmerged LoRA factors are skipped
)


def normalize_keys(
    state_dict: Mapping[str, Any],
    remaps: Tuple[Tuple[str, str], ...],
) -> Dict[str, Any]:
    """Apply regex key remaps (first match rewrites, all patterns applied in
    order), dropping unmerged-LoRA factor keys."""
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        for pattern, repl in remaps:
            key = re.sub(pattern, repl, key)
        if "__lora__" in key:
            continue
        out[key] = value
    return out


def _np(x: Any) -> np.ndarray:
    """torch tensor / numpy array -> numpy (bf16 via float32 roundtrip)."""
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope
    if hasattr(x, "detach"):
        x = x.detach()
        if str(x.dtype) == "torch.bfloat16":
            return x.float().numpy().astype(jnp.bfloat16)
        return x.numpy()
    return np.asarray(x)


def t_linear(w: Any) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return _np(w).T


def t_conv2d(w: Any) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def t_id(w: Any) -> np.ndarray:
    return _np(w)


# (torch key regex, flax path template, tensor transform)
# Path templates use {i} for the captured layer index; "/" separates tree keys.
_RuleT = Tuple[str, str, Callable[[Any], np.ndarray]]

PALIGEMMA_RULES: Tuple[_RuleT, ...] = (
    # --- SigLIP vision tower ---
    (r"model\.vision_tower\.vision_model\.embeddings\.patch_embedding\.weight",
     "model/vision_tower/patch_embedding/kernel", t_conv2d),
    (r"model\.vision_tower\.vision_model\.embeddings\.patch_embedding\.bias",
     "model/vision_tower/patch_embedding/bias", t_id),
    (r"model\.vision_tower\.vision_model\.embeddings\.position_embedding\.weight",
     "model/vision_tower/position_embedding/embedding", t_id),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.layer_norm([12])\.weight",
     "model/vision_tower/layers_{i}/layer_norm{j}/scale", t_id),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.layer_norm([12])\.bias",
     "model/vision_tower/layers_{i}/layer_norm{j}/bias", t_id),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.weight",
     "model/vision_tower/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/vision_tower/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight",
     "model/vision_tower/layers_{i}/self_attn/o_proj/kernel", t_linear),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias",
     "model/vision_tower/layers_{i}/self_attn/o_proj/bias", t_id),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.weight",
     "model/vision_tower/layers_{i}/mlp/fc{j}/kernel", t_linear),
    (r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.bias",
     "model/vision_tower/layers_{i}/mlp/fc{j}/bias", t_id),
    (r"model\.vision_tower\.vision_model\.post_layernorm\.weight",
     "model/vision_tower/post_layernorm/scale", t_id),
    (r"model\.vision_tower\.vision_model\.post_layernorm\.bias",
     "model/vision_tower/post_layernorm/bias", t_id),
    # --- projector ---
    (r"model\.multi_modal_projector\.linear\.weight", "model/multi_modal_projector/kernel", t_linear),
    (r"model\.multi_modal_projector\.linear\.bias", "model/multi_modal_projector/bias", t_id),
    # --- Gemma LM ---
    (r"model\.language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"model\.language_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    (r"model\.language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"model\.language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"model\.language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # --- retrieval head (ColPali checkpoints) ---
    (r"(?:model\.)?custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"(?:model\.)?custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
    # SigLIP attention-pooling head: present in some checkpoints but unused
    # by PaliGemma (vision feature = post_layernorm output)
    (r"model\.vision_tower\.vision_model\.head\..*", "", t_id),
)


# ---------------------------------------------------------------------------
# Qwen2-VL family
# ---------------------------------------------------------------------------

QWEN2_VL_KEY_REMAPS: Tuple[Tuple[str, str], ...] = (
    (r"^base_model\.model\.", ""),  # merged-LoRA exports
    (r"^model\.layers\.", "language_model.layers."),  # reference remap (modeling_colqwen2.py:21-24)
    (r"^model\.visual\.", "visual."),
    (r"^model\.language_model\.", "language_model."),
    (r"^model\.embed_tokens\.", "language_model.embed_tokens."),
    (r"^model\.norm\.", "language_model.norm."),
    (r"\.lora_[AB]\.", ".__lora__."),
)


def t_conv3d_patch(w: Any) -> np.ndarray:
    """torch Conv3d patch kernel (O, C, T, pH, pW) -> dense (C*T*pH*pW, O).

    Valid because stride == kernel == patch: the conv is a plain dot with the
    flattened patch, whose feature order is (C, T, pH, pW)
    (HF PatchEmbed.forward view, modeling_qwen2_vl.py:246-252).
    """
    arr = _np(w)
    return arr.reshape(arr.shape[0], -1).T


QWEN2_VL_RULES: Tuple[_RuleT, ...] = (
    # --- vision tower ---
    (r"visual\.patch_embed\.proj\.weight", "model/visual/patch_embed/kernel", t_conv3d_patch),
    (r"visual\.blocks\.(\d+)\.norm([12])\.weight", "model/visual/blocks_{i}/norm{j}/scale", t_id),
    (r"visual\.blocks\.(\d+)\.norm([12])\.bias", "model/visual/blocks_{i}/norm{j}/bias", t_id),
    # fused qkv handled by split_fused_qkv() before rule matching
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.weight",
     "model/visual/blocks_{i}/attn/{j}_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.bias",
     "model/visual/blocks_{i}/attn/{j}_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.weight", "model/visual/blocks_{i}/attn/o_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.bias", "model/visual/blocks_{i}/attn/o_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.mlp\.fc([12])\.weight", "model/visual/blocks_{i}/fc{j}/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.mlp\.fc([12])\.bias", "model/visual/blocks_{i}/fc{j}/bias", t_id),
    (r"visual\.merger\.ln_q\.weight", "model/visual/ln_q/scale", t_id),
    (r"visual\.merger\.ln_q\.bias", "model/visual/ln_q/bias", t_id),
    (r"visual\.merger\.mlp\.0\.weight", "model/visual/merger_fc1/kernel", t_linear),
    (r"visual\.merger\.mlp\.0\.bias", "model/visual/merger_fc1/bias", t_id),
    (r"visual\.merger\.mlp\.2\.weight", "model/visual/merger_fc2/kernel", t_linear),
    (r"visual\.merger\.mlp\.2\.bias", "model/visual/merger_fc2/bias", t_id),
    # --- Qwen2 text decoder ---
    (r"language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"language_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/language_model/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (r"language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # --- retrieval head ---
    (r"custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
)


# ---------------------------------------------------------------------------
# Qwen3-VL family
# ---------------------------------------------------------------------------

QWEN3_VL_RULES: Tuple[_RuleT, ...] = (
    # --- vision tower ---
    (r"visual\.patch_embed\.proj\.weight", "model/visual/patch_embed/kernel", t_conv3d_patch),
    (r"visual\.patch_embed\.proj\.bias", "model/visual/patch_embed/bias", t_id),
    (r"visual\.pos_embed\.weight", "model/visual/pos_embed/embedding", t_id),
    (r"visual\.blocks\.(\d+)\.norm([12])\.weight", "model/visual/blocks_{i}/norm{j}/scale", t_id),
    (r"visual\.blocks\.(\d+)\.norm([12])\.bias", "model/visual/blocks_{i}/norm{j}/bias", t_id),
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.weight",
     "model/visual/blocks_{i}/attn/{j}_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.bias",
     "model/visual/blocks_{i}/attn/{j}_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.weight", "model/visual/blocks_{i}/attn/o_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.bias", "model/visual/blocks_{i}/attn/o_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.mlp\.linear_fc([12])\.weight",
     "model/visual/blocks_{i}/linear_fc{j}/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.mlp\.linear_fc([12])\.bias",
     "model/visual/blocks_{i}/linear_fc{j}/bias", t_id),
    (r"visual\.merger\.norm\.weight", "model/visual/merger/norm/scale", t_id),
    (r"visual\.merger\.norm\.bias", "model/visual/merger/norm/bias", t_id),
    (r"visual\.merger\.linear_fc([12])\.weight", "model/visual/merger/linear_fc{i}/kernel", t_linear),
    (r"visual\.merger\.linear_fc([12])\.bias", "model/visual/merger/linear_fc{i}/bias", t_id),
    (r"visual\.deepstack_merger_list\.(\d+)\.norm\.weight",
     "model/visual/deepstack_merger_{i}/norm/scale", t_id),
    (r"visual\.deepstack_merger_list\.(\d+)\.norm\.bias",
     "model/visual/deepstack_merger_{i}/norm/bias", t_id),
    (r"visual\.deepstack_merger_list\.(\d+)\.linear_fc([12])\.weight",
     "model/visual/deepstack_merger_{i}/linear_fc{j}/kernel", t_linear),
    (r"visual\.deepstack_merger_list\.(\d+)\.linear_fc([12])\.bias",
     "model/visual/deepstack_merger_{i}/linear_fc{j}/bias", t_id),
    # --- Qwen3 text decoder (q/k norms, no attn bias) ---
    (r"language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"language_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k)_norm\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_norm/weight", t_id),
    (r"language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # --- retrieval head ---
    (r"custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
)


def load_colqwen3_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Qwen3-VL HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_qkv(normalize_keys(state, QWEN2_VL_KEY_REMAPS))
    return convert_state_dict(state, QWEN3_VL_RULES, (), strict=strict)


# ---------------------------------------------------------------------------
# Qwen2.5-Omni family (thinker = audio tower + qwen2.5 vision + qwen2 text)
# ---------------------------------------------------------------------------


def t_conv1d(w: Any) -> np.ndarray:
    """torch Conv1d weight (O, I, k) -> flax kernel (k, I, O)."""
    return _np(w).transpose(2, 1, 0)


OMNI_AUDIO_RULES: Tuple[_RuleT, ...] = (
    (r"(?:audio_tower\.)?conv1\.weight", "conv1/kernel", t_conv1d),
    (r"(?:audio_tower\.)?conv1\.bias", "conv1/bias", t_id),
    (r"(?:audio_tower\.)?conv2\.weight", "conv2/kernel", t_conv1d),
    (r"(?:audio_tower\.)?conv2\.bias", "conv2/bias", t_id),
    (r"(?:audio_tower\.)?layers\.(\d+)\.self_attn\.(q|k|v)_proj\.weight",
     "layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"(?:audio_tower\.)?layers\.(\d+)\.self_attn\.(q|v)_proj\.bias",
     "layers_{i}/self_attn/{j}_proj/bias", t_id),
    (r"(?:audio_tower\.)?layers\.(\d+)\.self_attn\.out_proj\.weight",
     "layers_{i}/self_attn/o_proj/kernel", t_linear),
    (r"(?:audio_tower\.)?layers\.(\d+)\.self_attn\.out_proj\.bias",
     "layers_{i}/self_attn/o_proj/bias", t_id),
    (r"(?:audio_tower\.)?layers\.(\d+)\.(self_attn_layer_norm|final_layer_norm)\.weight",
     "layers_{i}/{j}/scale", t_id),
    (r"(?:audio_tower\.)?layers\.(\d+)\.(self_attn_layer_norm|final_layer_norm)\.bias",
     "layers_{i}/{j}/bias", t_id),
    (r"(?:audio_tower\.)?layers\.(\d+)\.fc([12])\.weight", "layers_{i}/fc{j}/kernel", t_linear),
    (r"(?:audio_tower\.)?layers\.(\d+)\.fc([12])\.bias", "layers_{i}/fc{j}/bias", t_id),
    (r"(?:audio_tower\.)?ln_post\.weight", "ln_post/scale", t_id),
    (r"(?:audio_tower\.)?ln_post\.bias", "ln_post/bias", t_id),
    (r"(?:audio_tower\.)?proj\.weight", "proj/kernel", t_linear),
    (r"(?:audio_tower\.)?proj\.bias", "proj/bias", t_id),
    # generation-only artifacts
    (r"(?:audio_tower\.)?audio_bos_eos_token\.weight", "", t_id),
    (r"(?:audio_tower\.)?positional_embedding\.positional_embedding", "", t_id),
)


# ---------------------------------------------------------------------------
# Idefics3 / SmolVLM family
# ---------------------------------------------------------------------------

IDEFICS3_KEY_REMAPS: Tuple[Tuple[str, str], ...] = (
    (r"^base_model\.model\.", ""),
    (r"^model\.", ""),
    (r"\.lora_[AB]\.", ".__lora__."),
)

_I3_VT = r"vision_model"

IDEFICS3_RULES: Tuple[_RuleT, ...] = (
    (_I3_VT + r"\.embeddings\.patch_embedding\.weight", "model/vision_model/patch_embedding/kernel", t_conv2d),
    (_I3_VT + r"\.embeddings\.patch_embedding\.bias", "model/vision_model/patch_embedding/bias", t_id),
    (_I3_VT + r"\.embeddings\.position_embedding\.weight",
     "model/vision_model/position_embedding/embedding", t_id),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.layer_norm([12])\.weight",
     "model/vision_model/layers_{i}/layer_norm{j}/scale", t_id),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.layer_norm([12])\.bias",
     "model/vision_model/layers_{i}/layer_norm{j}/bias", t_id),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.weight",
     "model/vision_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/vision_model/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight",
     "model/vision_model/layers_{i}/self_attn/o_proj/kernel", t_linear),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias",
     "model/vision_model/layers_{i}/self_attn/o_proj/bias", t_id),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.weight",
     "model/vision_model/layers_{i}/mlp/fc{j}/kernel", t_linear),
    (_I3_VT + r"\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.bias",
     "model/vision_model/layers_{i}/mlp/fc{j}/bias", t_id),
    (_I3_VT + r"\.post_layernorm\.weight", "model/vision_model/post_layernorm/scale", t_id),
    (_I3_VT + r"\.post_layernorm\.bias", "model/vision_model/post_layernorm/bias", t_id),
    # --- connector ---
    (r"connector\.modality_projection\.proj\.weight", "model/modality_projection/kernel", t_linear),
    # --- Llama/SmolLM text decoder ---
    (r"text_model\.embed_tokens\.weight", "model/text_model/embed_tokens/embedding", t_id),
    (r"text_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/text_model/layers_{i}/{j}/weight", t_id),
    (r"text_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/text_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"text_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/text_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"text_model\.norm\.weight", "model/text_model/norm/weight", t_id),
    # --- retrieval head (named `linear` in ColIdefics3) ---
    (r"linear\.weight", "head/linear/kernel", t_linear),
    (r"linear\.bias", "head/linear/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
)


def load_colidefics3_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Idefics3/SmolVLM HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    return convert_state_dict(state, IDEFICS3_RULES, IDEFICS3_KEY_REMAPS, strict=strict)


# ---------------------------------------------------------------------------
# Gemma3 family
# ---------------------------------------------------------------------------

GEMMA3_KEY_REMAPS: Tuple[Tuple[str, str], ...] = (
    (r"^base_model\.model\.", ""),
    (r"^model\.", ""),  # ColGemma3 wraps Gemma3Model under .model in some exports
    (r"^language_model\.model\.", "language_model."),  # HF _checkpoint_conversion_mapping
    (r"\.lora_[AB]\.", ".__lora__."),
)

_G3_VT = r"vision_tower\.vision_model"

GEMMA3_RULES: Tuple[_RuleT, ...] = (
    # --- SigLIP vision tower (same layout as PaliGemma's) ---
    (_G3_VT + r"\.embeddings\.patch_embedding\.weight", "model/vision_tower/patch_embedding/kernel", t_conv2d),
    (_G3_VT + r"\.embeddings\.patch_embedding\.bias", "model/vision_tower/patch_embedding/bias", t_id),
    (_G3_VT + r"\.embeddings\.position_embedding\.weight",
     "model/vision_tower/position_embedding/embedding", t_id),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.layer_norm([12])\.weight",
     "model/vision_tower/layers_{i}/layer_norm{j}/scale", t_id),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.layer_norm([12])\.bias",
     "model/vision_tower/layers_{i}/layer_norm{j}/bias", t_id),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.weight",
     "model/vision_tower/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/vision_tower/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight",
     "model/vision_tower/layers_{i}/self_attn/o_proj/kernel", t_linear),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias",
     "model/vision_tower/layers_{i}/self_attn/o_proj/bias", t_id),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.weight",
     "model/vision_tower/layers_{i}/mlp/fc{j}/kernel", t_linear),
    (_G3_VT + r"\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.bias",
     "model/vision_tower/layers_{i}/mlp/fc{j}/bias", t_id),
    (_G3_VT + r"\.post_layernorm\.weight", "model/vision_tower/post_layernorm/scale", t_id),
    (_G3_VT + r"\.post_layernorm\.bias", "model/vision_tower/post_layernorm/bias", t_id),
    (_G3_VT + r"\.head\..*", "", t_id),
    # --- projector ---
    (r"multi_modal_projector\.mm_input_projection_weight", "model/mm_input_projection", t_id),
    (r"multi_modal_projector\.mm_soft_emb_norm\.weight", "model/mm_soft_emb_norm/weight", t_id),
    # --- Gemma3 text decoder ---
    (r"language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"language_model\.layers\.(\d+)\."
     r"(input_layernorm|post_attention_layernorm|pre_feedforward_layernorm|post_feedforward_layernorm)"
     r"\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k)_norm\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_norm/weight", t_id),
    (r"language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # --- retrieval head ---
    (r"custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
)


def load_colgemma3_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Gemma3 HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    return convert_state_dict(state, GEMMA3_RULES, GEMMA3_KEY_REMAPS, strict=strict)


QWEN25_VL_RULES: Tuple[_RuleT, ...] = (
    # --- vision tower (RMSNorm blocks, biased SwiGLU, RMSNorm ln_q) ---
    (r"visual\.patch_embed\.proj\.weight", "model/visual/patch_embed/kernel", t_conv3d_patch),
    (r"visual\.blocks\.(\d+)\.norm([12])\.weight", "model/visual/blocks_{i}/norm{j}/weight", t_id),
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.weight",
     "model/visual/blocks_{i}/attn/{j}_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.(q|k|v)_proj\.bias",
     "model/visual/blocks_{i}/attn/{j}_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.weight", "model/visual/blocks_{i}/attn/o_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.attn\.proj\.bias", "model/visual/blocks_{i}/attn/o_proj/bias", t_id),
    (r"visual\.blocks\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/visual/blocks_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"visual\.blocks\.(\d+)\.mlp\.(gate|up|down)_proj\.bias",
     "model/visual/blocks_{i}/mlp/{j}_proj/bias", t_id),
    (r"visual\.merger\.ln_q\.weight", "model/visual/ln_q/weight", t_id),
    (r"visual\.merger\.mlp\.0\.weight", "model/visual/merger_fc1/kernel", t_linear),
    (r"visual\.merger\.mlp\.0\.bias", "model/visual/merger_fc1/bias", t_id),
    (r"visual\.merger\.mlp\.2\.weight", "model/visual/merger_fc2/kernel", t_linear),
    (r"visual\.merger\.mlp\.2\.bias", "model/visual/merger_fc2/bias", t_id),
    # --- Qwen2 text decoder (same as qwen2_vl) ---
    (r"language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"language_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/language_model/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (r"language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    (r"language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # --- retrieval head ---
    (r"custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # --- dropped ---
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
)


def load_colqwen25_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Qwen2.5-VL HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_qkv(normalize_keys(state, QWEN2_VL_KEY_REMAPS))
    return convert_state_dict(state, QWEN25_VL_RULES, (), strict=strict)


OMNI_KEY_REMAPS: Tuple[Tuple[str, str], ...] = (
    (r"^base_model\.model\.", ""),  # merged-LoRA exports
    (r"^thinker\.", ""),  # full Omni checkpoints carry the talker too
    (r"^model\.audio_tower\.", "audio_tower."),
    (r"^model\.visual\.", "visual."),
    (r"^model\.language_model\.", "language_model."),
    (r"^model\.", "language_model."),  # thinker decoder (layers/embed/norm)
    # Omni vision attention is unfused q/k/v without the _proj suffix
    (r"\.attn\.(q|k|v)\.(weight|bias)$", r".attn.\1_proj.\2"),
    (r"\.lora_[AB]\.", ".__lora__."),
)

# Thinker = audio tower + Qwen2.5 vision tower + Qwen2 text decoder: compose
# the audio rules (re-rooted under the backbone scope) with the Qwen2.5-VL
# rules, which already cover visual/language_model/custom_text_proj. Full
# Omni checkpoints also ship the speech-generation stack — dropped (the
# retriever uses the thinker only, modeling_colqwen_omni.py:10).
OMNI_RULES: Tuple[_RuleT, ...] = (
    (r"talker\..*", "", t_id),
    (r"token2wav\..*", "", t_id),
    (r"speaker_dict.*", "", t_id),
) + tuple(
    (pattern, f"model/audio_tower/{template}" if template else "", transform)
    for pattern, template, transform in OMNI_AUDIO_RULES
) + QWEN25_VL_RULES


def load_colqwen_omni_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Qwen2.5-Omni thinker HF checkpoint into flax params
    (reference wraps Qwen2_5OmniThinkerForConditionalGeneration,
    modeling_colqwen_omni.py:10-30; talker/token2wav weights are dropped)."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_qkv(normalize_keys(state, OMNI_KEY_REMAPS))
    return convert_state_dict(state, OMNI_RULES, (), strict=strict)


def split_fused_qkv(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Split HF's fused vision ``attn.qkv`` (3E, E) into q/k/v projections."""
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        m = re.fullmatch(r"(.*\.attn)\.qkv\.(weight|bias)", key)
        if m is None:
            out[key] = value
            continue
        arr = _np(value)
        q, k, v = np.split(arr, 3, axis=0)
        for name, part in (("q", q), ("k", k), ("v", v)):
            out[f"{m.group(1)}.{name}_proj.{m.group(2)}"] = part
    return out


def split_fused_wqkv(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Split ModernBERT's fused ``attn.Wqkv`` (3E, E) into q/k/v projections."""
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        m = re.fullmatch(r"(.*\.attn)\.Wqkv\.(weight|bias)", key)
        if m is None:
            out[key] = value
            continue
        arr = _np(value)
        q, k, v = np.split(arr, 3, axis=0)
        for name, part in (("q", q), ("k", k), ("v", v)):
            out[f"{m.group(1)}.{name}_proj.{m.group(2)}"] = part
    return out


def load_colqwen2_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Qwen2-VL HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_qkv(normalize_keys(state, QWEN2_VL_KEY_REMAPS))
    return convert_state_dict(state, QWEN2_VL_RULES, (), strict=strict)


def convert_state_dict(
    state_dict: Mapping[str, Any],
    rules: Tuple[_RuleT, ...],
    remaps: Tuple[Tuple[str, str], ...] = (),
    strict: bool = True,
) -> Dict[str, Any]:
    """Translate a torch state dict into a nested flax param dict."""
    normalized = normalize_keys(state_dict, remaps)
    params: Dict[str, Any] = {}
    unmatched = []
    for key, value in normalized.items():
        for pattern, template, transform in rules:
            m = re.fullmatch(pattern, key)
            if m is None:
                continue
            if template == "":
                break  # intentionally dropped
            groups = m.groups()
            path = template
            if groups:
                path = path.replace("{i}", groups[0])
                if len(groups) > 1:
                    path = path.replace("{j}", groups[1])
            node = params
            parts = path.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(transform(value))
            break
        else:
            unmatched.append(key)
    if unmatched and strict:
        raise ValueError(f"Unmatched checkpoint keys ({len(unmatched)}): {unmatched[:10]} ...")
    return params


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a checkpoint directory."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"No .safetensors files in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def load_hf_config(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    # record the source dir so composite configs that point at sibling
    # backbone config dirs by RELATIVE path (ModernVBert's
    # vision_model_name/text_model_name) can resolve them
    cfg.setdefault("_checkpoint_dir", os.path.abspath(path))
    return cfg


def load_colpali_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)PaliGemma HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    return convert_state_dict(state, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS, strict=strict)


def stack_layer_params(
    params: Dict[str, Any],
    stack_names: Tuple[str, ...] = ("layers", "blocks"),
) -> Dict[str, Any]:
    """Convert unrolled ``layers_{i}/...`` subtrees into the scanned layout
    ``layers/layer/...`` with a stacked leading axis (for models built with
    ``scan_layers=True``). Recurses over the whole tree; idempotent on trees
    without numbered layers."""
    import re as _re

    if not isinstance(params, dict):
        return params

    out: Dict[str, Any] = {}
    numbered: Dict[str, Dict[int, Any]] = {}
    for key, value in params.items():
        m = _re.fullmatch(r"(" + "|".join(stack_names) + r")_(\d+)", key)
        if m is not None:
            numbered.setdefault(m.group(1), {})[int(m.group(2))] = value
        else:
            out[key] = stack_layer_params(value, stack_names)

    for base, by_idx in numbered.items():
        layers = [stack_layer_params(by_idx[i], stack_names) for i in range(len(by_idx))]
        leaves_per_layer = [jax.tree_util.tree_leaves_with_path(layer) for layer in layers]
        stacked: Dict[str, Any] = {}
        for leaf_idx, (path_tuple, _first) in enumerate(leaves_per_layer[0]):
            arrs = [lpl[leaf_idx][1] for lpl in leaves_per_layer]
            node = stacked
            parts = [str(getattr(k, "key", k)) for k in path_tuple]
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.stack(arrs, axis=0)
        out[base] = {"layer": stacked}
    return out


def group_hybrid_params(params: Dict[str, Any], interval: int) -> Dict[str, Any]:
    """Convert unrolled ``layers_{i}`` subtrees into the grouped-scan layout
    ``layers/layer/sub_{i % interval}/...`` with a leading stacked group axis
    (for ``HybridDecoder(scan_layers=True)`` — the Qwen3.5 hybrid stack scans
    over one period of its linear/full-attention pattern at a time, since the
    per-layer param trees differ within a period but repeat across periods).
    Recurses over the whole tree; idempotent on trees without numbered
    layers."""
    if not isinstance(params, dict):
        return params

    out: Dict[str, Any] = {}
    numbered: Dict[int, Any] = {}
    for key, value in params.items():
        m = re.fullmatch(r"layers_(\d+)", key)
        if m is not None:
            numbered[int(m.group(1))] = value
        else:
            out[key] = group_hybrid_params(value, interval)
    if numbered:
        n = len(numbered)
        if n % interval:
            raise ValueError(f"{n} layers not divisible by interval {interval}")
        groups = [
            {f"sub_{j}": numbered[g * interval + j] for j in range(interval)}
            for g in range(n // interval)
        ]
        leaves_per_group = [jax.tree_util.tree_leaves_with_path(g) for g in groups]
        stacked: Dict[str, Any] = {}
        for leaf_idx, (path_tuple, _first) in enumerate(leaves_per_group[0]):
            arrs = [lpg[leaf_idx][1] for lpg in leaves_per_group]
            node = stacked
            parts = [str(getattr(k, "key", k)) for k in path_tuple]
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.stack(arrs, axis=0)
        out["layers"] = {"layer": stacked}
    return out


# ---------------------------------------------------------------------------
# ModernVBERT family
# ---------------------------------------------------------------------------

_MVB_VISION = r"model\.vision_model\."
MODERNVBERT_RULES: Tuple[_RuleT, ...] = (
    # --- SigLIP vision tower (reference strips the SiglipModel wrapper:
    # modeling_modernvbert.py:249-258, so keys start at model.vision_model) ---
    (_MVB_VISION + r"embeddings\.patch_embedding\.weight",
     "model/vision_model/patch_embedding/kernel", t_conv2d),
    (_MVB_VISION + r"embeddings\.patch_embedding\.bias",
     "model/vision_model/patch_embedding/bias", t_id),
    (_MVB_VISION + r"embeddings\.position_embedding\.weight",
     "model/vision_model/position_embedding/embedding", t_id),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.layer_norm([12])\.weight",
     "model/vision_model/layers_{i}/layer_norm{j}/scale", t_id),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.layer_norm([12])\.bias",
     "model/vision_model/layers_{i}/layer_norm{j}/bias", t_id),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.weight",
     "model/vision_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.self_attn\.(q|k|v)_proj\.bias",
     "model/vision_model/layers_{i}/self_attn/{j}_proj/bias", t_id),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight",
     "model/vision_model/layers_{i}/self_attn/o_proj/kernel", t_linear),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias",
     "model/vision_model/layers_{i}/self_attn/o_proj/bias", t_id),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.mlp\.fc([12])\.weight",
     "model/vision_model/layers_{i}/mlp/fc{j}/kernel", t_linear),
    (_MVB_VISION + r"encoder\.layers\.(\d+)\.mlp\.fc([12])\.bias",
     "model/vision_model/layers_{i}/mlp/fc{j}/bias", t_id),
    (_MVB_VISION + r"post_layernorm\.weight", "model/vision_model/post_layernorm/scale", t_id),
    (_MVB_VISION + r"post_layernorm\.bias", "model/vision_model/post_layernorm/bias", t_id),
    (_MVB_VISION + r"head\..*", "", t_id),  # unused SigLIP pooling head
    # --- connector (pixel shuffle + projection, :183-210) ---
    (r"model\.connector\.modality_projection\.proj\.weight",
     "model/modality_projection/kernel", t_linear),
    # --- decoupled embeddings (:17-104; attached at text_model embeddings) ---
    (r"model\.text_model\.embeddings\.tok_embeddings\.weight",
     "model/embeddings/tok_embeddings/embedding", t_id),
    (r"model\.text_model\.embeddings\.tok_embeddings\.additional_embedding\.weight",
     "model/embeddings/additional_embedding/embedding", t_id),
    (r"model\.text_model\.embeddings\.norm\.weight", "model/text_model/emb_norm/scale", t_id),
    # --- ModernBERT encoder (HF modeling_modernbert.py; Wqkv pre-split) ---
    (r"model\.text_model\.layers\.(\d+)\.attn\.(q|k|v)_proj\.weight",
     "model/text_model/layers_{i}/attn/{j}_proj/kernel", t_linear),
    (r"model\.text_model\.layers\.(\d+)\.attn\.Wo\.weight",
     "model/text_model/layers_{i}/attn/o_proj/kernel", t_linear),
    (r"model\.text_model\.layers\.(\d+)\.attn_norm\.weight",
     "model/text_model/layers_{i}/attn_norm/scale", t_id),
    (r"model\.text_model\.layers\.(\d+)\.mlp_norm\.weight",
     "model/text_model/layers_{i}/mlp_norm/scale", t_id),
    (r"model\.text_model\.layers\.(\d+)\.mlp\.W([io])\.weight",
     "model/text_model/layers_{i}/W{j}/kernel", t_linear),
    (r"model\.text_model\.final_norm\.weight", "model/text_model/final_norm/scale", t_id),
    # --- retrieval head ---
    (r"(?:model\.)?custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"(?:model\.)?custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
)


def load_colmodernvbert_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)ModernVBert HF checkpoint directory into flax params.

    Synthesizes ``layers_0/attn_norm/scale = ones`` — HF layer 0 uses
    nn.Identity there; our uniform (scannable) layer keeps the param and
    selects its output away (models/modernvbert.py::ModernBertLayer)."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_wqkv(normalize_keys(state, PALIGEMMA_KEY_REMAPS))
    params = convert_state_dict(state, MODERNVBERT_RULES, (), strict=strict)
    layers = params.get("model", {}).get("text_model", {})
    if "layers_0" in layers and "attn_norm" not in layers["layers_0"]:
        hidden = layers["layers_0"]["mlp_norm"]["scale"].shape[0]
        layers["layers_0"]["attn_norm"] = {"scale": np.ones(hidden, np.float32)}
    return params


# ---------------------------------------------------------------------------
# Qwen3.5 / Qwen3-Next hybrid family
# ---------------------------------------------------------------------------

def t_conv1d_depthwise(w: Any) -> np.ndarray:
    """torch depthwise Conv1d weight (C, 1, K) -> our kernel (K, C)."""
    return _np(w)[:, 0, :].T


QWEN35_RULES: Tuple[_RuleT, ...] = (
    (r"language_model\.embed_tokens\.weight", "model/language_model/embed_tokens/embedding", t_id),
    (r"language_model\.layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight",
     "model/language_model/layers_{i}/{j}/weight", t_id),
    # gated full-attention layers
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k|v|o)_proj\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_proj/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.self_attn\.(q|k)_norm\.weight",
     "model/language_model/layers_{i}/self_attn/{j}_norm/weight", t_id),
    # GatedDeltaNet linear-attention layers
    (r"language_model\.layers\.(\d+)\.linear_attn\.in_proj_(qkvz|ba)\.weight",
     "model/language_model/layers_{i}/linear_attn/in_proj_{j}/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.linear_attn\.conv1d\.weight",
     "model/language_model/layers_{i}/linear_attn/conv1d_kernel", t_conv1d_depthwise),
    (r"language_model\.layers\.(\d+)\.linear_attn\.A_log",
     "model/language_model/layers_{i}/linear_attn/A_log", t_id),
    (r"language_model\.layers\.(\d+)\.linear_attn\.dt_bias",
     "model/language_model/layers_{i}/linear_attn/dt_bias", t_id),
    (r"language_model\.layers\.(\d+)\.linear_attn\.norm\.weight",
     "model/language_model/layers_{i}/linear_attn/norm_weight", t_id),
    (r"language_model\.layers\.(\d+)\.linear_attn\.out_proj\.weight",
     "model/language_model/layers_{i}/linear_attn/out_proj/kernel", t_linear),
    # dense MLPs
    (r"language_model\.layers\.(\d+)\.mlp\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/{j}_proj/kernel", t_linear),
    # MoE MLPs (router + experts + shared expert)
    (r"language_model\.layers\.(\d+)\.mlp\.gate\.weight",
     "model/language_model/layers_{i}/mlp/gate/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.mlp\.shared_expert_gate\.weight",
     "model/language_model/layers_{i}/mlp/shared_expert_gate/kernel", t_linear),
    (r"language_model\.layers\.(\d+)\.mlp\.shared_expert\.(gate|up|down)_proj\.weight",
     "model/language_model/layers_{i}/mlp/shared_expert/{j}_proj/kernel", t_linear),
    # stacked (E, d_in, d_out) expert arrays: populated by stack_expert_weights
    # at load (never matched by raw checkpoint keys); the EXPORT direction
    # renders them so hf_export.unstack_expert_weights can split per expert
    (r"language_model\.layers\.(\d+)\.mlp\.experts\.(gate|up|down)_proj",
     "model/language_model/layers_{i}/mlp/experts/{j}_proj", t_id),
    (r"language_model\.norm\.weight", "model/language_model/norm/weight", t_id),
    # retrieval head
    (r"custom_text_proj\.weight", "head/custom_text_proj/kernel", t_linear),
    (r"custom_text_proj\.bias", "head/custom_text_proj/bias", t_id),
    # dropped
    (r"lm_head\.weight", "", t_id),
    (r".*rotary_emb\.inv_freq", "", t_id),
) + tuple(
    # vision tower: same layout as Qwen3-VL
    rule for rule in QWEN3_VL_RULES if rule[0].startswith(r"visual\.")
)


def stack_expert_weights(state: Mapping[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Pop per-expert ``...mlp.experts.N.{gate,up,down}_proj.weight`` entries
    and stack them into the (E, d_in, d_out) arrays StackedExperts expects
    (models/qwen3_5.py). Returns (remaining_state, flax_updates) where
    flax_updates maps path tuples like
    ``("model", "language_model", "layers_0", "mlp", "experts", "gate_proj")``
    to stacked arrays."""
    pat = re.compile(r"language_model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight")
    groups: Dict[Tuple[int, str], Dict[int, Any]] = {}
    rest: Dict[str, Any] = {}
    for key, value in state.items():
        m = pat.fullmatch(key)
        if m is None:
            rest[key] = value
        else:
            groups.setdefault((int(m.group(1)), m.group(3)), {})[int(m.group(2))] = value
    updates: Dict[Tuple[str, ...], Any] = {}
    for (layer, proj), by_e in groups.items():
        stacked = np.stack([_np(by_e[e]).T for e in range(len(by_e))])  # (E, d_in, d_out)
        updates[
            ("model", "language_model", f"layers_{layer}", "mlp", "experts", f"{proj}_proj")
        ] = stacked
    return rest, updates


def load_colqwen35_params(checkpoint_dir: str, strict: bool = True) -> Dict[str, Any]:
    """Load a (Col)Qwen3.5 HF checkpoint directory into flax params."""
    state = load_safetensors_dir(checkpoint_dir)
    state = split_fused_qkv(normalize_keys(state, QWEN2_VL_KEY_REMAPS))
    state, expert_updates = stack_expert_weights(state)
    params = convert_state_dict(state, QWEN35_RULES, (), strict=strict)
    for path, value in expert_updates.items():
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return params
