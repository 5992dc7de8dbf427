"""Checkpoint key-remap regression tests.

Mirror of the reference's dedicated mapping test file
(tests/models/test_checkpoint_key_mappings.py): pin that merged-LoRA
exports (``base_model.model.*``), transformers-v5 layout shifts
(``model.layers`` vs ``language_model.layers``), and unmerged LoRA factor
keys normalize the way the loaders expect — so checkpoint-layout drift
breaks loudly here instead of as silent weight mismatches."""

import numpy as np

from colpali_tpu.core.hf_loader import (
    PALIGEMMA_KEY_REMAPS,
    QWEN2_VL_KEY_REMAPS,
    normalize_keys,
)


def _remap_one(key: str, remaps) -> list:
    return list(normalize_keys({key: np.zeros(1)}, remaps))


class TestQwenKeyRemaps:
    def test_lora_export_prefix_stripped(self):
        assert _remap_one(
            "base_model.model.custom_text_proj.weight", QWEN2_VL_KEY_REMAPS
        ) == ["custom_text_proj.weight"]

    def test_v5_text_layers_remap(self):
        """reference _checkpoint_conversion_mapping (modeling_colqwen2.py:21-24)."""
        assert _remap_one(
            "model.layers.17.self_attn.v_proj.weight", QWEN2_VL_KEY_REMAPS
        ) == ["language_model.layers.17.self_attn.v_proj.weight"]

    def test_lora_plus_layers_compose(self):
        assert _remap_one(
            "base_model.model.model.layers.3.mlp.down_proj.weight", QWEN2_VL_KEY_REMAPS
        ) == ["language_model.layers.3.mlp.down_proj.weight"]

    def test_visual_prefix(self):
        assert _remap_one("model.visual.blocks.0.norm1.weight", QWEN2_VL_KEY_REMAPS) == [
            "visual.blocks.0.norm1.weight"
        ]

    def test_unmerged_lora_factors_dropped(self):
        assert _remap_one(
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.default.weight",
            QWEN2_VL_KEY_REMAPS,
        ) == []


class TestPaliGemmaKeyRemaps:
    def test_lora_export_prefix_stripped(self):
        assert _remap_one(
            "base_model.model.custom_text_proj.weight", PALIGEMMA_KEY_REMAPS
        ) == ["custom_text_proj.weight"]

    def test_pre_v5_nested_language_model(self):
        assert _remap_one(
            "model.language_model.model.layers.0.mlp.gate_proj.weight", PALIGEMMA_KEY_REMAPS
        ) == ["model.language_model.layers.0.mlp.gate_proj.weight"]

    def test_bare_language_model_layout(self):
        assert _remap_one(
            "language_model.model.layers.1.self_attn.q_proj.weight", PALIGEMMA_KEY_REMAPS
        ) == ["model.language_model.layers.1.self_attn.q_proj.weight"]

    def test_bare_vision_tower_layout(self):
        assert _remap_one(
            "vision_tower.vision_model.post_layernorm.weight", PALIGEMMA_KEY_REMAPS
        ) == ["model.vision_tower.vision_model.post_layernorm.weight"]

    def test_unmerged_lora_factors_dropped(self):
        assert _remap_one(
            "base_model.model.custom_text_proj.lora_B.default.weight", PALIGEMMA_KEY_REMAPS
        ) == []
