"""Checkpoint-gate support for the six families beyond validate_checkpoint's
original three (colidefics3/colqwen2/colpali): synthetic tiny-dims HF-layout
checkpoint generators + in-env torch oracles + per-family input-feed
adapters.

Each synth checkpoint is generated through the PRODUCTION export path
(core.hf_export round-trips the loader rules) so safetensors keys/shapes are
exactly what the family loader consumes, plus config.json / tokenizer /
preprocessor files the auto-loader and processor bootstrap from. Each oracle
reconstructs the reference architecture from in-env transformers classes
(identical math to the reference modeling files cited per family) and loads
the SAME safetensors.

Oracle contract: ``build_oracle(family, ckpt) -> (torch_module, feed_fn)``
where ``feed_fn(batch_of_numpy) -> dict[str, torch.Tensor]`` adapts the
flax processor's batch layout to the torch module's signature. The module's
forward returns L2-normalized, attention-masked multi-vector embeddings —
the same contract validate_checkpoint._embed_torch expects.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _vc():
    """Shared helpers from validate_checkpoint (word tokenizers, page maker).

    Lazy to avoid import cycles: validate_checkpoint imports this module at
    dispatch time; we only need its helpers inside maker functions.
    """
    import validate_checkpoint

    return validate_checkpoint


def _save_safetensors(out_dir: str, state: Dict[str, np.ndarray]) -> int:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              os.path.join(out_dir, "model.safetensors"), metadata={"format": "pt"})
    return sum(v.size for v in state.values())


def _write_json(out_dir: str, name: str, obj: dict) -> None:
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(obj, f)


# --------------------------------------------------------------------------
# ColQwen2.5 — windowed vision attention
# (reference models/qwen2_5/colqwen2_5/modeling_colqwen2_5.py:8-88)
# --------------------------------------------------------------------------

# shared tiny Qwen2-style text decoder dims (head_dim MUST be hidden//heads:
# the HF text configs rebuild heads from the ratio)
_QWEN_TEXT = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                  num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                  head_dim=12, rope_theta=1e6, rms_norm_eps=1e-6)


def make_synth_colqwen25(out_dir: str, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colqwen25_state_dict
    from colpali_tpu.models.qwen2_5_vl import ColQwen2_5, Qwen25VLConfig, Qwen25VLVisionConfig
    from colpali_tpu.models.qwen2_vl import Qwen2TextConfig

    os.makedirs(out_dir, exist_ok=True)
    # window_size=56px -> 56/2/14 = 2 merged units per window side; block 0
    # windowed, block 1 full attention — both mask flavors exercised
    vision = dict(depth=2, hidden_size=64, num_heads=4, intermediate_size=128,
                  out_hidden_size=48, patch_size=14, temporal_patch_size=2,
                  spatial_merge_size=2, window_size=56, fullatt_block_indexes=(1,),
                  in_channels=3, hidden_act="silu")
    text = dict(_QWEN_TEXT, mrope_section=(2, 2, 2), attention_bias=True)
    config = Qwen25VLConfig(
        vision=Qwen25VLVisionConfig(**vision),
        text=Qwen2TextConfig(**text),
        image_token_id=5, vision_start_token_id=3, video_token_id=6,
    )
    model = ColQwen2_5(config, dim=128, dtype=jnp.float32, param_dtype=jnp.float32)
    s = 8
    ids = np.full((1, s), 10, np.int32)
    ids[:, 1:5] = config.image_token_id
    params = model.init(
        jax.random.PRNGKey(seed),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, s), jnp.int32),
        pixel_values=jnp.zeros((1, 16, config.vision.patch_dim), jnp.float32),
        vision_hpos=jnp.asarray((np.arange(16) // 4)[None].astype(np.int32)),
        vision_wpos=jnp.asarray((np.arange(16) % 4)[None].astype(np.int32)),
        patch_mask=jnp.ones((1, 16), bool),
        window_id=jnp.zeros((1, 16), jnp.int32),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, 1, 1)).astype(np.int64)),
    )["params"]
    state = export_colqwen25_state_dict(jax.device_get(params))
    n = _save_safetensors(out_dir, state)
    _write_json(out_dir, "config.json", {
        "model_type": "qwen2_5_vl", "architectures": ["ColQwen2_5"],
        "vision_config": {**vision, "fullatt_block_indexes": [1]},
        **{k: v for k, v in text.items() if k not in ("mrope_section", "head_dim")},
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 2, 2]},
        "image_token_id": 5, "vision_start_token_id": 3, "video_token_id": 6,
        "vision_end_token_id": 4,
    })
    _write_json(out_dir, "preprocessor_config.json", {
        "patch_size": 14, "merge_size": 2, "temporal_patch_size": 2,
        "size": {"shortest_edge": 56 * 56, "longest_edge": 64 * 28 * 28},
        "image_mean": [0.48145466, 0.4578275, 0.40821073],
        "image_std": [0.26862954, 0.26130258, 0.27577711],
    })
    _vc()._save_qwen2_word_tokenizer(out_dir)
    print(f"synthetic ColQwen2.5 checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _oracle_colqwen25(ckpt: str):
    import torch
    import transformers

    cfg = transformers.Qwen2_5_VLConfig.from_pretrained(ckpt)

    class TorchColQwen2_5(torch.nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            self.model = transformers.Qwen2_5_VLModel(cfg)
            self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 128)

        def forward(self, input_ids=None, attention_mask=None,
                    pixel_values=None, image_grid_thw=None, **_):
            hidden = self.model(
                input_ids=input_ids, attention_mask=attention_mask,
                pixel_values=pixel_values, image_grid_thw=image_grid_thw,
            ).last_hidden_state
            proj = self.custom_text_proj(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColQwen2_5().eval()
    _strict_load(model, ckpt)
    return model, _feed_qwen_grid


def _strict_load(model, ckpt: str, drop_substrings=("rotary_emb", "lm_head"),
                 rekey=None) -> None:
    import torch  # noqa: F401
    from safetensors.torch import load_file

    state = {}
    for fn in os.listdir(ckpt):
        if fn.endswith(".safetensors"):
            state.update(load_file(os.path.join(ckpt, fn)))
    if rekey is not None:
        state = rekey(state)
    missing, unexpected = model.load_state_dict(state, strict=False)
    real_missing = [k for k in missing if not any(s in k for s in drop_substrings)]
    real_unexpected = [k for k in unexpected if not any(s in k for s in drop_substrings)]
    if real_missing or real_unexpected:
        raise SystemExit(
            f"oracle load mismatch: missing={real_missing[:5]} unexpected={real_unexpected[:5]}")


def _feed_qwen_grid(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Qwen-VL dynamic resolution: torch takes CONCATENATED unpadded patches
    + grids and computes rope/window/pos-embed indices internally."""
    import torch

    if "pixel_values" not in batch:
        return _feed_text_only(batch)
    pv = np.asarray(batch["pixel_values"])
    pm = np.asarray(batch["patch_mask"]).astype(bool)
    flat = np.concatenate([pv[i][pm[i]] for i in range(pv.shape[0])])
    return {
        "input_ids": torch.tensor(np.asarray(batch["input_ids"])),
        "attention_mask": torch.tensor(np.asarray(batch["attention_mask"])),
        "pixel_values": torch.tensor(flat, dtype=torch.float32),
        "image_grid_thw": torch.tensor(np.asarray(batch["image_grid_thw"])),
    }


def _feed_text_only(batch: Dict[str, Any]) -> Dict[str, Any]:
    import torch

    return {
        "input_ids": torch.tensor(np.asarray(batch["input_ids"])),
        "attention_mask": torch.tensor(np.asarray(batch["attention_mask"])),
    }


# --------------------------------------------------------------------------
# ColQwen3 — deepstack + interleaved M-RoPE, 320-d head
# (reference models/qwen3/colqwen3/modeling_colqwen3.py:10-117)
# --------------------------------------------------------------------------

def make_synth_colqwen3(out_dir: str, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colqwen3_state_dict
    from colpali_tpu.models.qwen3_vl import ColQwen3, Qwen3VLConfig

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
                  out_hidden_size=48, patch_size=14, temporal_patch_size=2,
                  spatial_merge_size=2, num_position_embeddings=16,
                  deepstack_visual_indexes=(0, 1), in_channels=3)
    text = dict(_QWEN_TEXT, rope_theta=5e6)
    hf_cfg = {
        "model_type": "qwen3_vl", "architectures": ["ColQwen3"],
        "vision_config": {**vision, "deepstack_visual_indexes": [0, 1]},
        "text_config": {
            **{k: v for k, v in text.items()},
            "rope_scaling": {"rope_type": "default", "mrope_section": [2, 2, 2],
                             "mrope_interleaved": True},
        },
        "image_token_id": 5, "vision_start_token_id": 3, "video_token_id": 6,
        "vision_end_token_id": 4,
    }
    config = Qwen3VLConfig.from_hf_config(hf_cfg)
    model = ColQwen3(config, dim=320, dtype=jnp.float32, param_dtype=jnp.float32)
    s = 8
    ids = np.full((1, s), 10, np.int32)
    ids[:, 1:5] = config.image_token_id
    params = model.init(
        jax.random.PRNGKey(seed),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, s), jnp.int32),
        pixel_values=jnp.zeros((1, 16, config.vision.patch_dim), jnp.float32),
        vision_hpos=jnp.asarray((np.arange(16) // 4)[None].astype(np.int32)),
        vision_wpos=jnp.asarray((np.arange(16) % 4)[None].astype(np.int32)),
        patch_mask=jnp.ones((1, 16), bool),
        pos_idx=jnp.zeros((1, 16, 4), jnp.int32),
        pos_weight=jnp.full((1, 16, 4), 0.25, jnp.float32),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, 1, 1)).astype(np.int64)),
    )["params"]
    state = export_colqwen3_state_dict(jax.device_get(params), patch_size=14)
    n = _save_safetensors(out_dir, state)
    _write_json(out_dir, "config.json", hf_cfg)
    _write_json(out_dir, "preprocessor_config.json", {
        "patch_size": 14, "merge_size": 2, "temporal_patch_size": 2,
        "size": {"shortest_edge": 56 * 56, "longest_edge": 64 * 28 * 28},
        "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5],
    })
    _vc()._save_qwen2_word_tokenizer(out_dir)
    print(f"synthetic ColQwen3 checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _oracle_colqwen3(ckpt: str):
    import torch
    import transformers

    cfg = transformers.Qwen3VLConfig.from_pretrained(ckpt)

    class TorchColQwen3(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = transformers.Qwen3VLModel(cfg)
            self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 320)

        def forward(self, input_ids=None, attention_mask=None,
                    pixel_values=None, image_grid_thw=None, **_):
            hidden = self.model(
                input_ids=input_ids, attention_mask=attention_mask,
                pixel_values=pixel_values, image_grid_thw=image_grid_thw,
            ).last_hidden_state
            proj = self.custom_text_proj(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColQwen3().eval()
    _strict_load(model, ckpt)
    return model, _feed_qwen_grid


# --------------------------------------------------------------------------
# ColQwen3.5 — hybrid GatedDeltaNet/attention decoder + Qwen3-VL vision
# (reference models/qwen3_5/colqwen3_5/modeling_colqwen3_5.py:8-88; text
# stack oracle = HF Qwen3Next, the same architecture family — see
# tests/models/test_qwen3_5.py proxy note)
# --------------------------------------------------------------------------

def make_synth_colqwen35(out_dir: str, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colqwen35_state_dict
    from colpali_tpu.models.qwen3_5 import ColQwen3_5, Qwen35VLConfig

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
                  out_hidden_size=48, patch_size=14, temporal_patch_size=2,
                  spatial_merge_size=2, num_position_embeddings=16,
                  deepstack_visual_indexes=(0, 1), in_channels=3)
    # hybrid: layer_types period of 4 (3 linear_attention + 1 full_attention),
    # MoE with 4 experts — the full production decoder shape
    text = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
                head_dim=16, rope_theta=1e7, partial_rotary_factor=0.25,
                rms_norm_eps=1e-6,
                linear_num_value_heads=4, linear_num_key_heads=2,
                linear_key_head_dim=8, linear_value_head_dim=8,
                linear_conv_kernel_dim=2, full_attention_interval=4,
                num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
                shared_expert_intermediate_size=32, norm_topk_prob=True)
    hf_cfg = {
        "model_type": "qwen3_5", "architectures": ["ColQwen3_5"],
        "vision_config": {**vision, "deepstack_visual_indexes": [0, 1]},
        "text_config": dict(text),
        "dim": 128,
        "image_token_id": 5, "vision_start_token_id": 3,
    }
    config = Qwen35VLConfig.from_hf_config(hf_cfg)
    model = ColQwen3_5(config, dtype=jnp.float32, param_dtype=jnp.float32)
    s = 8
    ids = np.full((1, s), 10, np.int32)
    ids[:, 1:5] = config.image_token_id
    params = model.init(
        jax.random.PRNGKey(seed),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, s), jnp.int32),
        pixel_values=jnp.zeros((1, 16, config.vision.patch_dim), jnp.float32),
        vision_hpos=jnp.asarray((np.arange(16) // 4)[None].astype(np.int32)),
        vision_wpos=jnp.asarray((np.arange(16) % 4)[None].astype(np.int32)),
        patch_mask=jnp.ones((1, 16), bool),
        pos_idx=jnp.zeros((1, 16, 4), jnp.int32),
        pos_weight=jnp.full((1, 16, 4), 0.25, jnp.float32),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, 1, 1)).astype(np.int64)),
    )["params"]
    state = export_colqwen35_state_dict(jax.device_get(params), patch_size=14)
    n = _save_safetensors(out_dir, state)
    _write_json(out_dir, "config.json", hf_cfg)
    _write_json(out_dir, "preprocessor_config.json", {
        "patch_size": 14, "merge_size": 2, "temporal_patch_size": 2,
        "size": {"shortest_edge": 56 * 56, "longest_edge": 64 * 28 * 28},
        "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5],
    })
    _vc()._save_qwen2_word_tokenizer(out_dir)
    print(f"synthetic ColQwen3.5 checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _oracle_colqwen35(ckpt: str):
    """Composite oracle: HF Qwen3-VL vision tower + HF Qwen3Next hybrid
    decoder, merged at the embedding (the flax backbone's exact composition,
    models/qwen3_5.py Qwen35VLBackbone — deepstack features are not injected
    for the 3.5 family)."""
    import torch
    import transformers
    from transformers.models.qwen3_vl.configuration_qwen3_vl import Qwen3VLVisionConfig
    from transformers.models.qwen3_vl.modeling_qwen3_vl import Qwen3VLVisionModel

    with open(os.path.join(ckpt, "config.json")) as f:
        raw = json.load(f)
    vis_cfg = Qwen3VLVisionConfig(**{
        k: v for k, v in raw["vision_config"].items()})
    text_raw = dict(raw["text_config"])
    text_cfg = transformers.Qwen3NextConfig(
        **{k: v for k, v in text_raw.items()},
        attention_bias=False,
    )
    dim = raw.get("dim", 128)
    image_token_id = raw.get("image_token_id", 151655)

    class TorchColQwen3_5(torch.nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            inner = torch.nn.Module()
            inner.visual = Qwen3VLVisionModel(vis_cfg)
            inner.language_model = transformers.Qwen3NextModel(text_cfg)
            self.model = inner
            self.custom_text_proj = torch.nn.Linear(text_cfg.hidden_size, dim)

        def forward(self, input_ids=None, attention_mask=None,
                    pixel_values=None, image_grid_thw=None, position_ids=None, **_):
            embeds = self.model.language_model.get_input_embeddings()(input_ids)
            if pixel_values is not None:
                feats, _deepstack = self.model.visual(pixel_values, grid_thw=image_grid_thw)
                mask = (input_ids == image_token_id).unsqueeze(-1)
                flat = embeds.masked_scatter(mask, feats.to(embeds.dtype))
                embeds = flat
            if position_ids is None:
                position_ids = (attention_mask.cumsum(-1) - 1).clamp_min(0)
            hidden = self.model.language_model(
                inputs_embeds=embeds, attention_mask=attention_mask,
                position_ids=position_ids,
            ).last_hidden_state
            proj = self.custom_text_proj(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColQwen3_5().eval()
    _strict_load(model, ckpt)

    def feed(batch):
        import torch as _t

        out = {}
        if "pixel_values" in batch:
            out = _feed_qwen_grid(batch)
        else:
            out = _feed_text_only(batch)
        if "position_ids" in batch:
            # the flax hybrid decoder (empty mrope_section = single
            # full-width rope over the TEMPORAL component) consumes the
            # processor's M-RoPE index — feed the oracle the same component
            out["position_ids"] = _t.tensor(
                np.asarray(batch["position_ids"])[0], dtype=_t.long)
        else:
            # text-only queries: cumsum over the mask (HF Qwen3Next would
            # otherwise use arange, diverging under left padding)
            mask = out["attention_mask"]
            out["position_ids"] = (mask.cumsum(-1) - 1).clamp_min(0).to(_t.long)
        return out

    return model, feed


# --------------------------------------------------------------------------
# ColGemma3 — chat-template prompting, pooled soft tokens
# (reference models/gemma3/colgemma3/modeling_colgemma.py:20-100)
# --------------------------------------------------------------------------

def _save_gemma3_word_tokenizer(out_dir: str) -> None:
    specials = {
        "<pad>": 0, "<unk>": 1, "<bos>": 2, "<eos>": 3,
        "<start_of_turn>": 4, "<end_of_turn>": 5,
        "<start_of_image>": 6, "<image_soft_token>": 7, "<end_of_image>": 8,
    }
    _vc()._save_synth_word_tokenizer(
        out_dir, specials,
        dict(pad_token="<pad>", bos_token="<bos>", eos_token="<eos>",
             additional_special_tokens=[t for t in specials if t != "<unk>"]),
    )


GEMMA3_IMAGE_TOKEN_ID = 7  # <image_soft_token> in the synth tokenizer


def make_synth_colgemma3(out_dir: str, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colgemma3_state_dict
    from colpali_tpu.models.configs import SiglipVisionConfig
    from colpali_tpu.models.gemma3 import ColGemma3, Gemma3Config, Gemma3TextConfig

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, image_size=112, patch_size=14)
    text = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
                head_dim=8, query_pre_attn_scalar=8.0, sliding_window=4,
                sliding_window_pattern=2, rope_theta=1_000_000.0,
                rope_local_base_freq=10_000.0, rope_scaling_factor=2.0,
                rms_norm_eps=1e-6)
    config = Gemma3Config(
        vision=SiglipVisionConfig(**vision),
        text=Gemma3TextConfig(**text),
        mm_tokens_per_image=16,  # 8x8 SigLIP grid pooled to 4x4
        image_token_index=GEMMA3_IMAGE_TOKEN_ID,
    )
    model = ColGemma3(config, dim=128, dtype=jnp.float32, param_dtype=jnp.float32)
    s = 24
    ids = np.full((1, s), 10, np.int32)
    ids[:, 2:2 + config.mm_tokens_per_image] = GEMMA3_IMAGE_TOKEN_ID
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(ids),
        jnp.ones((1, s), jnp.int32),
        jnp.zeros((1, 112, 112, 3), jnp.float32),
    )["params"]
    state = export_colgemma3_state_dict(jax.device_get(params))
    n = _save_safetensors(out_dir, state)
    _write_json(out_dir, "config.json", {
        "model_type": "gemma3", "architectures": ["ColGemma3"],
        "vision_config": {**vision, "vision_use_head": False},
        "text_config": {
            **{k: v for k, v in text.items() if k != "rope_scaling_factor"},
            "rope_scaling": {"rope_type": "linear", "factor": 2.0},
        },
        "mm_tokens_per_image": 16,
        "image_token_index": GEMMA3_IMAGE_TOKEN_ID,
    })
    _write_json(out_dir, "preprocessor_config.json", {
        "size": {"height": 112, "width": 112},
        "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5],
    })
    _write_json(out_dir, "processor_config.json", {"image_seq_length": 16})
    _save_gemma3_word_tokenizer(out_dir)
    print(f"synthetic ColGemma3 checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _oracle_colgemma3(ckpt: str):
    import torch
    import transformers

    cfg = transformers.Gemma3Config.from_pretrained(ckpt)

    class TorchColGemma3(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = transformers.Gemma3Model(cfg)
            self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 128)

        def forward(self, input_ids=None, attention_mask=None, pixel_values=None, **_):
            kwargs = {}
            if pixel_values is not None:
                kwargs["pixel_values"] = pixel_values
                kwargs["token_type_ids"] = (input_ids == cfg.image_token_index).long()
            hidden = self.model(
                input_ids=input_ids, attention_mask=attention_mask, **kwargs
            ).last_hidden_state
            proj = self.custom_text_proj(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColGemma3().eval()
    _strict_load(model, ckpt)

    def feed(batch):
        import torch as _t

        out = _feed_text_only(batch)
        if "pixel_values" in batch:
            pv = np.asarray(batch["pixel_values"]).transpose(0, 3, 1, 2)  # NHWC -> NCHW
            out["pixel_values"] = _t.tensor(pv, dtype=_t.float32)
        return out

    return model, feed


# --------------------------------------------------------------------------
# ColModernVBert — SigLIP + pixel shuffle + ModernBERT + DecoupledEmbedding
# (reference models/modernvbert/colvbert/modeling_colmodernvbert.py:8-77;
# oracle = the reference's own vendored torch modeling file, loaded
# standalone so the unimportable package __init__ is bypassed)
# --------------------------------------------------------------------------

VBERT_BASE_VOCAB = 128
VBERT_IMAGE_TOKEN_ID = VBERT_BASE_VOCAB + 7  # lives in the ADDITIONAL vocab


def _save_vbert_word_tokenizer(out_dir: str) -> None:
    """Idefics3-style tile tokens pinned into the additional-vocab id range
    (>= base vocab_size) so DecoupledEmbedding's second table is exercised,
    exactly like the real checkpoint's image_token_id=50407 >= 50368. Filler
    words stay BELOW the base vocab (the shared helper numbers fillers above
    the specials, which would overflow the 16-slot additional table)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    base = VBERT_BASE_VOCAB
    specials = {
        "<global-img>": base + 0,
        "<fake_token_around_image>": base + 1,
        "<row_1_col_1>": base + 2,
        "<row_1_col_2>": base + 3,
        "<row_2_col_1>": base + 4,
        "<row_2_col_2>": base + 5,
        "<end_of_utterance>": base + 6,
        "<image>": VBERT_IMAGE_TOKEN_ID,
        "<|begin_of_text|>": base + 8,
    }
    vocab = {"<pad>": 0, "<unk>": 1}
    for w in _vc()._SYNTH_WORDS.split() + ["User:", "Describe", "image.", "Assistant:"]:
        if w not in vocab:
            vocab[w] = len(vocab)
    assert max(vocab.values()) < base
    vocab.update(specials)
    assert len(set(vocab.values())) == len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        additional_special_tokens=list(specials),
    )
    fast.save_pretrained(out_dir)


def make_synth_colmodernvbert(out_dir: str, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colmodernvbert_state_dict
    from colpali_tpu.models.configs import SiglipVisionConfig
    from colpali_tpu.models.modernvbert import (
        ColModernVBert,
        ModernBertTextConfig,
        ModernVBertConfig,
    )

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, image_size=32, patch_size=8)
    text = dict(vocab_size=VBERT_BASE_VOCAB, hidden_size=48, intermediate_size=64,
                num_hidden_layers=3, num_attention_heads=4, local_attention=4,
                global_attn_every_n_layers=3, norm_eps=1e-5,
                global_rope_theta=160000.0, local_rope_theta=10000.0)
    config = ModernVBertConfig(
        vision=SiglipVisionConfig(**vision),
        text=ModernBertTextConfig(**text),
        pixel_shuffle_factor=2,  # 4x4 patch grid -> 2x2 = 4 tokens/tile
        additional_vocab_size=16,
        image_token_id=VBERT_IMAGE_TOKEN_ID,
    )
    model = ColModernVBert(config, dim=128, dtype=jnp.float32, param_dtype=jnp.float32)
    ids = np.full((1, 12), 10, np.int32)
    ids[:, 2:2 + config.image_seq_len] = VBERT_IMAGE_TOKEN_ID
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(ids),
        jnp.ones_like(jnp.asarray(ids)),
        jnp.zeros((1, 1, 32, 32, 3), jnp.float32),
        jnp.ones((1, 1), bool),
    )["params"]
    state = export_colmodernvbert_state_dict(jax.device_get(params))
    n = _save_safetensors(out_dir, state)

    # reference-style composite config: backbone SUMMARY keys (embed_dim et
    # al., configuration_modernvbert.py:88-123) + model-name pointers at
    # LOCAL config dirs (resolved against _checkpoint_dir by the flax
    # loader; by AutoConfig.from_pretrained in the oracle)
    os.makedirs(os.path.join(out_dir, "backbones", "siglip"), exist_ok=True)
    _write_json(out_dir, os.path.join("backbones", "siglip", "config.json"), {
        # vision_use_head=False: the retriever never runs SigLIP's pooling
        # head and checkpoints ship without those weights
        "model_type": "siglip_vision_model", **vision, "vision_use_head": False,
    })
    os.makedirs(os.path.join(out_dir, "backbones", "modernbert"), exist_ok=True)
    _write_json(out_dir, os.path.join("backbones", "modernbert", "config.json"), {
        "model_type": "modernbert", **text,
        "hidden_activation": "gelu", "attention_bias": False, "mlp_bias": False,
        "pad_token_id": 0, "max_position_embeddings": 512,
    })
    _write_json(out_dir, "config.json", {
        "model_type": "modernvbert", "architectures": ["ColModernVBert"],
        "vision_config": {
            "vision_model_name": os.path.join("backbones", "siglip"),
            "embed_dim": vision["hidden_size"], "image_size": 32, "patch_size": 8,
            "num_hidden_layers": 2, "intermediate_size": 64,
        },
        "text_config": {
            "text_model_name": os.path.join("backbones", "modernbert"),
            "hidden_size": 48, "num_hidden_layers": 3, "intermediate_size": 64,
            "vocab_size": VBERT_BASE_VOCAB, "mlp_bias": False,
        },
        "hidden_size": 48,
        "vocab_size": VBERT_BASE_VOCAB,
        "image_token_id": VBERT_IMAGE_TOKEN_ID,
        "pixel_shuffle_factor": 2,
        "additional_vocab_size": 16,
        "pad_token_id": 0,
        "freeze_config": {"freeze_text_layers": False, "freeze_vision_layers": False},
    })
    _write_json(out_dir, "preprocessor_config.json", {
        "max_image_size": {"longest_edge": 32},
        "size": {"longest_edge": 64},
        "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5],
    })
    _write_json(out_dir, "processor_config.json", {"image_seq_len": 4})
    _save_vbert_word_tokenizer(out_dir)
    print(f"synthetic ColModernVBert checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _load_reference_vbert_modules():
    """Load the reference's vendored torch ModernVBert modeling files
    standalone (the colpali_engine package __init__ cannot import under the
    installed transformers; the modeling files themselves can)."""
    import importlib.util
    import types

    base = "/root/reference/colpali_engine/models/modernvbert"
    if not os.path.isdir(base):
        return None
    pkg = types.ModuleType("_ref_vbert")
    pkg.__path__ = [base]
    sys.modules.setdefault("_ref_vbert", pkg)

    def load(name, path):
        full = f"_ref_vbert.{name}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    load("configuration_modernvbert", f"{base}/configuration_modernvbert.py")
    return load("modeling_modernvbert", f"{base}/modeling_modernvbert.py")


def _oracle_colmodernvbert(ckpt: str):
    import torch

    modeling = _load_reference_vbert_modules()
    with open(os.path.join(ckpt, "config.json")) as f:
        raw = json.load(f)
    # resolve relative backbone pointers against the checkpoint dir (the
    # synth writes them relative so the checkpoint stays relocatable)
    for sub, key in (("vision_config", "vision_model_name"),
                     ("text_config", "text_model_name")):
        name = raw.get(sub, {}).get(key)
        if name and not os.path.isabs(name):
            raw[sub][key] = os.path.join(ckpt, name)
    cfg_mod = sys.modules["_ref_vbert.configuration_modernvbert"]
    cfg = cfg_mod.ModernVBertConfig(**{
        k: v for k, v in raw.items() if k not in ("model_type", "architectures")})

    class TorchColModernVBert(torch.nn.Module):
        """reference colvbert/modeling_colmodernvbert.py:27-67 math."""

        def __init__(self):
            super().__init__()
            self.model = modeling.ModernVBertModel(cfg)
            self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 128)

        def forward(self, input_ids=None, attention_mask=None, pixel_values=None, **_):
            out = self.model(input_ids=input_ids, attention_mask=attention_mask,
                             pixel_values=pixel_values)
            proj = self.custom_text_proj(out[0])
            proj = proj / proj.norm(dim=-1, keepdim=True).clamp_min(1e-12)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColModernVBert().eval()
    _strict_load(model, ckpt)

    def feed(batch):
        import torch as _t

        out = _feed_text_only(batch)
        if "pixel_values" in batch:
            pv = np.asarray(batch["pixel_values"]).transpose(0, 1, 4, 2, 3)  # BTHWC -> BT3SS
            out["pixel_values"] = _t.tensor(pv, dtype=_t.float32)
        return out

    return model, feed


# --------------------------------------------------------------------------
# ColQwen2.5-Omni — audio documents through the thinker
# (reference models/qwen_omni/colqwen_omni/modeling_colqwen_omni.py:10-101,
# processing_colqwen_omni.py:123-153)
# --------------------------------------------------------------------------

OMNI_N_WINDOW = 4
OMNI_N_MELS = 16


def _save_omni_word_tokenizer(out_dir: str) -> None:
    specials = {
        "<|endoftext|>": 0, "<|im_start|>": 1, "<|im_end|>": 2,
        "<|vision_start|>": 3, "<|vision_end|>": 4, "<|image_pad|>": 5,
        "<|video_pad|>": 6, "<unk>": 7,
        "<|AUDIO|>": 8, "<|audio_bos|>": 9, "<|audio_eos|>": 10,
        "<|VIDEO|>": 11,
    }
    _vc()._save_synth_word_tokenizer(
        out_dir, specials,
        dict(pad_token="<|endoftext|>",
             additional_special_tokens=[t for t in specials if t != "<unk>"]),
    )


def make_synth_colqwen_omni(out_dir: str, seed: int = 0) -> None:
    """Torch-side generation (mirrors make_synth_colsmol): a tiny HF thinker
    checkpoint in the full-Omni layout (thinker.* nesting + talker stack
    dropped by the loader) plus the retrieval head."""
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(seed)
    audio = dict(num_mel_bins=OMNI_N_MELS, d_model=32, encoder_layers=2,
                 encoder_attention_heads=4, encoder_ffn_dim=64, n_window=OMNI_N_WINDOW,
                 max_source_positions=64, output_dim=48)
    vision = dict(depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
                  out_hidden_size=48, patch_size=14, temporal_patch_size=2,
                  spatial_merge_size=2, window_size=56, fullatt_block_indexes=[1],
                  in_channels=3)
    text = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                head_dim=12, rope_theta=1e6, rms_norm_eps=1e-6)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=dict(audio),
        vision_config=dict(vision),
        text_config=dict(text),
        # video placeholder is <|VIDEO|> (id 11 in the synth tokenizer) —
        # the Omni chat template expands <|VIDEO|>/<|AUDIO|>, NOT qwen2-vl's
        # <|video_pad|>; the model merges video features at this id, so a
        # mismatch silently drops every video feature
        audio_token_index=8, image_token_index=5, video_token_index=11,
    )
    cfg.text_config.rope_scaling = {
        "mrope_section": [2, 2, 2], "rope_type": "default", "type": "default"}
    thinker = Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()
    head = torch.nn.Linear(cfg.text_config.hidden_size, 128)
    state = {f"thinker.{k}": v for k, v in thinker.state_dict().items()
             if "rotary_emb.inv_freq" not in k}
    state["custom_text_proj.weight"] = head.weight.data
    state["custom_text_proj.bias"] = head.bias.data
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in state.items()},
              os.path.join(out_dir, "model.safetensors"))
    n = sum(v.numel() for v in state.values())
    _write_json(out_dir, "config.json", {
        "model_type": "qwen2_5_omni", "architectures": ["ColQwen2_5Omni"],
        "thinker_config": {
            "audio_config": audio,
            "vision_config": vision,
            "text_config": {**text,
                            "rope_scaling": {"mrope_section": [2, 2, 2],
                                             "rope_type": "default", "type": "default"}},
            "audio_token_id": 8, "image_token_id": 5, "video_token_id": 11,
            "vision_start_token_id": 3,
        },
    })
    _write_json(out_dir, "preprocessor_config.json", {
        "patch_size": 14, "merge_size": 2, "temporal_patch_size": 2,
        "size": {"shortest_edge": 56 * 56, "longest_edge": 64 * 28 * 28},
        "image_mean": [0.48145466, 0.4578275, 0.40821073],
        "image_std": [0.26862954, 0.26130258, 0.27577711],
    })
    _save_omni_word_tokenizer(out_dir)
    print(f"synthetic ColQwen2.5-Omni checkpoint ({n/1e6:.1f}M params) -> {out_dir}")


def _oracle_colqwen_omni(ckpt: str):
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    with open(os.path.join(ckpt, "config.json")) as f:
        raw = json.load(f)["thinker_config"]
    text_raw = dict(raw["text_config"])
    rope_scaling = text_raw.pop("rope_scaling", None)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=raw["audio_config"],
        vision_config=raw["vision_config"],
        text_config=text_raw,
        audio_token_index=raw.get("audio_token_id", 8),
        image_token_index=raw.get("image_token_id", 5),
        video_token_index=raw.get("video_token_id", 6),
    )
    if rope_scaling:
        cfg.text_config.rope_scaling = rope_scaling
    # get_rope_index reads these directly off the thinker config
    cfg.vision_start_token_id = raw.get("vision_start_token_id", 3)
    cfg.vision_end_token_id = raw.get("vision_end_token_id", 4)
    cfg.audio_start_token_id = raw.get("audio_start_token_id", 9)  # <|audio_bos|>
    cfg.audio_end_token_id = raw.get("audio_end_token_id", 10)  # <|audio_eos|>
    cfg.position_id_per_seconds = raw.get("position_id_per_seconds", 25)
    cfg.seconds_per_chunk = raw.get("seconds_per_chunk", 2)

    class TorchColQwenOmni(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.thinker = Qwen2_5OmniThinkerForConditionalGeneration(cfg)
            self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 128)

        def forward(self, attention_mask=None, **kwargs):
            out = self.thinker(
                attention_mask=attention_mask, use_cache=False,
                output_hidden_states=True, return_dict=True, **kwargs,
            )
            hidden = out.hidden_states[-1]
            proj = self.custom_text_proj(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * attention_mask.unsqueeze(-1)

    model = TorchColQwenOmni().eval()

    def rekey(state):
        # full-Omni checkpoints nest under thinker.*; Col-style exports
        # (reference modeling_colqwen_omni saved models, and this repo's
        # export_colqwen_omni_state_dict) are thinker-relative
        if any(k.startswith("thinker.") for k in state):
            return state
        return {k if k.startswith("custom_text_proj") else f"thinker.{k}": v
                for k, v in state.items()}

    _strict_load(model, ckpt, rekey=rekey,
                 drop_substrings=("rotary_emb", "lm_head", "audio_bos_eos_token",
                                  "positional_embedding"))

    def feed(batch):
        import torch as _t

        out = _feed_text_only(batch)
        if "video_grid_thw" in batch and "pixel_values" in batch:
            # video documents: torch takes CONCATENATED unpadded patches +
            # grids + per-video real-time stride and computes the Omni
            # temporal M-RoPE internally (modeling_qwen2_5_omni.get_rope_index)
            pv = np.asarray(batch["pixel_values"])
            pm = np.asarray(batch["patch_mask"]).astype(bool)
            flat = np.concatenate([pv[i][pm[i]] for i in range(pv.shape[0])])
            out["pixel_values_videos"] = _t.tensor(flat, dtype=_t.float32)
            out["video_grid_thw"] = _t.tensor(np.asarray(batch["video_grid_thw"]))
            out["video_second_per_grid"] = _t.tensor(
                np.asarray(batch["video_second_per_grid"], np.float32))
        if "audio_chunks" in batch:
            # chunked (B, C, 2*n_window, mel) + frame mask -> HF's padded
            # (B, mel, T) mel batch + (B, T) frame mask
            chunks = np.asarray(batch["audio_chunks"])
            fmask = np.asarray(batch["audio_frame_mask"]).astype(bool)
            b = chunks.shape[0]
            mels, lens = [], []
            for i in range(b):
                valid = [chunks[i, c][fmask[i, c]] for c in range(chunks.shape[1])]
                mel = np.concatenate([v for v in valid if len(v)], axis=0)  # (T, mel)
                mels.append(mel)
                lens.append(mel.shape[0])
            t_max = max(lens)
            feats = np.zeros((b, chunks.shape[-1], t_max), np.float32)
            famask = np.zeros((b, t_max), np.int64)
            for i, mel in enumerate(mels):
                feats[i, :, : mel.shape[0]] = mel.T
                famask[i, : mel.shape[0]] = 1
            out["input_features"] = _t.tensor(feats)
            out["feature_attention_mask"] = _t.tensor(famask)
        return out

    return model, feed


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

SYNTH_MAKERS = {
    "colqwen2_5-tiny": make_synth_colqwen25,
    "colqwen3-tiny": make_synth_colqwen3,
    "colqwen3_5-tiny": make_synth_colqwen35,
    "colgemma3-tiny": make_synth_colgemma3,
    "colmodernvbert-tiny": make_synth_colmodernvbert,
    "colqwen-omni-tiny": make_synth_colqwen_omni,
}

ORACLE_BUILDERS = {
    "colqwen2_5": _oracle_colqwen25,
    "colqwen3": _oracle_colqwen3,
    "colqwen3_5": _oracle_colqwen35,
    "colgemma3": _oracle_colgemma3,
    "colmodernvbert": _oracle_colmodernvbert,
    "colqwen_omni": _oracle_colqwen_omni,
}


def make_videos(n: int, frames: int = 4, size: int = 56) -> list:
    """Strongly distinct synthetic video documents: (T, H, W, 3) uint8 frame
    stacks, each with its own color field, spatial frequency, AND motion
    direction (the temporal axis must carry signal or the gate never
    exercises temporal patching/rope beyond frame 0). The video analogue of
    validate_checkpoint._make_pages."""
    rng = np.random.default_rng(0)
    videos = []
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        hue = np.array([(53 * i + 40) % 255, (97 * i + 90) % 255,
                        (139 * i + 150) % 255], np.int16)
        f = 6 + 3 * (i % 5)
        vid = np.zeros((frames, size, size, 3), np.uint8)
        for t in range(frames):
            shift = t * (2 + i % 3) * (1 if i % 2 else -1)  # per-doc motion
            checker = (((yy + shift) // f + xx // f) % 2).astype(np.int16) * 90
            frame = np.clip(hue[None, None] + checker[..., None] - 45, 0, 255)
            frame = frame + rng.integers(0, 12, size=frame.shape)
            vid[t] = np.clip(frame, 0, 255).astype(np.uint8)
        videos.append(vid)
    return videos


def make_audios(n: int, seconds: float = 1.6, rate: int = 16000) -> list:
    """Strongly distinct synthetic audio documents: each doc gets its own
    harmonic stack + AM envelope so random-weight embeddings still separate
    (the audio analogue of validate_checkpoint._make_pages)."""
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * rate)) / rate
    audios = []
    for i in range(n):
        # geometric pitch spacing: a 16-bin mel front-end cannot resolve
        # ~100 Hz steps, so near-linear spacing makes neighboring docs
        # collapse to the same mel signature
        f0 = 150.0 * (2.0 ** (i * 0.75))
        wave = np.zeros_like(t)
        for h in range(1, 4 + i % 3):
            wave += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
        am = 0.5 + 0.5 * np.sin(2 * np.pi * (1.5 + 1.7 * i) * t)
        wave = wave * am + 0.05 * rng.normal(size=t.shape)
        audios.append((wave / np.max(np.abs(wave))).astype(np.float32))
    return audios
