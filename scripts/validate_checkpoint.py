#!/usr/bin/env python
"""Real-checkpoint validation gate: flax-on-TPU vs the torch reference.

The north-star quality gate ("nDCG@5 within 0.1 of PyTorch", BASELINE.md)
executed as one command against any HF-format ColPali-family checkpoint:

    python scripts/validate_checkpoint.py CKPT_DIR --family colidefics3 \
        [--images DIR] [--pages 16] [--out results.md]

Pipeline (mirrors the reference gate
/root/reference/tests/models/paligemma/colpali/test_modeling_colpali.py:119-157,
but with the oracle computed IN-ENV instead of hardcoded goldens):

  1. load the checkpoint through core.hf_loader -> flax model (bf16 on the
     default device — the TPU path users run);
  2. load the SAME safetensors into the reference torch architecture
     (imported from /root/reference's colpali_engine when present, else
     reconstructed from transformers classes + the 128-d linear head) in
     fp32 on CPU — the oracle;
  3. embed the same pages + queries with BOTH, compare the MaxSim score
     matrices, and compute nDCG@5 / recall@5 for both rankings (query i's
     gold page is page i);
  4. print + optionally append a markdown report. Exit nonzero if
     |nDCG@5_flax - nDCG@5_torch| > 0.1 or the flax matrix is not
     diagonal-dominant when the torch one is.

``--make-synth colsmol OUT_DIR`` writes a RANDOM-weight checkpoint at the
real colSmol-256M architecture dims (SigLIP-93M vision + SmolLM2-135M text,
512px tiles) with an offline word-level tokenizer — the hermetic stand-in
used when no network egress is available to pull vidore weights: it
exercises the identical code path (safetensors -> loader rules at real
shapes -> bf16 forward at real scale -> A/B vs torch) with the only
untested residue being the weight VALUES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

QUERIES = [
    "What is the chip used in the iPhone 12?",
    "What is the price of the iPhone 12?",
    "When was the iPhone 12 released?",
]


# --------------------------------------------------------------------------
# synthetic checkpoint at real colSmol-256M dims
# --------------------------------------------------------------------------

def make_synth_colsmol(out_dir: str, seed: int = 0, tiny: bool = False) -> None:
    import torch
    import transformers

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(seed)
    # Real SmolVLM-256M-Instruct architecture dims (the colSmol-256M base):
    # SigLIP-base-p16-512 vision tower + SmolLM2-135M text decoder.
    # tiny=True shrinks width/depth (same architecture/layout) so the test
    # suite can exercise the FULL gate (safetensors -> loader -> flax +
    # torch oracle -> nDCG delta) in seconds.
    if tiny:
        vision_cfg = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, image_size=64, patch_size=16)
        text_cfg = dict(vocab_size=49280, hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, rope_theta=100000.0,
                        rms_norm_eps=1e-5, max_position_embeddings=8192)
        scale_factor = 2
    else:
        vision_cfg = dict(hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
                          num_attention_heads=12, image_size=512, patch_size=16)
        text_cfg = dict(vocab_size=49280, hidden_size=576, intermediate_size=1536,
                        num_hidden_layers=30, num_attention_heads=9,
                        num_key_value_heads=3, rope_theta=100000.0,
                        rms_norm_eps=1e-5, max_position_embeddings=8192)
        scale_factor = 4  # 512/16 = 32 -> 8x8 = 64 tokens/tile
    cfg = transformers.Idefics3Config(
        vision_config=vision_cfg,
        text_config=text_cfg,
        scale_factor=scale_factor,
        image_token_id=49190,
    )
    model = transformers.Idefics3Model(cfg).eval()
    head = torch.nn.Linear(cfg.text_config.hidden_size, 128)
    state = {f"model.{k}": v for k, v in model.state_dict().items()}
    state["linear.weight"] = head.weight.data
    state["linear.bias"] = head.bias.data
    state = {k: v for k, v in state.items() if "rotary_emb.inv_freq" not in k}
    n_params = sum(v.numel() for v in state.values())
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in state.items()},
              os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({**cfg.to_dict(), "architectures": ["ColIdefics3"]}, f)
    vc = cfg.vision_config
    seq_len = (vc.image_size // vc.patch_size // cfg.scale_factor) ** 2
    with open(os.path.join(out_dir, "processor_config.json"), "w") as f:
        json.dump({"image_seq_len": seq_len}, f)
    with open(os.path.join(out_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "max_image_size": {"longest_edge": vc.image_size},
            "size": {"longest_edge": 4 * vc.image_size},
            "image_mean": [0.5, 0.5, 0.5],
            "image_std": [0.5, 0.5, 0.5],
        }, f)
    _save_word_tokenizer(out_dir, image_token_id=cfg.image_token_id)
    print(f"synthetic colSmol-256M checkpoint ({n_params/1e6:.0f}M params) -> {out_dir}")


def make_synth_colqwen2(out_dir: str, seed: int = 0) -> None:
    """Random-weight checkpoint in the REAL ColQwen2 HF layout, at tiny dims.

    Generated through the production EXPORT path (hf_export round-trips the
    loader rules), so safetensors keys/shapes are exactly what
    ``load_colqwen2_params`` consumes — plus a config.json/ tokenizer/
    preprocessor_config the auto-loader and processor bootstrap from. Small
    pinned special ids (collision-free; see _save_word_tokenizer's warning)
    keep the embedding table tiny."""
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colqwen2_state_dict
    from colpali_tpu.models.qwen2_vl import (
        ColQwen2,
        Qwen2TextConfig,
        Qwen2VLConfig,
        Qwen2VLVisionConfig,
    )

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(depth=2, embed_dim=64, num_heads=4, mlp_ratio=2.0, hidden_size=48,
                  patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                  in_channels=3, hidden_act="quick_gelu")
    # head_dim MUST be hidden//heads: HF Qwen2VLConfig has no head_dim field
    # (the torch oracle would build 12-wide heads against 16-wide weights)
    text = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                head_dim=12, rope_theta=1e6, rms_norm_eps=1e-6,
                mrope_section=(2, 2, 2), attention_bias=True)
    config = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(**vision),
        text=Qwen2TextConfig(**text),
        image_token_id=5, vision_start_token_id=3, video_token_id=6,
    )
    model = ColQwen2(config, dim=128, dtype=jnp.float32, param_dtype=jnp.float32)
    n_merged = 4
    s = n_merged + 4
    ids = np.full((1, s), 10, np.int32)
    ids[:, 1:1 + n_merged] = config.image_token_id
    params = model.init(
        jax.random.PRNGKey(seed),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, s), jnp.int32),
        pixel_values=jnp.zeros((1, 16, config.vision.patch_dim), jnp.float32),
        vision_hpos=jnp.asarray(np.tile(np.arange(16) // 4, (1, 1)).astype(np.int32)),
        vision_wpos=jnp.asarray(np.tile(np.arange(16) % 4, (1, 1)).astype(np.int32)),
        patch_mask=jnp.ones((1, 16), bool),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, 1, 1)).astype(np.int64)),
    )["params"]
    state = export_colqwen2_state_dict(jax.device_get(params))
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              os.path.join(out_dir, "model.safetensors"), metadata={"format": "pt"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen2_vl", "architectures": ["ColQwen2"],
            "vision_config": vision,
            **{k: v for k, v in text.items() if k not in ("mrope_section", "head_dim")},
            "rope_scaling": {"type": "mrope", "mrope_section": [2, 2, 2]},
            "image_token_id": 5, "vision_start_token_id": 3, "video_token_id": 6,
        }, f)
    with open(os.path.join(out_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "patch_size": 14, "merge_size": 2, "temporal_patch_size": 2,
            "size": {"shortest_edge": 56 * 56, "longest_edge": 64 * 28 * 28},
            "image_mean": [0.48145466, 0.4578275, 0.40821073],
            "image_std": [0.26862954, 0.26130258, 0.27577711],
        }, f)
    _save_qwen2_word_tokenizer(out_dir)
    n_params = sum(v.size for v in state.values())
    print(f"synthetic ColQwen2 checkpoint ({n_params/1e6:.1f}M params) -> {out_dir}")


def make_synth_colpali(out_dir: str, seed: int = 0) -> None:
    """Random-weight checkpoint in the REAL ColPali HF layout at tiny dims
    (SigLIP tower + Gemma decoder + projector), generated through the
    round-trip-tested export path like the colqwen2 synth."""
    import jax
    import jax.numpy as jnp

    from colpali_tpu.core.hf_export import export_colpali_state_dict
    from colpali_tpu.models.configs import (
        GemmaConfig,
        PaliGemmaConfig,
        SiglipVisionConfig,
    )
    from colpali_tpu.models.paligemma import ColPali

    os.makedirs(out_dir, exist_ok=True)
    vision = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, image_size=28, patch_size=14)
    text = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6)
    config = PaliGemmaConfig(
        vision=SiglipVisionConfig(**vision),
        text=GemmaConfig(**text),
        projection_dim=32,
        image_token_index=4,
    )
    model = ColPali(config, dim=128, dtype=jnp.float32, param_dtype=jnp.float32)
    n_img = config.vision.num_patches  # 4
    ids = np.concatenate([np.full((1, n_img), 4, np.int32),
                          np.full((1, 4), 10, np.int32)], axis=1)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(ids),
        jnp.ones_like(jnp.asarray(ids)),
        jnp.zeros((1, 28, 28, 3), jnp.float32),
    )["params"]
    state = export_colpali_state_dict(jax.device_get(params))
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              os.path.join(out_dir, "model.safetensors"), metadata={"format": "pt"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "paligemma", "architectures": ["ColPali"],
            # vision_use_head=False: PaliGemma never runs SigLIP's pooling
            # head (real checkpoints ship without those weights too)
            "vision_config": {**vision, "projection_dim": 32, "vision_use_head": False},
            "text_config": text,
            "projection_dim": 32,
            "image_token_index": 4,
        }, f)
    with open(os.path.join(out_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"height": 28, "width": 28},
            "image_mean": [0.5, 0.5, 0.5],
            "image_std": [0.5, 0.5, 0.5],
        }, f)
    _save_paligemma_word_tokenizer(out_dir)
    n_params = sum(v.size for v in state.values())
    print(f"synthetic ColPali checkpoint ({n_params/1e6:.1f}M params) -> {out_dir}")


_SYNTH_WORDS = (
    "user Describe the image. Query: what is chip used in iphone 12 ? "
    "price of when was released a an and for to with document page report "
    "table figure total revenue chart data summary results find quarterly "
    "0 1 2 3 4 5 6 7 8 9 10 11"
)


def _save_synth_word_tokenizer(out_dir: str, specials: dict, tok_kwargs: dict,
                               vocab_limit: int = 128) -> None:
    """Offline word tokenizer with PINNED special-token ids plus shared
    filler words above them. Ids must be collision-free — duplicates make
    the tokenizers library silently renumber, which desyncs the processor's
    image token from the model's merge id (see colsmol tokenizer warning).
    ``specials`` must include '<unk>'."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = dict(specials)
    next_id = max(vocab.values()) + 1
    for w in _SYNTH_WORDS.split():
        if w not in vocab:
            vocab[w] = next_id
            next_id += 1
    assert len(set(vocab.values())) == len(vocab)
    assert max(vocab.values()) < vocab_limit  # inside the synth embed table
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    from transformers import PreTrainedTokenizerFast

    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>", **tok_kwargs)
    fast.save_pretrained(out_dir)


def _save_paligemma_word_tokenizer(out_dir: str) -> None:
    _save_synth_word_tokenizer(
        out_dir,
        {"<pad>": 0, "<eos>": 1, "<bos>": 2, "<unk>": 3, "<image>": 4},
        dict(pad_token="<pad>", bos_token="<bos>", eos_token="<eos>",
             additional_special_tokens=["<image>"]),
    )


def _save_qwen2_word_tokenizer(out_dir: str) -> None:
    specials = {
        "<|endoftext|>": 0, "<|im_start|>": 1, "<|im_end|>": 2,
        "<|vision_start|>": 3, "<|vision_end|>": 4, "<|image_pad|>": 5,
        "<|video_pad|>": 6, "<unk>": 7,
    }
    _save_synth_word_tokenizer(
        out_dir, specials,
        dict(pad_token="<|endoftext|>",
             additional_special_tokens=[t for t in specials if t != "<unk>"]),
    )


def _save_word_tokenizer(out_dir: str, image_token_id: int) -> None:
    """Offline word-level tokenizer with the Idefics3 special tokens pinned
    to their real ids (no network; AutoTokenizer-loadable)."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = (
        "what is the chip used in iphone 12 ? price of when was released "
        "describe image . user assistant a an and for to with document page "
        "report table figure total revenue chart data summary results find "
        "quarterly 0 1 2 3 4 5 6 7 8 9 10 11"
    ).split()
    vocab = {"<pad>": 0, "<unk>": 1}
    for w in words:
        vocab[w] = len(vocab)
    # NON-COLLIDING pinned ids (an earlier version pinned <row_6_col_6> onto
    # <image>'s id — duplicate ids make the tokenizers library silently
    # renumber <image>, the processor then emits an id the model's
    # image_token_id never matches, and image features are never merged:
    # every page embeds identically and the gate's ranking half is vacuous).
    specials = {
        "<global-img>": 49152,
        "<fake_token_around_image>": 49189,
        "<image>": image_token_id,  # 49190, as in the real checkpoint
        "<end_of_utterance>": 49191,
        "<|im_start|>": 49192,
    }
    for r in range(1, 7):
        for c in range(1, 7):
            specials[f"<row_{r}_col_{c}>"] = 49153 + (r - 1) * 6 + (c - 1)  # 49153..49188
    assert len(set(specials.values())) == len(specials)
    assert not set(specials.values()) & set(vocab.values())
    vocab.update(specials)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    from transformers import PreTrainedTokenizerFast

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        unk_token="<unk>",
        additional_special_tokens=list(specials),
    )
    fast.save_pretrained(out_dir)


# --------------------------------------------------------------------------
# model construction per family
# --------------------------------------------------------------------------

def _load_flax(family: str, ckpt: str, dtype):
    """One-call load through the production auto-loader (colpali_tpu.auto —
    same registry the library exposes; keeps the gate and the library's
    from_pretrained path from drifting apart)."""
    from colpali_tpu.auto import load_retriever

    model, variables, processor = load_retriever(
        ckpt, family=family, dtype=dtype, param_dtype=dtype
    )
    return model, variables["params"], processor


def _load_torch_oracle(family: str, ckpt: str):
    """The reference torch model: try /root/reference's colpali_engine first
    (the actual upstream classes), fall back to reconstructing from
    transformers + the linear head (identical math, modeling_colidefics3.py:16-48).

    Returns (model, origin, feed_fn) — feed_fn is a per-family batch adapter
    (None = the generic _embed_torch conversion)."""
    import torch

    if family in ("colqwen2_5", "colqwen3", "colqwen3_5", "colgemma3",
                  "colmodernvbert", "colqwen_omni"):
        import gate_families

        model, feed = gate_families.ORACLE_BUILDERS[family](ckpt)
        return model, "reconstructed", feed

    ref_path = "/root/reference"
    if os.path.isdir(ref_path) and ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    cls = None
    try:
        if family == "colidefics3":
            from colpali_engine.models import ColIdefics3 as cls  # type: ignore
        elif family == "colpali":
            from colpali_engine.models import ColPali as cls  # type: ignore
        elif family == "colqwen2":
            from colpali_engine.models import ColQwen2 as cls  # type: ignore
    except Exception as exc:  # noqa: BLE001
        print(f"[oracle] colpali_engine import failed ({exc}); reconstructing", flush=True)

    if cls is not None:
        model = cls.from_pretrained(ckpt, torch_dtype=torch.float32).eval()
        return model, "colpali_engine", None

    # reconstruction path (architecture math per the reference model files)
    import transformers
    from safetensors.torch import load_file

    if family == "colqwen2":
        cfg = transformers.Qwen2VLConfig.from_pretrained(ckpt)

        class TorchColQwen2(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.model = transformers.Qwen2VLModel(cfg)
                self.custom_text_proj = torch.nn.Linear(cfg.hidden_size, 128)

            def forward(self, input_ids=None, attention_mask=None,
                        pixel_values=None, image_grid_thw=None, **_):
                hidden = self.model(
                    input_ids=input_ids, attention_mask=attention_mask,
                    pixel_values=pixel_values, image_grid_thw=image_grid_thw,
                ).last_hidden_state
                proj = self.custom_text_proj(hidden)
                proj = proj / proj.norm(dim=-1, keepdim=True)
                return proj * attention_mask.unsqueeze(-1)

        model = TorchColQwen2().eval()
        state = {}
        for fn in os.listdir(ckpt):
            if fn.endswith(".safetensors"):
                state.update(load_file(os.path.join(ckpt, fn)))
        missing, unexpected = model.load_state_dict(state, strict=False)
        real_missing = [k for k in missing if "rotary_emb" not in k]
        if real_missing or unexpected:
            raise SystemExit(
                f"oracle load mismatch: missing={real_missing[:5]} unexpected={unexpected[:5]}")
        return model, "reconstructed", None

    if family == "colpali":
        cfg = transformers.PaliGemmaConfig.from_pretrained(ckpt)

        class TorchColPali(torch.nn.Module):
            def __init__(self):
                super().__init__()
                # base Model (no LM head): submodule names line up with the
                # exported layout (model.vision_tower / model.language_model
                # / model.multi_modal_projector + custom_text_proj)
                self.model = transformers.PaliGemmaModel(cfg)
                self.custom_text_proj = torch.nn.Linear(cfg.text_config.hidden_size, 128)

            def forward(self, input_ids=None, attention_mask=None, pixel_values=None, **_):
                hidden = self.model(
                    input_ids=input_ids, attention_mask=attention_mask,
                    pixel_values=pixel_values,
                ).last_hidden_state
                proj = self.custom_text_proj(hidden)
                proj = proj / proj.norm(dim=-1, keepdim=True)
                return proj * attention_mask.unsqueeze(-1)

        model = TorchColPali().eval()
        state = {}
        for fn in os.listdir(ckpt):
            if fn.endswith(".safetensors"):
                state.update(load_file(os.path.join(ckpt, fn)))
        missing, unexpected = model.load_state_dict(state, strict=False)
        real_missing = [k for k in missing if "rotary_emb" not in k and "lm_head" not in k]
        if real_missing or unexpected:
            raise SystemExit(
                f"oracle load mismatch: missing={real_missing[:5]} unexpected={unexpected[:5]}")
        return model, "reconstructed", None

    if family != "colidefics3":
        raise SystemExit(
            "oracle reconstruction currently supports colidefics3/colqwen2/colpali")
    cfg = transformers.Idefics3Config.from_pretrained(ckpt)

    class TorchColIdefics3(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = transformers.Idefics3Model(cfg)
            self.linear = torch.nn.Linear(cfg.text_config.hidden_size, 128)

        def forward(self, **kwargs):
            hidden = self.model(**kwargs).last_hidden_state
            proj = self.linear(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            return proj * kwargs["attention_mask"].unsqueeze(-1)

    model = TorchColIdefics3().eval()
    state = {}
    for fn in os.listdir(ckpt):
        if fn.endswith(".safetensors"):
            state.update(load_file(os.path.join(ckpt, fn)))
    missing, unexpected = model.load_state_dict(state, strict=False)
    real_missing = [k for k in missing if "rotary_emb" not in k]
    if real_missing or unexpected:
        raise SystemExit(f"oracle load mismatch: missing={real_missing[:5]} unexpected={unexpected[:5]}")
    return model, "reconstructed", None


# --------------------------------------------------------------------------
# in-env contrastive fine-tune (makes the gate's ranking check non-trivial)
# --------------------------------------------------------------------------

def finetune_checkpoint(args) -> None:
    """Train the checkpoint for a few in-env contrastive steps on the
    synthetic pages/queries, then export back to a NEW HF-layout checkpoint
    dir. Under random weights every page scores near-identically (the
    ranking half of the gate is vacuous — RESULTS.md caveat); a trained
    checkpoint separates the pages, so running the gate on the exported dir
    exercises train -> HF export -> production reload -> torch oracle with a
    non-trivial ranking comparison."""
    import jax
    import jax.numpy as jnp
    import optax

    from colpali_tpu.auto import load_retriever
    from colpali_tpu.core import hf_export
    from colpali_tpu.losses import ColbertLoss

    exporters = {
        "colidefics3": hf_export.export_colidefics3_state_dict,
        "colqwen2": hf_export.export_colqwen2_state_dict,
        "colpali": hf_export.export_colpali_state_dict,
        "colqwen2_5": hf_export.export_colqwen25_state_dict,
        "colqwen3": hf_export.export_colqwen3_state_dict,
        "colqwen3_5": hf_export.export_colqwen35_state_dict,
        "colgemma3": hf_export.export_colgemma3_state_dict,
        "colmodernvbert": hf_export.export_colmodernvbert_state_dict,
        "colqwen_omni": hf_export.export_colqwen_omni_state_dict,
    }
    export_fn = exporters[args.family]
    # scan+remat: the full-scale fp32 train step (e.g. colSmol's 18 tiles x
    # 1024 SigLIP patches, full backward + Adam) exceeds one chip's HBM
    # without rematerialization
    model, variables, processor = load_retriever(
        args.checkpoint, family=args.family, dtype=jnp.float32,
        param_dtype=jnp.float32, scan_layers=True, remat=True,
    )
    # the conv-patch refold in the qwen-family exporters must use the
    # CHECKPOINT's patch geometry, not the exporter default
    export_kwargs = {}
    if args.family in ("colqwen2", "colqwen2_5", "colqwen3", "colqwen3_5", "colqwen_omni"):
        export_kwargs = {
            "patch_size": getattr(processor, "patch_size", 14),
            "temporal_patch_size": getattr(processor, "temporal_patch_size", 2),
        }
    params = variables["params"]
    if args.family == "colqwen_omni":
        # audio/video documents: the Omni gate's retrieval modalities
        import gate_families

        if args.omni_modality == "video":
            pages = gate_families.make_videos(args.pages)
            queries = [f"find the video clip with motion pattern {i}"
                       for i in range(len(pages))]
            raw_docs = processor.process_videos(pages)
        else:
            pages = gate_families.make_audios(args.pages)
            queries = [f"find the audio clip with pitch level {i}" for i in range(len(pages))]
            raw_docs = processor.process_audios(pages)
    else:
        pages = _make_pages(args.pages)
        # the SAME query construction the gate uses, so training teaches the
        # query_i <-> page_i association the gate then ranks on
        queries = (QUERIES + [f"find document page {i} quarterly report" for i in range(len(pages))])[
            : len(pages)
        ]
        raw_docs = processor.process_images(pages)
    # grid geometry / real-time stride are torch-oracle metadata, not model inputs
    doc_batch = {k: jnp.asarray(v) for k, v in raw_docs.items()
                 if k not in ("image_grid_thw", "video_grid_thw", "video_second_per_grid")}
    q_batch = {k: jnp.asarray(v) for k, v in processor.process_queries(queries).items()}
    # smooth max: at real-model scale with random weights, the hard MaxSim
    # max is won by the PROMPT tokens (identical across pages) for every
    # query token, so the image-token gradient is exactly zero and the loss
    # freezes at log(B). The smooth-max objective (the reference's
    # use_smooth_max knob) passes gradient through all doc tokens; the gate
    # itself still scores with the hard MaxSim.
    loss_fn = ColbertLoss(temperature=0.05, use_smooth_max=True, tau=0.1)
    # global-norm clip mirrors the reference trainer's grad clipping
    # (colmodel_torch_training.py:189-197); without it the qwen3_5 hybrid's
    # gated recurrence diverges to NaN within a handful of steps at lr 1e-3
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.finetune_lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            d = model.apply({"params": p}, **doc_batch)
            q = model.apply({"params": p}, **q_batch)
            return loss_fn(q, d)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, val

    for i in range(args.finetune):
        params, opt_state, val = step(params, opt_state)
        if not np.isfinite(float(val)):
            raise SystemExit(f"FAIL: finetune loss non-finite at step {i} "
                             f"(lower --finetune-lr)")
        if i % 5 == 0 or i == args.finetune - 1:
            print(f"[finetune] step {i}: loss {float(val):.4f}", flush=True)

    out_dir = args.finetune_out
    os.makedirs(out_dir, exist_ok=True)
    state = export_fn(jax.device_get(params), **export_kwargs)
    from safetensors.numpy import save_file

    save_file(
        {k: np.ascontiguousarray(v) for k, v in state.items()},
        os.path.join(out_dir, "model.safetensors"),
        metadata={"format": "pt"},
    )
    import shutil

    for fn in os.listdir(args.checkpoint):
        if fn.endswith(".json") and fn != "model.safetensors":
            shutil.copy(os.path.join(args.checkpoint, fn), os.path.join(out_dir, fn))
    backbones = os.path.join(args.checkpoint, "backbones")
    if os.path.isdir(backbones):  # modernvbert composite-config pointers
        shutil.copytree(backbones, os.path.join(out_dir, "backbones"), dirs_exist_ok=True)
    print(f"[finetune] exported trained checkpoint to {out_dir}", flush=True)


# --------------------------------------------------------------------------
# embedding + comparison
# --------------------------------------------------------------------------

def _make_pages(n: int, size=(640, 480)) -> list:
    """Strongly distinct synthetic pages: with random weights, visually
    similar pages collapse to near-identical embeddings (tied scores make
    the ranking comparison vacuous), so each page gets its own dominant
    color field + structure frequency."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(0)
    pages = []
    for i in range(n):
        hue = np.array([(37 * i) % 255, (91 * i + 60) % 255, (151 * i + 120) % 255], np.uint8)
        arr = np.tile(hue, (size[0], size[1], 1))
        # page-specific texture: checkerboard of page-dependent frequency
        f = 8 + 6 * (i % 7)
        yy, xx = np.mgrid[0 : size[0], 0 : size[1]]
        checker = (((yy // f) + (xx // f)) % 2).astype(np.uint8) * 80
        arr = np.clip(arr.astype(np.int16) + checker[..., None] - 40, 0, 255).astype(np.uint8)
        img = Image.fromarray(arr)
        draw = ImageDraw.Draw(img)
        for line in range(6 + i % 5):
            y = 20 + line * 50
            x = int(rng.integers(10, size[1] // 3))
            w = int(rng.integers(size[1] // 3, size[1] - x - 10))
            draw.rectangle([x, y, x + w, y + 12], fill=tuple(int(v) for v in rng.integers(0, 255, 3)))
        draw.text((20, 5), f"document page {i} quarterly report {i}", fill=(0, 0, 0))
        pages.append(img)
    return pages


def _embed_flax(model, params, processor, images, queries, batch_size=4,
                process_docs=None):
    import jax.numpy as jnp

    # guard against processor/model image-token-id skew (the failure mode is
    # silent: merge_image_embeddings no-ops and every page embeds the same)
    model_img_id = getattr(getattr(model, "config", None), "image_token_id", None)
    proc_img_id = getattr(processor, "image_token_id", None)
    if model_img_id is not None and proc_img_id is not None and model_img_id != proc_img_id:
        raise SystemExit(
            f"image_token_id mismatch: processor tokenizes <image> to {proc_img_id} "
            f"but the model merges at {model_img_id} — image features would be dropped"
        )

    def run(batch):
        # grid geometry / real-time stride are torch-oracle metadata; flax
        # models take the padded per-item layout (patch_mask/hpos/wpos/
        # position_ids)
        feed = {k: jnp.asarray(v) for k, v in batch.items()
                if k not in ("image_grid_thw", "video_grid_thw", "video_second_per_grid")}
        return np.asarray(model.apply({"params": params}, **feed), np.float32)

    process_docs = process_docs or processor.process_images
    doc_embs, doc_masks = [], []
    for i in range(0, len(images), batch_size):
        batch = process_docs(images[i : i + batch_size])
        out = run(batch)
        mask = np.asarray(batch["attention_mask"]).astype(bool)
        doc_embs.extend(out[j][mask[j]] for j in range(out.shape[0]))
    qb = processor.process_queries(queries)
    out = run(qb)
    mask = np.asarray(qb["attention_mask"]).astype(bool)
    q_embs = [out[j][mask[j]] for j in range(out.shape[0])]
    return q_embs, doc_embs


def _embed_torch(model, processor, images, queries, batch_size=2, feed=None,
                 process_docs=None):
    import torch

    def run(batch):
        if feed is not None:
            with torch.no_grad():
                return model(**feed(batch)).numpy()
        if "image_grid_thw" in batch and "pixel_values" in batch:
            # qwen2 dynamic resolution: torch takes CONCATENATED unpadded
            # patches + grids and computes M-RoPE internally
            pv = np.asarray(batch["pixel_values"])
            pm = np.asarray(batch["patch_mask"]).astype(bool)
            flat = np.concatenate([pv[i][pm[i]] for i in range(pv.shape[0])])
            tensors = {
                "input_ids": torch.tensor(np.asarray(batch["input_ids"])),
                "attention_mask": torch.tensor(np.asarray(batch["attention_mask"])),
                "pixel_values": torch.tensor(flat, dtype=torch.float32),
                "image_grid_thw": torch.tensor(np.asarray(batch["image_grid_thw"])),
            }
            with torch.no_grad():
                return model(**tensors).numpy()
        tensors = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if k == "pixel_values":
                # flax layout (B, T, S, S, 3) -> torch (B, T, 3, S, S);
                # 4D fixed-resolution (B, H, W, 3) -> (B, 3, H, W)
                if v.ndim == 5:
                    v = v.transpose(0, 1, 4, 2, 3)
                elif v.ndim == 4:
                    v = v.transpose(0, 3, 1, 2)
                tensors[k] = torch.tensor(v, dtype=torch.float32)
            elif k in ("tile_mask", "patch_mask", "position_ids", "rope_index",
                       "vision_hpos", "vision_wpos", "image_grid_thw"):
                tensors["pixel_attention_mask" if k == "tile_mask" else k] = None
            else:
                tensors[k] = torch.tensor(v)
        tensors = {k: v for k, v in tensors.items() if v is not None}
        with torch.no_grad():
            return model(**tensors).numpy()

    process_docs = process_docs or processor.process_images
    doc_embs = []
    for i in range(0, len(images), batch_size):
        batch = process_docs(images[i : i + batch_size])
        out = run(batch)
        mask = np.asarray(batch["attention_mask"]).astype(bool)
        doc_embs.extend(out[j][mask[j]] for j in range(out.shape[0]))
    qb = processor.process_queries(queries)
    out = run(qb)
    mask = np.asarray(qb["attention_mask"]).astype(bool)
    q_embs = [out[j][mask[j]] for j in range(out.shape[0])]
    return q_embs, doc_embs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", nargs="?", help="HF checkpoint dir")
    parser.add_argument("--family", default="colidefics3",
                        choices=["colidefics3", "colpali", "colqwen2",
                                 "colqwen2_5", "colqwen3", "colqwen3_5",
                                 "colgemma3", "colmodernvbert", "colqwen_omni"])
    parser.add_argument("--pages", type=int, default=8)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"],
                        help="flax compute/param dtype (bf16 = the serving "
                             "path; fp32 isolates pipeline faithfulness from "
                             "low-precision sensitivity, e.g. the qwen3_5 "
                             "hybrid recurrence)")
    parser.add_argument("--images", help="directory of page images (else synthetic)")
    parser.add_argument("--no-torch", action="store_true", help="skip the torch oracle")
    parser.add_argument("--out", help="append a markdown report here")
    parser.add_argument("--make-synth", nargs=2, metavar=("KIND", "DIR"),
                        help="write a random-weight real-dims checkpoint and exit")
    parser.add_argument("--finetune", type=int, default=0, metavar="STEPS",
                        help="contrastively fine-tune the checkpoint in-env for"
                             " STEPS, export to --finetune-out, and exit")
    parser.add_argument("--finetune-out", help="output dir for --finetune")
    parser.add_argument("--finetune-lr", type=float, default=3e-5)
    parser.add_argument("--omni-modality", default="audio", choices=["audio", "video"],
                        help="document modality for the colqwen_omni gate "
                             "(the reference's Omni processor serves audio "
                             "AND video documents, processing_colqwen_omni.py:123-186)")
    args = parser.parse_args()

    if args.finetune:
        if not (args.checkpoint and args.finetune_out):
            raise SystemExit("--finetune needs a checkpoint dir and --finetune-out")
        finetune_checkpoint(args)
        return

    if args.make_synth:
        import gate_families

        kind, out_dir = args.make_synth
        if kind in ("colsmol", "colsmol-tiny"):
            make_synth_colsmol(out_dir, tiny=kind.endswith("tiny"))
        elif kind == "colqwen2-tiny":
            make_synth_colqwen2(out_dir)
        elif kind == "colpali-tiny":
            make_synth_colpali(out_dir)
        elif kind in gate_families.SYNTH_MAKERS:
            gate_families.SYNTH_MAKERS[kind](out_dir)
        else:
            raise SystemExit(
                "supported --make-synth kinds: colsmol|colsmol-tiny|colqwen2-tiny|"
                "colpali-tiny|" + "|".join(sorted(gate_families.SYNTH_MAKERS))
            )
        return
    if not args.checkpoint:
        raise SystemExit("checkpoint dir required (or --make-synth)")

    import jax.numpy as jnp

    from colpali_tpu.evaluation.metrics import ndcg_at_k, recall_at_k
    from colpali_tpu.ops.maxsim import score_multi_vector

    t0 = time.time()
    process_docs_name = None
    if args.family == "colqwen_omni":
        # the Omni gate validates AUDIO or VIDEO documents end-to-end (the
        # reference's first-class non-image retrieval modalities,
        # processing_colqwen_omni.py:123-186)
        import gate_families

        if args.omni_modality == "video":
            images = gate_families.make_videos(args.pages)
            queries = [f"find the video clip with motion pattern {i}"
                       for i in range(len(images))]
            process_docs_name = "process_videos"
        else:
            images = gate_families.make_audios(args.pages)
            queries = [f"find the audio clip with pitch level {i}" for i in range(len(images))]
            process_docs_name = "process_audios"
    elif args.images:
        from PIL import Image

        files = sorted(os.listdir(args.images))[: args.pages]
        images = [Image.open(os.path.join(args.images, f)) for f in files]
    else:
        images = _make_pages(args.pages)
    if args.family != "colqwen_omni":
        queries = (QUERIES + [f"find document page {i} quarterly report" for i in range(len(images))])[
            : len(images)
        ]

    flax_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"[{time.time()-t0:5.1f}s] loading flax ({args.family}, {args.dtype})...", flush=True)
    model, params, processor = _load_flax(args.family, args.checkpoint, flax_dtype)
    process_docs = getattr(processor, process_docs_name) if process_docs_name else None
    print(f"[{time.time()-t0:5.1f}s] embedding with flax on "
          f"{jnp.zeros(1).device.platform}...", flush=True)
    q_f, d_f = _embed_flax(model, params, processor, images, queries,
                           process_docs=process_docs)
    scores_flax = np.asarray(score_multi_vector(q_f, d_f))
    print(f"[{time.time()-t0:5.1f}s] flax MaxSim matrix:\n{np.round(scores_flax, 2)}", flush=True)
    if not np.isfinite(scores_flax).all():
        raise SystemExit("FAIL: flax MaxSim matrix contains non-finite values "
                         "(all ranking metrics would be vacuously 'equal')")

    report = {
        "checkpoint": args.checkpoint,
        "family": args.family,
        "n_pages": len(images),
        "flax_diag_dominant": bool((np.argmax(scores_flax, 1) == np.arange(len(queries))).all()),
    }
    rel = [[i] for i in range(len(queries))]
    ranked_f = np.argsort(-scores_flax, axis=1)
    report["flax_ndcg@5"] = float(np.mean([ndcg_at_k(ranked_f[i], rel[i], 5) for i in range(len(rel))]))
    report["flax_recall@5"] = float(np.mean([recall_at_k(ranked_f[i], rel[i], 5) for i in range(len(rel))]))

    if not args.no_torch:
        print(f"[{time.time()-t0:5.1f}s] loading torch oracle (fp32, cpu)...", flush=True)
        oracle, origin, feed = _load_torch_oracle(args.family, args.checkpoint)
        print(f"[{time.time()-t0:5.1f}s] embedding with torch ({origin})...", flush=True)
        q_t, d_t = _embed_torch(oracle, processor, images, queries, feed=feed,
                                process_docs=process_docs)
        scores_torch = np.asarray(score_multi_vector(q_t, d_t))
        print(f"[{time.time()-t0:5.1f}s] torch MaxSim matrix:\n{np.round(scores_torch, 2)}", flush=True)
        if not np.isfinite(scores_torch).all():
            raise SystemExit("FAIL: torch MaxSim matrix contains non-finite values")
        ranked_t = np.argsort(-scores_torch, axis=1)
        report["oracle"] = origin
        report["torch_ndcg@5"] = float(np.mean([ndcg_at_k(ranked_t[i], rel[i], 5) for i in range(len(rel))]))
        report["torch_recall@5"] = float(np.mean([recall_at_k(ranked_t[i], rel[i], 5) for i in range(len(rel))]))
        report["torch_diag_dominant"] = bool((np.argmax(scores_torch, 1) == np.arange(len(queries))).all())
        report["score_max_abs_diff"] = float(np.max(np.abs(scores_flax - scores_torch)))
        report["score_rel_diff"] = float(
            np.max(np.abs(scores_flax - scores_torch) / (np.abs(scores_torch) + 1e-6))
        )
        report["ndcg@5_delta"] = abs(report["flax_ndcg@5"] - report["torch_ndcg@5"])
        report["ranking_agreement@5"] = float(np.mean(ranked_f[:, :5] == ranked_t[:, :5]))
        # position-agreement is tie-FRAGILE: near-identical scores between
        # irrelevant docs argsort differently across dtypes. top-1 agreement
        # is the tie-robust headline (the gold doc is never near-tied on a
        # separated checkpoint).
        report["top1_agreement"] = float(np.mean(ranked_f[:, 0] == ranked_t[:, 0]))

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "a") as f:
            f.write(f"\n## validate_checkpoint {args.checkpoint}\n\n")
            for k, v in report.items():
                f.write(f"- {k}: {v}\n")
            f.write(f"\nflax scores:\n```\n{np.round(scores_flax, 2)}\n```\n")
            if not args.no_torch:
                f.write(f"torch scores:\n```\n{np.round(scores_torch, 2)}\n```\n")

    if not args.no_torch:
        if report["ndcg@5_delta"] > 0.1:
            raise SystemExit(f"FAIL: nDCG@5 delta {report['ndcg@5_delta']:.3f} > 0.1")
        if report["torch_diag_dominant"] and not report["flax_diag_dominant"]:
            raise SystemExit("FAIL: torch is diagonal-dominant but flax is not")
        print(f"PASS: nDCG@5 delta {report['ndcg@5_delta']:.3f} <= 0.1, "
              f"max score diff {report['score_max_abs_diff']:.3f}")


if __name__ == "__main__":
    main()
