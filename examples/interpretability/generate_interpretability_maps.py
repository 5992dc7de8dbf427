"""End-to-end similarity-map demo (reference
examples/interpretability/*/generate_interpretability_maps.py): embed a page
and a query with a Col* model, compute per-query-token similarity maps, and
save heatmap overlays as PNGs.

Runs hermetically by default (tiny random ColPali + synthetic page) so the
pipeline is demonstrable without checkpoints; pass ``--checkpoint`` for a
real model.

Usage:
    python examples/interpretability/generate_interpretability_maps.py out/
    python examples/interpretability/generate_interpretability_maps.py out/ \
        --checkpoint ./checkpoints/colpali-v1.2 --image page.png \
        --query "quarterly revenue"
"""

from __future__ import annotations

# When run from a source checkout without installation, make the repo root
# importable (an installed colpali_tpu still wins: this is an append).
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[2])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse
from pathlib import Path

import jax
import numpy as np


def _tiny_demo_inputs():
    """Hermetic: tiny random ColPali + a structured synthetic page."""
    import jax.numpy as jnp

    from colpali_tpu.models import ColPali
    from colpali_tpu.utils.testing import DUMMY_IMAGE_TOKEN_ID, DummyProcessor, tiny_colpali_config

    config = tiny_colpali_config()
    model = ColPali(config, dim=16)
    processor = DummyProcessor(image_size=config.vision.image_size)

    rng = np.random.default_rng(0)
    page = np.full((112, 112, 3), 245, np.uint8)
    page[20:40, 10:100] = (40, 40, 180)  # a "title bar"
    page[60:100, 10:55] = (200, 60, 40)  # a "figure"

    batch_doc = processor.process_images([page])
    batch_query = processor.process_queries(queries=["where is the figure?"])

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_doc["input_ids"]),
        jnp.asarray(batch_doc["attention_mask"]),
        jnp.asarray(batch_doc["pixel_values"]),
    )

    def embed(batch):
        return np.asarray(
            model.apply(
                variables,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["pixel_values"]) if "pixel_values" in batch else None,
            )
        )

    side = config.vision.image_size // config.vision.patch_size
    image_mask = np.asarray(batch_doc["input_ids"] == DUMMY_IMAGE_TOKEN_ID)
    return embed(batch_doc), embed(batch_query), (side, side), image_mask, page


class _WordTok:
    """Offline word/special-token-level tokenizer for the hermetic demos."""

    pad_token = "<pad>"
    bos_token = "<bos>"
    eos_token = "<eos>"

    def __init__(self):
        self.vocab = {}

    def convert_tokens_to_ids(self, token):
        return self.vocab.setdefault(token, len(self.vocab))

    def __call__(self, texts, padding=None, padding_side="left",
                 add_special_tokens=False, return_tensors=None):
        import re

        enc = []
        for t in texts:
            ids = []
            for p in re.split(r"(<[^<>]+>|\n)", t):
                for word in [p] if (p.startswith("<") or p == "\n") else p.split():
                    if word:
                        ids.append(self.convert_tokens_to_ids(word))
            enc.append(ids)
        m = max(len(e) for e in enc)
        ids = np.zeros((len(enc), m), np.int64)
        mask = np.zeros((len(enc), m), np.int64)
        for i, e in enumerate(enc):
            ids[i, m - len(e):] = e
            mask[i, m - len(e):] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_gemma3_inputs():
    """Hermetic ColGemma3 demo: chat-template prompting, pooled-grid maps
    (reference examples/interpretability/colgemma/generate_interpretability_maps.py:1-243,
    with the map grid matching the pooled soft-token count — see
    ColGemma3Processor.get_n_patches)."""
    import jax.numpy as jnp

    from colpali_tpu.models.configs import SiglipVisionConfig
    from colpali_tpu.models.gemma3 import ColGemma3, Gemma3Config, Gemma3TextConfig
    from colpali_tpu.processors import ColGemma3Processor

    proc = ColGemma3Processor(_WordTok(), image_size=112, patch_size=14,
                              image_seq_length=16)
    config = Gemma3Config(
        vision=SiglipVisionConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                                  num_attention_heads=4, image_size=112, patch_size=14),
        text=Gemma3TextConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                              head_dim=8, query_pre_attn_scalar=8.0, sliding_window=8,
                              sliding_window_pattern=2, rope_scaling_factor=1.0),
        mm_tokens_per_image=16,  # 8x8 SigLIP grid pooled to 4x4 soft tokens
        image_token_index=proc.image_token_id,
    )
    model = ColGemma3(config, dim=16)

    page = np.full((112, 112, 3), 245, np.uint8)
    page[20:40, 10:100] = (40, 40, 180)  # a "title bar"
    page[60:100, 10:55] = (200, 60, 40)  # a "figure"

    batch_doc = proc.process_images([page])
    batch_query = proc.process_queries(queries=["where is the figure?"])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_doc["input_ids"]),
        jnp.asarray(batch_doc["attention_mask"]),
        jnp.asarray(batch_doc["pixel_values"]),
    )

    def embed(batch):
        return np.asarray(model.apply(
            variables,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["pixel_values"]) if "pixel_values" in batch else None,
        ))

    n_patches = proc.get_n_patches((page.shape[0], page.shape[1]))
    image_mask = proc.get_image_mask(batch_doc)
    return embed(batch_doc), embed(batch_query), n_patches, image_mask, page


def _tiny_splitimage_inputs():
    """Hermetic split-image demo: tiny random ColModernVBert, tile-aware maps
    (reference examples/interpretability/colmodernvbert)."""
    import jax.numpy as jnp

    from colpali_tpu.interpretability.split_image import get_split_image_similarity_maps
    from colpali_tpu.models.configs import SiglipVisionConfig
    from colpali_tpu.models.modernvbert import (
        ColModernVBert,
        ModernBertTextConfig,
        ModernVBertConfig,
    )
    from colpali_tpu.processors import ColModernVBertProcessor

    proc = ColModernVBertProcessor(_WordTok(), tile_size=16, longest_edge=32, image_seq_len=4)
    config = ModernVBertConfig(
        vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                                  num_attention_heads=2, image_size=16, patch_size=4),
        text=ModernBertTextConfig(vocab_size=256, hidden_size=24, intermediate_size=32,
                                  num_hidden_layers=2, num_attention_heads=2, local_attention=4),
        pixel_shuffle_factor=2, additional_vocab_size=8,
        image_token_id=proc.image_token_id,
    )
    model = ColModernVBert(config, dim=16)

    page = np.full((28, 24, 3), 245, np.uint8)
    page[4:10, 2:22] = (40, 40, 180)
    page[14:24, 2:11] = (200, 60, 40)

    batch_doc = proc.process_images([page])
    batch_query = proc.process_queries(queries=["where is the figure?"])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_doc["input_ids"]),
        jnp.asarray(batch_doc["attention_mask"]),
        jnp.asarray(batch_doc["pixel_values"]),
    )
    doc_emb = np.asarray(model.apply(
        variables, jnp.asarray(batch_doc["input_ids"]), jnp.asarray(batch_doc["attention_mask"]),
        jnp.asarray(batch_doc["pixel_values"])))
    q_emb = np.asarray(model.apply(
        variables, jnp.asarray(batch_query["input_ids"]), jnp.asarray(batch_query["attention_mask"])))

    n_patches = proc.get_n_patches((page.shape[0], page.shape[1]))
    local_mask = proc.get_local_image_mask(batch_doc)
    maps = get_split_image_similarity_maps(
        doc_emb, q_emb, n_patches, local_mask, proc.image_seq_len
    )[0]
    return maps, page


def _checkpoint_inputs(checkpoint: str, image_path: str, query: str):
    import jax.numpy as jnp
    from PIL import Image

    from colpali_tpu.core.hf_loader import load_colpali_params
    from colpali_tpu.models import ColPali, PaliGemmaConfig
    from colpali_tpu.processors import ColPaliProcessor

    processor = ColPaliProcessor.from_pretrained(checkpoint)
    params = load_colpali_params(checkpoint)
    model = ColPali(PaliGemmaConfig(), dim=128, dtype=jnp.bfloat16)
    page = Image.open(image_path).convert("RGB")

    batch_doc = processor.process_images([page])
    batch_query = processor.process_queries(queries=[query])

    def embed(batch):
        return np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["pixel_values"]) if "pixel_values" in batch else None,
            ),
            dtype=np.float32,
        )

    n_patches = processor.get_n_patches((page.height, page.width))
    image_mask = processor.get_image_mask(batch_doc)
    return embed(batch_doc), embed(batch_query), n_patches, image_mask, np.asarray(page)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output_dir")
    parser.add_argument("--checkpoint", default=None, help="ColPali checkpoint dir (default: tiny random demo)")
    parser.add_argument("--image", default=None, help="page image (required with --checkpoint)")
    parser.add_argument("--query", default="where is the figure?")
    parser.add_argument("--max-tokens", type=int, default=4, help="max query tokens to plot")
    parser.add_argument("--family", default="colpali",
                        choices=["colpali", "colmodernvbert", "colgemma3"],
                        help="colmodernvbert = tile-split maps; colgemma3 = "
                             "chat-template pooled-grid maps (reference colgemma example)")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from colpali_tpu.interpretability import (
        get_similarity_maps_from_embeddings,
        plot_similarity_map,
    )

    if args.family == "colmodernvbert":
        maps, page = _tiny_splitimage_inputs()
    elif args.family == "colgemma3":
        doc_emb, q_emb, n_patches, image_mask, page = _tiny_gemma3_inputs()
        maps = get_similarity_maps_from_embeddings(doc_emb, q_emb, n_patches, image_mask)[0]
    elif args.checkpoint:
        doc_emb, q_emb, n_patches, image_mask, page = _checkpoint_inputs(
            args.checkpoint, args.image, args.query
        )
        maps = get_similarity_maps_from_embeddings(doc_emb, q_emb, n_patches, image_mask)[0]
    else:
        doc_emb, q_emb, n_patches, image_mask, page = _tiny_demo_inputs()
        maps = get_similarity_maps_from_embeddings(doc_emb, q_emb, n_patches, image_mask)[0]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for tok in range(min(args.max_tokens, maps.shape[0])):
        fig, _ = plot_similarity_map(page, maps[tok])
        path = out / f"similarity_map_token{tok}.png"
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {path} (map max={maps[tok].max():.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
