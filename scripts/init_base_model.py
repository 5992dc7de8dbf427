#!/usr/bin/env python
"""Initialize a "base" retriever checkpoint from a backbone checkpoint.

Mirror of /root/reference/scripts/init_base_model.py:1-104: load a backbone
(e.g. a PaliGemma/Qwen-VL HF checkpoint), attach a randomly-initialized
projection head, and save the combined params so training runs start from a
well-defined artifact.
"""

from __future__ import annotations

# When run from a source checkout without installation, make the repo root
# importable (an installed colpali_tpu still wins: this is an append).
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse

LOADERS = {
    "colpali": ("load_colpali_params", "colpali_tpu.models.ColPali", "colpali_tpu.models.PaliGemmaConfig"),
    "colqwen2": ("load_colqwen2_params", "colpali_tpu.models.ColQwen2", "colpali_tpu.models.Qwen2VLConfig"),
    "colqwen2_5": ("load_colqwen25_params", "colpali_tpu.models.ColQwen2_5", "colpali_tpu.models.Qwen25VLConfig"),
    "colqwen3": ("load_colqwen3_params", "colpali_tpu.models.ColQwen3", "colpali_tpu.models.Qwen3VLConfig"),
    "colidefics3": ("load_colidefics3_params", "colpali_tpu.models.ColIdefics3", "colpali_tpu.models.Idefics3Config"),
    "colgemma3": ("load_colgemma3_params", "colpali_tpu.models.ColGemma3", "colpali_tpu.models.Gemma3Config"),
}


def main() -> None:
    parser = argparse.ArgumentParser(description="Create a base Col* checkpoint from an HF backbone.")
    parser.add_argument("family", choices=sorted(LOADERS))
    parser.add_argument("backbone_dir", help="HF checkpoint directory (config.json + *.safetensors)")
    parser.add_argument("output_dir")
    parser.add_argument("--dim", type=int, default=None, help="Projection dim (family default if omitted)")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    import importlib

    import jax
    import jax.numpy as jnp

    from colpali_tpu.core import hf_loader
    from colpali_tpu.training.checkpointing import save_pretrained

    loader_name, model_path, config_path = LOADERS[args.family]
    loader = getattr(hf_loader, loader_name)

    def resolve(p):
        mod, _, attr = p.rpartition(".")
        return getattr(importlib.import_module(mod), attr)

    model_cls = resolve(model_path)
    config_cls = resolve(config_path)

    hf_config = hf_loader.load_hf_config(args.backbone_dir)
    config = config_cls.from_hf_config(hf_config)
    params = loader(args.backbone_dir, strict=False)

    model_kwargs = {"dim": args.dim} if args.dim else {}
    model = model_cls(config, **model_kwargs)

    # random-init the head only (gaussian, reference init_base_model.py)
    hidden = getattr(config.text, "hidden_size", None) or config.text.hidden_size
    dim = args.dim or model.dim
    key = jax.random.PRNGKey(args.seed)
    proj_name = "linear" if args.family == "colidefics3" else "custom_text_proj"
    params["head"] = {
        proj_name: {
            "kernel": jax.random.normal(key, (hidden, dim), jnp.float32) * 0.02,
            "bias": jnp.zeros((dim,), jnp.float32),
        }
    }
    save_pretrained(args.output_dir, params, config=config, extra_metadata={"family": args.family})
    print(f"Saved base {args.family} checkpoint to {args.output_dir}")


if __name__ == "__main__":
    main()
