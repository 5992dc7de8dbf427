#!/usr/bin/env python
"""Embed a directory of page images into multi-vector embeddings (.npz).

The offline half of the serving path: checkpoint + images -> ragged per-page
embeddings consumed by `scripts/serve.py` / `CorpusIndex` /
`scripts/compute_hardnegs.py`.
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
import os

import numpy as np

def _families():
    from colpali_tpu.auto import _REGISTRY

    return sorted(_REGISTRY) + ["auto"]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("family", choices=_families(),
                        help="model family, or 'auto' to detect from config.json")
    parser.add_argument("checkpoint_dir")
    parser.add_argument("image_dir")
    parser.add_argument("output", help="output .npz (keys emb_<i> + files.json alongside)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--pool-factor", type=int, default=1,
                        help="token pooling factor (3 = the reference's ~3x "
                             "storage compression; 1 = no pooling)")
    parser.add_argument("--pooler", choices=["ward", "kmeans"], default="ward",
                        help="ward = reference-exact scipy hierarchical pooling (host); "
                             "kmeans = batched on-device spherical k-means")
    parser.add_argument("--save-index", metavar="PATH.npz",
                        help="additionally build a packed CorpusIndex on device "
                             "(DeviceIndexBuilder) and persist it — serve.py boots "
                             "from it directly")
    parser.add_argument("--index-doc-tokens", type=int, default=None,
                        help="token budget per doc for --save-index (default: max "
                             "pooled length rounded up)")
    parser.add_argument("--index-prefilter", action="store_true",
                        help="include the binary sign-sketch prefilter in --save-index")
    parser.add_argument("--index-coarse-pool", type=int, default=1,
                        help="sketch-only token pooling factor for the prefilter "
                             "(the coarse pass is compute-bound, so ops and bytes "
                             "shrink by the factor; rerank stays exact — validate "
                             "candidate quality with CorpusIndex.estimate_recall)")
    parser.add_argument("--quantize", action="store_true",
                        help="w8-static serving: store eligible Dense kernels int8 "
                             "(1.3-1.4x faster 3B forward, half the weight HBM; docs/PERF.md)")
    parser.add_argument("--transport", choices=["rgb-u8", "yuv420", "gray"],
                        help="fused low-byte ingestion (fixed-resolution families "
                             "only): u8 pixels on the wire, decode+normalize+forward "
                             "in one dispatch (retrieval/ingest.py; docs/PERF.md "
                             "round-4 e2e table)")
    parser.add_argument("--chunk", type=int, default=1,
                        help="with --transport: forward batches folded into one "
                             "device dispatch (4 amortizes remote-link RPC cost)")
    parser.add_argument("--reducing-gap", type=float, default=None,
                        help="with --transport: PIL box pre-reduce for the host "
                             "resize (1.0 halves bicubic cost on ~4x downscales)")
    parser.add_argument("--modality", choices=["image", "audio", "video"], default="image",
                        help="audio: embed .wav documents via process_audios; "
                             "video: embed video documents via process_videos "
                             "(both ColQwen-Omni; image_dir holds .wav, or video "
                             "files / .npy uint8 (T,H,W,3) frame stacks)")
    args = parser.parse_args()

    from PIL import Image

    from colpali_tpu.auto import load_retriever
    from colpali_tpu.evaluation.evaluator import embed_dataset

    model, variables, processor = load_retriever(
        args.checkpoint_dir, family=None if args.family == "auto" else args.family,
        quantize=args.quantize,
    )

    if args.modality == "audio":
        from colpali_tpu.utils.audio import load_wav

        if not hasattr(processor, "process_audios"):
            parser.error(f"--modality audio requires an audio-capable family "
                         f"(ColQwen-Omni); {type(processor).__name__} has no "
                         f"process_audios")
        if args.transport:
            parser.error("--transport applies to image corpora only")
        files = sorted(
            f for f in os.listdir(args.image_dir) if f.lower().endswith(".wav")
        )
        waveforms = [load_wav(os.path.join(args.image_dir, f)) for f in files]
        embeddings = embed_dataset(model.apply, variables, processor, waveforms,
                                   batch_size=args.batch_size, kind="audios")
        _write_outputs(args, files, embeddings)
        return

    if args.modality == "video":
        if not hasattr(processor, "process_videos"):
            parser.error(f"--modality video requires a video-capable family "
                         f"(ColQwen-Omni); {type(processor).__name__} has no "
                         f"process_videos")
        if args.transport:
            parser.error("--transport applies to image corpora only")
        video_exts = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".gif", ".npy")
        files = sorted(
            f for f in os.listdir(args.image_dir) if f.lower().endswith(video_exts)
        )
        # .npy = raw (T, H, W, 3) uint8 frame stacks (hermetic path, no codec
        # dependency); everything else decodes via utils/video.load_video_frames
        videos = [
            np.load(os.path.join(args.image_dir, f)) if f.lower().endswith(".npy")
            else os.path.join(args.image_dir, f)
            for f in files
        ]
        embeddings = embed_dataset(model.apply, variables, processor, videos,
                                   batch_size=args.batch_size, kind="videos")
        _write_outputs(args, files, embeddings)
        return

    files = sorted(
        f for f in os.listdir(args.image_dir) if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    images = [Image.open(os.path.join(args.image_dir, f)) for f in files]
    if args.transport:
        from colpali_tpu.retrieval import embed_pages_fused

        if not hasattr(processor, "image_size") or not hasattr(processor, "visual_prompt_prefix"):
            parser.error("--transport requires a fixed-resolution processor "
                         "(the ColPali/PaliGemma family)")
        embeddings = embed_pages_fused(
            model.apply, variables, processor, images,
            transport=args.transport, batch_size=args.batch_size,
            chunk=args.chunk, reducing_gap=args.reducing_gap,
        )
    else:
        embeddings = embed_dataset(model.apply, variables, processor, images,
                                   batch_size=args.batch_size, is_images=True)
    _write_outputs(args, files, embeddings)


def _write_outputs(args, files, embeddings) -> None:
    """Pool (optional), save ragged .npz + files.json, build --save-index."""
    if args.pool_factor > 1:
        from colpali_tpu.compression.token_pooling import (
            HierarchicalTokenPooler,
            KMeansTokenPooler,
        )

        pooler = KMeansTokenPooler() if args.pooler == "kmeans" else HierarchicalTokenPooler()
        before = sum(e.shape[0] for e in embeddings)
        embeddings = pooler.pool_embeddings(embeddings, pool_factor=args.pool_factor)
        after = sum(e.shape[0] for e in embeddings)
        print(f"Pooled {before} -> {after} tokens (factor {args.pool_factor}, {args.pooler})")

    np.savez(args.output, **{f"emb_{i}": e for i, e in enumerate(embeddings)})
    import json

    with open(args.output + ".files.json", "w") as f:
        json.dump(files, f)
    print(f"Embedded {len(files)} pages -> {args.output}")

    if args.save_index:
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder
        from colpali_tpu.utils.tensor_utils import pad_sequences

        doc_tokens = args.index_doc_tokens or max(e.shape[0] for e in embeddings)
        builder = DeviceIndexBuilder(
            doc_tokens=doc_tokens, dim=embeddings[0].shape[-1], dtype="int8",
            prefilter="binary" if args.index_prefilter else None,
            coarse_pool=args.index_coarse_pool,
        )
        for i in range(0, len(embeddings), 256):
            chunk = embeddings[i : i + 256]
            builder.add(jnp.asarray(pad_sequences(chunk, pad_to=doc_tokens)))
        index = builder.build()
        index.save(args.save_index)
        with open(args.save_index + ".files.json", "w") as f:
            json.dump(files, f)
        print(f"Packed index ({index.nbytes/2**20:.1f} MiB) saved to {args.save_index}")


if __name__ == "__main__":
    main()
