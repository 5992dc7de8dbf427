"""Link-optimized page ingestion: the production form of the fused
embed pipeline measured in perf/embed_bench.py (docs/PERF.md "the e2e
north star is MEASURED").

The standard path (`evaluation.evaluator.embed_dataset`) uploads RGB u8
and runs preprocess + forward as separate dispatches. For fixed-resolution
processors (the ColPali/PaliGemma family) this module goes further, and is
how 2,644 pages/min/chip color-preserving (2,810 luma-only) was measured
on one v5e chip behind a shared, bandwidth-variable host link:

- host staging is all PIL-C-speed (`stage_yuv420` / `stage_gray`,
  processors/image_processing.py): resize (optionally with a box
  pre-reduce) + fixed-point BT.601 convert + BOX chroma subsample;
- the wire carries u8 YUV420 (half the RGB bytes) or luma-only gray
  (a third) instead of RGB, packed into ONE contiguous upload buffer per
  group (`pack_yuv420_group`) — a second transfer per group costs a
  serialization pass that competes with compute on a shared tunnel
  (measured +2 s over 256 pages);
- pixel decode + normalize + model forward fuse into ONE jit, and
  ``chunk`` forward batches fold into ONE device dispatch via ``lax.map``
  (each dispatch costs 10-40 ms RPC on remote-attached chips);
- staging runs on a prefetch thread; uploads are async.

No reference counterpart: colpali-engine preprocesses one image at a time
inside DataLoader workers and feeds the GPU over PCIe
(/root/reference/colpali_engine/models/paligemma/colpali/processing_colpali.py:50-61).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TRANSPORTS = ("rgb-u8", "yuv420", "gray")


def embed_pages_fused(
    model_apply: Callable,
    variables: Any,
    processor: Any,
    pages: Sequence[Any],
    *,
    transport: str = "yuv420",
    batch_size: int = 8,
    chunk: int = 1,
    reducing_gap: Optional[float] = None,
    prompt: Optional[str] = None,
) -> List[np.ndarray]:
    """Embed ``pages`` (PIL images / arrays) -> per-page ``(n_tokens, dim)``
    float32 embeddings, via the fused low-byte ingestion pipeline.

    Requires a fixed-resolution processor exposing ``image_size``,
    ``image_mean``/``image_std``, ``visual_prompt_prefix``,
    ``_expand_image_prompt`` and ``_tokenize`` (the ColPali family). All
    pages share one static prompt, so input_ids upload exactly once.

    transport: ``"yuv420"`` (color, half the RGB wire bytes), ``"gray"``
        (luma only, a third — document corpora are overwhelmingly
        achromatic), or ``"rgb-u8"`` (exact RGB).
    chunk: forward batches folded into one device dispatch (``lax.map``).
    reducing_gap: PIL box pre-reduce for the host resize (1.0 halves the
        bicubic cost on ~4x downscales; None = exact single-pass bicubic).
    """
    from colpali_tpu.data.prefetch import prefetch
    from colpali_tpu.processors.image_processing import (
        host_resize_rgb,
        normalize_pixels,
        pack_yuv420_group,
        stage_gray,
        stage_yuv420,
        unpack_yuv420,
        yuv420_to_rgb,
    )

    if transport not in TRANSPORTS:
        raise ValueError(f"transport must be one of {TRANSPORTS}, got {transport!r}")
    if not pages:
        return []
    size = int(processor.image_size)
    mean, std = processor.image_mean, processor.image_std

    tok = processor._tokenize(
        [processor._expand_image_prompt(prompt or processor.visual_prompt_prefix)]
        * batch_size
    )
    ids = jnp.asarray(np.asarray(tok["input_ids"]))
    att = jnp.asarray(np.asarray(tok["attention_mask"]))
    mask_row = np.asarray(tok["attention_mask"])[0].astype(bool)

    group_pages = batch_size * chunk
    n_pages = len(pages)
    n_groups = -(-n_pages // group_pages)

    def stage(g: int):
        group = list(pages[g * group_pages : (g + 1) * group_pages])
        while len(group) < group_pages:  # pad the final group; rows sliced off below
            group.append(group[-1])
        if transport == "yuv420":
            planes = [stage_yuv420(p, (size, size), reducing_gap=reducing_gap) for p in group]
            buf = np.empty((chunk, batch_size, size * size * 3 // 2), np.uint8)
            return {"yuv": jnp.asarray(pack_yuv420_group(planes, buf, size))}
        if transport == "gray":
            y = np.stack([stage_gray(p, (size, size), reducing_gap=reducing_gap) for p in group])
            return {"y": jnp.asarray(y.reshape(chunk, batch_size, size, size))}
        rgb = np.stack([host_resize_rgb(p, (size, size), reducing_gap=reducing_gap) for p in group])
        return {"rgb": jnp.asarray(rgb.reshape(chunk, batch_size, size, size, 3))}

    def decode(pix):
        if transport == "yuv420":
            x = yuv420_to_rgb(*unpack_yuv420(pix["yuv"], size))
        elif transport == "gray":
            x = jnp.repeat(pix["y"].astype(jnp.float32)[..., None], 3, axis=-1)
        else:
            x = pix["rgb"].astype(jnp.float32)
        return normalize_pixels(x, mean, std)

    def forward_one(variables, pix):
        return model_apply(
            variables, input_ids=ids, attention_mask=att, pixel_values=decode(pix)
        )

    if chunk == 1:
        @jax.jit
        def apply_many(variables, stacked):
            return forward_one(variables, {k: v[0] for k, v in stacked.items()})[None]
    else:
        @jax.jit
        def apply_many(variables, stacked):
            return jax.lax.map(lambda b: forward_one(variables, b), stacked)

    out: List[np.ndarray] = []
    for stacked in prefetch((stage(g) for g in range(n_groups)), buffer_size=2):
        emb = np.asarray(apply_many(variables, stacked), np.float32)  # (chunk, B, S, D)
        emb = emb.reshape(-1, emb.shape[-2], emb.shape[-1])
        for row in emb:
            if len(out) < n_pages:
                out.append(row[mask_row])
    return out
