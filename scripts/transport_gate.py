#!/usr/bin/env python
"""Wire-transport QUALITY gate: what do the bandwidth-saving pixel formats
(yuv420: half the host->device bytes; gray: a third) cost in retrieval
quality?

The e2e embed bench (perf/embed_bench.py --transport ...) measures their
THROUGHPUT; this gate measures the other column of the table: MaxSim-score
and nDCG deltas per transport, on two page sets chosen to bracket the risk:

- ``typical``   — document pages whose discriminating structure is luminance
                  (text layout, bar positions) PLUS colored figures: the
                  ViDoRe-like common case.
- ``colorcrit`` — the adversarial case for luma-only transports: pages that
                  are pixel-identical EXCEPT one large colored figure whose
                  colors are constructed ISO-LUMINANT (equal BT.601 luma,
                  chroma rotated on a fixed-Y circle). ``gray`` collapses
                  these pages to (near-)identical pixels by construction, so
                  any transport that discards chroma must fail here — the
                  gate quantifies by exactly how much.

Method (mirrors the family checkpoint gate, scripts/validate_checkpoint.py):
a tiny random ColPali checkpoint is contrastively finetuned IN-ENV on each
page set through the production rgb pipeline until query_i ranks page_i
first; then the SAME pages are re-embedded through each wire transport's
decode chain (the one perf/embed_bench.py's fused path runs on device:
stage_yuv420 -> yuv420_to_rgb -> normalize / stage_gray -> luma-replicate ->
normalize — colpali_tpu/processors/image_processing.py) and scored against
the text queries. Reported per (set, transport):

- nDCG@5 / recall@1 (gold for query i is page i),
- max-abs / max-rel MaxSim score delta vs the full-color fp32 baseline,
- inter-doc separability: the spread of off-diagonal score gaps, which
  collapses to ~0 when a transport destroys the only discriminating signal
  (deterministic — unlike ranking metrics at near-tied scores).

Usage:
    python scripts/transport_gate.py [--pages 6] [--steps 150] [--out MD]

Prints one JSON object; exits nonzero if a color-preserving transport
(rgb-u8, yuv420) degrades ranking on EITHER set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TRANSPORTS = ("rgb-u8", "yuv420", "gray")


def make_typical_pages(n: int, size=(640, 480)) -> list:
    """Luma-discriminative pages with colored figures (the common case):
    per-page text-bar layout + a colored chart block."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(0)
    pages = []
    for i in range(n):
        img = Image.new("RGB", (size[1], size[0]), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        for line in range(5 + i % 5):  # page-specific line layout (luma signal)
            y = 20 + line * (40 + 7 * (i % 3))
            x = int(rng.integers(10, size[1] // 3))
            w = int(rng.integers(size[1] // 3, size[1] - x - 10))
            draw.rectangle([x, y, x + w, y + 10], fill=(30, 30, 30))
        hue = ((37 * i) % 200 + 30, (91 * i + 60) % 200 + 30, (151 * i + 120) % 200 + 30)
        draw.rectangle([size[1] // 2, size[0] // 2, size[1] - 30, size[0] - 30], fill=hue)
        draw.text((20, 4), f"document page {i}", fill=(0, 0, 0))
        pages.append(img)
    return pages


def _iso_luma_colors(n: int, y: float = 128.0, radius: float = 45.0) -> list:
    """n RGB u8 colors with EQUAL BT.601 luma: chroma rotated on a fixed-Y
    circle in YUV space, converted with the same full-range BT.601 matrix the
    wire format uses (image_processing._YUV_FWD inverse). Rounding to u8
    perturbs the realized luma by <=1 step — below any structural signal."""
    colors = []
    for i in range(n):
        a = 2 * np.pi * i / n
        u, v = radius * np.cos(a), radius * np.sin(a)
        r = y + 1.402 * v
        g = y - 0.344136 * u - 0.714136 * v
        b = y + 1.772 * u
        colors.append(tuple(int(np.clip(round(c), 0, 255)) for c in (r, g, b)))
    return colors


def make_colorcrit_pages(n: int, size=(640, 480)) -> list:
    """Pages identical EXCEPT one large figure whose color is iso-luminant:
    the colored figure is the ONLY discriminator, and it carries zero luma
    signal — the worst case for a chroma-discarding transport."""
    from PIL import Image, ImageDraw

    pages = []
    for color in _iso_luma_colors(n):
        img = Image.new("RGB", (size[1], size[0]), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        for line in range(8):  # FIXED layout: identical on every page
            y = 30 + line * 44
            draw.rectangle([30, y, size[1] - 60, y + 10], fill=(30, 30, 30))
        draw.rectangle([60, 400, size[1] - 60, size[0] - 30], fill=color)
        draw.text((20, 4), "document page", fill=(0, 0, 0))
        pages.append(img)
    return pages


def _transport_pixels(pages, size: int, mean, std, transport: str) -> np.ndarray:
    """Stage pages through a wire transport's host+device chain and return
    normalized (B, S, S, 3) float32 pixel_values — exactly the fused e2e
    ingestion decode (perf/embed_bench.py run_e2e_fused)."""
    import jax.numpy as jnp

    from colpali_tpu.processors.image_processing import (
        host_resize_rgb,
        normalize_pixels,
        stage_gray,
        stage_yuv420,
        yuv420_to_rgb,
    )

    if transport == "yuv420":
        planes = [stage_yuv420(p, (size, size)) for p in pages]
        y = jnp.asarray(np.stack([p[0] for p in planes]))
        uv = jnp.asarray(np.stack([p[1] for p in planes]))
        x = yuv420_to_rgb(y, uv)
    elif transport == "gray":
        y = np.stack([stage_gray(p, (size, size)) for p in pages])
        x = jnp.repeat(jnp.asarray(y).astype(jnp.float32)[..., None], 3, axis=-1)
    else:  # rgb-u8: full-color u8 wire (the resize itself is shared by all)
        x = jnp.asarray(np.stack([host_resize_rgb(p, (size, size)) for p in pages])
                        ).astype(jnp.float32)
    return np.asarray(normalize_pixels(x, mean, std), np.float32)


def run_set(set_name: str, pages, args, model, params0, processor, loss_fn, tx):
    import jax
    import jax.numpy as jnp
    import optax

    from colpali_tpu.evaluation.metrics import ndcg_at_k, recall_at_k
    from colpali_tpu.ops.maxsim import score_multi_vector

    queries = [f"find document page {i} quarterly report" for i in range(len(pages))]
    doc_batch = {k: jnp.asarray(v) for k, v in processor.process_images(pages).items()}
    q_batch = {k: jnp.asarray(v) for k, v in processor.process_queries(queries).items()}

    # --- in-env contrastive finetune on the fp32 rgb baseline pixels (the
    # production processor path) until query_i <-> page_i separates
    params, opt_state = params0, tx.init(params0)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            d = model.apply({"params": p}, **doc_batch)
            q = model.apply({"params": p}, **q_batch)
            return loss_fn(q, d)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, val

    for i in range(args.steps):
        params, opt_state, val = step(params, opt_state)
    print(f"[{set_name}] finetune final loss {float(val):.4f}", flush=True)

    def embed(batch):
        out = np.asarray(model.apply({"params": params}, **batch), np.float32)
        mask = np.asarray(batch["attention_mask"]).astype(bool)
        return [out[j][mask[j]] for j in range(out.shape[0])]

    q_embs = embed(q_batch)
    base_scores = np.asarray(score_multi_vector(q_embs, embed(doc_batch)))
    size = int(doc_batch["pixel_values"].shape[1])
    mean, std = processor.image_mean, processor.image_std

    n = len(pages)
    rel = [[i] for i in range(n)]
    results = {}
    for transport in TRANSPORTS:
        pix = _transport_pixels(pages, size, mean, std, transport)
        batch_t = dict(doc_batch, pixel_values=jnp.asarray(pix))
        scores = np.asarray(score_multi_vector(q_embs, embed(batch_t)))
        ranked = np.argsort(-scores, axis=1)
        # separability: worst-case margin of the gold page over its best
        # competitor — collapses to ~0 when the transport destroys the only
        # discriminating signal (deterministic, unlike argmax at near-ties)
        margins = [
            scores[i, i] - max(scores[i, j] for j in range(n) if j != i)
            for i in range(n)
        ]
        results[transport] = {
            "ndcg@5": float(np.mean([ndcg_at_k(ranked[i], rel[i], 5) for i in range(n)])),
            "recall@1": float(np.mean([recall_at_k(ranked[i], rel[i], 1) for i in range(n)])),
            "score_max_abs_delta": float(np.max(np.abs(scores - base_scores))),
            "score_max_rel_delta": float(
                np.max(np.abs(scores - base_scores) / (np.abs(base_scores) + 1e-6))
            ),
            "min_gold_margin": float(min(margins)),
        }
        print(f"[{set_name}] {transport:7s}: " + " ".join(
            f"{k}={v:.4f}" for k, v in results[transport].items()), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=6)
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--checkpoint", help="tiny colpali ckpt dir (else generated)")
    parser.add_argument("--out", help="append a markdown report here")
    args = parser.parse_args()

    import tempfile

    import jax.numpy as jnp
    import optax

    import validate_checkpoint as vc
    from colpali_tpu.auto import load_retriever
    from colpali_tpu.losses import ColbertLoss

    ckpt = args.checkpoint
    if not ckpt:
        ckpt = os.path.join(tempfile.mkdtemp(prefix="transport_gate_"), "colpali-tiny")
        vc.make_synth_colpali(ckpt)
    model, variables, processor = load_retriever(
        ckpt, family="colpali", dtype=jnp.float32, param_dtype=jnp.float32
    )
    # smooth-max objective for gradient through all doc tokens; the gate
    # itself scores with the hard MaxSim (same rationale as the family gate)
    loss_fn = ColbertLoss(temperature=0.05, use_smooth_max=True, tau=0.1)
    tx = optax.adam(args.lr)

    report = {}
    for set_name, maker in (("typical", make_typical_pages),
                            ("colorcrit", make_colorcrit_pages)):
        report[set_name] = run_set(set_name, maker(args.pages), args, model,
                                   variables["params"], processor, loss_fn, tx)

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n## transport quality gate\n\n")
            f.write("| set | transport | nDCG@5 | recall@1 | max abs Δ | max rel Δ | min gold margin |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            for set_name, per in report.items():
                for t, r in per.items():
                    f.write(f"| {set_name} | {t} | {r['ndcg@5']:.3f} | {r['recall@1']:.3f} "
                            f"| {r['score_max_abs_delta']:.4f} | {r['score_max_rel_delta']:.4f} "
                            f"| {r['min_gold_margin']:.4f} |\n")

    # gate: color-preserving transports must not degrade ranking anywhere
    for set_name, per in report.items():
        for t in ("rgb-u8", "yuv420"):
            if per[t]["recall@1"] < 1.0 or per[t]["ndcg@5"] < 0.99:
                raise SystemExit(f"FAIL: {t} degrades ranking on {set_name}: {per[t]}")
    # and the adversarial set must show gray's collapse (if it didn't, the
    # set isn't actually color-critical and the gate proves nothing)
    if report["colorcrit"]["gray"]["min_gold_margin"] > 0.1 * report["colorcrit"]["rgb-u8"]["min_gold_margin"]:
        raise SystemExit("FAIL: colorcrit set is not color-critical (gray margin did not collapse)")
    print("PASS: rgb-u8/yuv420 preserve ranking on both sets; "
          "gray collapses on the color-critical set (quantified above)")


if __name__ == "__main__":
    main()
