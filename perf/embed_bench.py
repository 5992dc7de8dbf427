#!/usr/bin/env python
"""Embed-throughput measurement: pages/min/chip for the document-embedding
forward pass (the BASELINE.json north star: >= 2000 ViDoRe pages/min/chip).

Random bf16 weights at REAL model size (throughput is weight-independent).
Timing uses the in-jit chained-iteration trick (see bench.py) because axon
dispatches cost 10-40 ms RPC each.

Usage: python perf/embed_bench.py [--model colqwen2|colpali] [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_colqwen2(batch: int, patches: int, text_tokens: int, scan: bool = False):
    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLConfig

    config = Qwen2VLConfig()  # Qwen2-VL-2B
    model = ColQwen2(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=scan)
    n_merged = patches // 4
    s = n_merged + text_tokens
    rng = np.random.default_rng(0)
    input_ids = np.full((batch, s), 11, np.int32)
    input_ids[:, 1 : 1 + n_merged] = config.image_token_id
    grid_h = int(np.sqrt(patches))
    batch_inputs = dict(
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(batch, patches, 1176)).astype(np.float32), jnp.bfloat16),
        vision_hpos=jnp.asarray(np.tile(np.arange(patches) // grid_h, (batch, 1)).astype(np.int32)),
        vision_wpos=jnp.asarray(np.tile(np.arange(patches) % grid_h, (batch, 1)).astype(np.int32)),
        patch_mask=jnp.ones((batch, patches), bool),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, batch, 1)).astype(np.int64)),
    )
    return model, batch_inputs


def build_colpali(batch: int, text_tokens: int = 6, scan: bool = False):
    from colpali_tpu.models.paligemma import ColPali
    from colpali_tpu.models.configs import PaliGemmaConfig

    config = PaliGemmaConfig()  # PaliGemma-3B-448
    model = ColPali(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=scan)
    n_img = config.vision.num_patches  # 1024
    s = n_img + text_tokens
    rng = np.random.default_rng(0)
    input_ids = np.full((batch, s), 11, np.int32)
    input_ids[:, :n_img] = config.image_token_index
    batch_inputs = dict(
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(batch, config.vision.image_size, config.vision.image_size, 3)).astype(np.float32),
            jnp.bfloat16,
        ),
    )
    return model, batch_inputs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="colqwen2", choices=["colqwen2", "colpali"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--patches", type=int, default=768)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--scan", action="store_true", help="scan-over-layers (fast compile)")
    args = parser.parse_args()

    t0 = time.time()
    print(f"[{time.time()-t0:6.1f}s] building {args.model} batch={args.batch}", flush=True)
    if args.model == "colqwen2":
        model, inputs = build_colqwen2(args.batch, args.patches, text_tokens=20, scan=args.scan)
    else:
        model, inputs = build_colpali(args.batch, scan=args.scan)

    print(f"[{time.time()-t0:6.1f}s] init params on device...", flush=True)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **inputs))()
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"[{time.time()-t0:6.1f}s] params: {n_params/1e9:.2f}B", flush=True)

    iters = args.iters

    @jax.jit
    def chained(params, inputs):
        def body(i, carry):
            acc, ids = carry
            out = model.apply(params, **{**inputs, "input_ids": ids})
            # Every output element must feed the result: reducing a single
            # element would let XLA dead-code-eliminate the other batch rows
            # (they are independent). The predicate is value-preserving but
            # not algebraically foldable, so the loop cannot be hoisted.
            s = jnp.mean(out.astype(jnp.float32))
            ids = ids + (s > 1e30).astype(ids.dtype)
            return (acc + s, ids)

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), inputs["input_ids"]))
        return acc

    print(f"[{time.time()-t0:6.1f}s] compiling forward...", flush=True)
    np.asarray(chained(params, inputs))
    print(f"[{time.time()-t0:6.1f}s] compiled; timing...", flush=True)
    times = []
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(chained(params, inputs))
        times.append((time.perf_counter() - t1) / iters)
    dt = min(times)
    pages_per_min = args.batch / dt * 60
    seq = inputs["input_ids"].shape[1]
    print(
        f"RESULT {args.model}: batch={args.batch} seq={seq} {dt*1000:.1f} ms/batch -> "
        f"{pages_per_min:,.0f} pages/min/chip ({args.batch/dt:.1f} pages/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
