#!/usr/bin/env python
"""Pipeline overlap probe: where does the e2e batch time actually go?

One compile, three timings over the same 24 batches:
  A. staging only  — process_images(device_pixels, host_resize) + to-device
  B. forward only  — dispatch all forwards over PRE-STAGED batches, then sync
  C. interleaved   — the production loop (stage i+1 while forward i runs)

If C ~= A + B, the axon tunnel serializes host staging against device
compute (no async overlap); if C ~= max(A, B), the pipeline overlaps and
the residual gap to the forward ceiling is staging cost.

Usage: python perf/embed_pipeline_probe.py [--batches 24]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from embed_bench import _BenchTokenizer, _make_pages


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--batches", type=int, default=24)
    parser.add_argument("--no-host-resize", action="store_true")
    args = parser.parse_args()
    t0 = time.time()

    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLConfig
    from colpali_tpu.processors.qwen2_vl import ColQwen2Processor

    processor = ColQwen2Processor(_BenchTokenizer(), max_num_visual_tokens=768)
    model = ColQwen2(Qwen2VLConfig(), dim=128, dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16, scan_layers=True)
    host_resize = not args.no_host_resize

    n_pages = args.batch * args.batches
    pages = _make_pages(n_pages)
    keys = ("input_ids", "attention_mask", "pixel_values", "patch_mask",
            "vision_hpos", "vision_wpos", "position_ids")

    def stage(i):
        batch = processor.process_images(
            pages[i : i + args.batch], device_pixels=True, host_resize=host_resize
        )
        return {
            k: batch[k] if k == "pixel_values" else jnp.asarray(np.asarray(batch[k]))
            for k in keys
        }

    print(f"[{time.time()-t0:5.1f}s] staging warm batch + compiling...", flush=True)
    warm = stage(0)
    warm["pixel_values"] = warm["pixel_values"].astype(jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **warm))()

    fwd = jax.jit(lambda p, b: model.apply(p, **b))
    np.asarray(fwd(params, warm))
    print(f"[{time.time()-t0:5.1f}s] compiled", flush=True)

    # A: staging only
    t1 = time.perf_counter()
    staged = []
    for i in range(0, n_pages, args.batch):
        b = stage(i)
        b["pixel_values"] = b["pixel_values"].astype(jnp.bfloat16)
        staged.append(b)
    # force the last upload to land
    _ = float(np.asarray(jnp.sum(staged[-1]["pixel_values"].astype(jnp.float32))))
    t_stage = time.perf_counter() - t1
    print(f"A staging only : {t_stage:6.2f} s ({t_stage/args.batches*1e3:6.0f} ms/batch)", flush=True)

    # B: forward only over pre-staged
    t1 = time.perf_counter()
    outs = [fwd(params, b) for b in staged]
    checksum = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    t_fwd = time.perf_counter() - t1
    assert np.isfinite(checksum)
    print(f"B forward only : {t_fwd:6.2f} s ({t_fwd/args.batches*1e3:6.0f} ms/batch)", flush=True)

    # C: interleaved production loop (prefetch thread staging 1 ahead)
    from colpali_tpu.data.prefetch import prefetch

    def gen():
        for i in range(0, n_pages, args.batch):
            b = stage(i)
            b["pixel_values"] = b["pixel_values"].astype(jnp.bfloat16)
            yield b

    t1 = time.perf_counter()
    outs = [fwd(params, b) for b in prefetch(gen(), buffer_size=2)]
    checksum = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    t_inter = time.perf_counter() - t1
    assert np.isfinite(checksum)
    print(f"C interleaved  : {t_inter:6.2f} s ({t_inter/args.batches*1e3:6.0f} ms/batch) "
          f"-> {n_pages/t_inter*60:,.0f} pages/min", flush=True)
    print(f"A+B = {t_stage+t_fwd:.2f} s, max(A,B) = {max(t_stage, t_fwd):.2f} s", flush=True)

    # D: dispatch cost isolation — same staged batch, 24 sequential dispatches
    t1 = time.perf_counter()
    outs = [fwd(params, staged[0]) for _ in range(args.batches)]
    _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    t_rep = time.perf_counter() - t1
    print(f"D same-batch   : {t_rep:6.2f} s ({t_rep/args.batches*1e3:6.0f} ms/dispatch)", flush=True)

    # E: chunked lax.map — K batches per dispatch amortizes the RPC overhead
    for k in (4, 8):
        if args.batches % k:
            continue
        stacked_groups = []
        for g in range(0, args.batches, k):
            grp = staged[g : g + k]
            stacked_groups.append({key: jnp.stack([b[key] for b in grp]) for key in keys})
        fwd_many = jax.jit(lambda p, bs: jax.lax.map(lambda b: model.apply(p, **b), bs))
        print(f"[{time.time()-t0:5.1f}s] compiling lax.map K={k}...", flush=True)
        np.asarray(fwd_many(params, stacked_groups[0]))
        t1 = time.perf_counter()
        outs = [fwd_many(params, sg) for sg in stacked_groups]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        t_chunk = time.perf_counter() - t1
        print(f"E lax.map K={k} : {t_chunk:6.2f} s ({t_chunk/args.batches*1e3:6.0f} ms/batch) "
              f"-> {n_pages/t_chunk*60:,.0f} pages/min", flush=True)


if __name__ == "__main__":
    main()
