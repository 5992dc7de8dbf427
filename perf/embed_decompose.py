#!/usr/bin/env python
"""Decompose e2e embed throughput into (preprocess, upload, dispatch, compute).

The round-2 number: 427 pages/min e2e vs a ~2,490 pages/min forward-only
device ceiling (ColQwen2-2B, 616 visual tokens, batch 8). This script
measures each pipeline stage in isolation so the residual gap is attributed
by MEASUREMENT, not narrative:

  1. host preprocess  — PIL -> uint8 array + tokenize + rope (pure host CPU)
  2. upload           — host->device bytes/s for one batch of raw pages
                        (the device_pixels path uploads ~6.3 MB uint8/page)
  3. dispatch         — round-trip latency of a trivial jit call (RPC floor)
  4. compute          — in-jit chained forward (device ceiling, no host)

It then prints the pipeline bound implied by those numbers for K upload
threads overlapping compute, plus the colocated projection (PCIe-attached
host: upload at GB/s makes stage 2 vanish, leaving max(preprocess, compute)).

Timing rule (axon): block_until_ready is unreliable over the tunnel — every
stage is timed by fetching a scalar checksum (np.asarray of a jnp.sum), and
upload timing includes that sync. Large arrays are always jit ARGUMENTS.

Usage: python perf/embed_decompose.py [--batch 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from embed_bench import _BenchTokenizer, _make_pages


def _sync(x) -> float:
    return float(np.asarray(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--height", type=int, default=1650)
    parser.add_argument("--width", type=int, default=1275)
    args = parser.parse_args()
    t0 = time.time()

    from colpali_tpu.processors.qwen2_vl import ColQwen2Processor

    processor = ColQwen2Processor(_BenchTokenizer(), max_num_visual_tokens=768)
    pages = _make_pages(args.batch, args.height, args.width)
    page_mb = args.batch * args.height * args.width * 3 / 1e6
    print(f"[{time.time()-t0:5.1f}s] {args.batch} pages x {args.height}x{args.width} "
          f"({page_mb:.1f} MB uint8/batch)", flush=True)

    # --- 1. host preprocess: everything process_images does EXCEPT the
    # device upload + device kernel (PIL decode/convert, smart_resize math,
    # prompt expansion, tokenize, rope). Measured by running the full
    # device_pixels path once to warm compile caches, then timing the
    # host-only components directly.
    from colpali_tpu.processors.qwen2_vl import get_rope_index, smart_resize, to_rgb_array as _to_rgb

    def host_preprocess():
        arrays = [_to_rgb(p) for p in pages]
        for a in arrays:
            smart_resize(a.shape[0], a.shape[1], processor.patch_size * processor.merge_size,
                         processor.min_pixels, processor.max_pixels)
        stacked = np.stack(arrays)  # the memcpy the upload path performs
        texts = [processor.visual_prompt_prefix.replace(processor.image_token,
                 processor.image_token * 616)] * args.batch
        batch = processor._tokenize(texts)
        grids = np.asarray([[1, 56, 44]] * args.batch, np.int64)
        get_rope_index(batch["input_ids"], batch["attention_mask"], grids,
                       processor.image_token_id, processor.vision_start_token_id,
                       processor.merge_size)
        return stacked

    stacked = host_preprocess()
    times = []
    for _ in range(args.reps):
        t1 = time.perf_counter()
        host_preprocess()
        times.append(time.perf_counter() - t1)
    t_pre = min(times)
    print(f"preprocess (host): {t_pre*1e3:8.1f} ms/batch", flush=True)

    # --- 2. upload: host->device transfer of the raw uint8 batch, timed to
    # a fetched scalar (includes one dispatch for the checksum — subtract
    # the dispatch floor below for pure bandwidth)
    up = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    _ = np.asarray(up(jnp.asarray(stacked)))  # warm compile
    times = []
    for i in range(args.reps):
        fresh = stacked.copy()  # defeat any caching by buffer identity
        t1 = time.perf_counter()
        dev = jnp.asarray(fresh)
        _ = np.asarray(up(dev))
        times.append(time.perf_counter() - t1)
    t_up = min(times)
    print(f"upload+sync:       {t_up*1e3:8.1f} ms/batch "
          f"({page_mb / t_up:6.1f} MB/s)", flush=True)

    # --- 3. dispatch floor: trivial jit round trip on a scalar
    tiny = jax.jit(lambda x: x + 1)
    x = jnp.float32(0)
    x = tiny(x); _ = float(np.asarray(x))
    times = []
    for _ in range(args.reps * 3):
        t1 = time.perf_counter()
        _ = float(np.asarray(tiny(x)))
        times.append(time.perf_counter() - t1)
    t_disp = min(times)
    print(f"dispatch floor:    {t_disp*1e3:8.1f} ms/round-trip", flush=True)

    # --- 4. compute: per-dispatch forwards over ONE pre-staged device batch,
    # synced once at the end. NOT the in-jit fori_loop chaining trick: with
    # pixel_values constant across iterations, XLA hoists the entire vision
    # tower out of the loop and the "ceiling" reads 3-4x too fast (this bug
    # shipped in round 2's 2,490 pages/min number). Sequentially dispatched
    # distinct executions measure what serving actually pays.
    from embed_bench import build_colqwen2

    model, inputs = build_colqwen2(args.batch, 2464, text_tokens=20, scan=True)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **inputs))()
    fwd = jax.jit(lambda p, b_: model.apply(p, **b_))

    print(f"[{time.time()-t0:5.1f}s] compiling forward...", flush=True)
    np.asarray(fwd(params, inputs))
    iters = 8
    times = []
    for _ in range(3):
        t1 = time.perf_counter()
        outs = [fwd(params, inputs) for _ in range(iters)]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        times.append((time.perf_counter() - t1) / iters)
    t_fwd = min(times)
    print(f"forward compute:   {t_fwd*1e3:8.1f} ms/batch "
          f"({args.batch / t_fwd * 60:6.0f} pages/min ceiling)", flush=True)

    # --- attribution
    serial = t_pre + t_up + t_disp + t_fwd
    print("\n--- attribution (batch = %d pages) ---" % args.batch)
    for name, t in [("preprocess", t_pre), ("upload", t_up),
                    ("dispatch", t_disp), ("compute", t_fwd)]:
        print(f"  {name:10s} {t*1e3:8.1f} ms  {100*t/serial:5.1f}% of serial")
    print(f"  serial sum  {serial*1e3:8.1f} ms -> {args.batch/serial*60:,.0f} pages/min")
    bound = max(t_pre, t_up, t_fwd)  # perfectly pipelined: stages overlap
    print(f"  pipelined bound (max stage): {bound*1e3:.1f} ms -> "
          f"{args.batch/bound*60:,.0f} pages/min")
    colo = max(t_pre, t_fwd)  # colocated host: upload at PCIe GB/s -> ~0
    print(f"  colocated projection (upload ~0): {colo*1e3:.1f} ms -> "
          f"{args.batch/colo*60:,.0f} pages/min")


if __name__ == "__main__":
    main()
