#!/usr/bin/env python
"""Where do colSmol's 2.4 s/batch go? Time staging components separately."""
import time
import numpy as np, jax.numpy as jnp
from embed_bench import _BenchTokenizer, _make_pages
from colpali_tpu.processors.idefics3 import ColIdefics3Processor

proc = ColIdefics3Processor(_BenchTokenizer())
pages = _make_pages(16)

def timeit(name, fn, iters=4):
    fn()  # warm (compiles the crop resizes)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:7.1f} ms/batch", flush=True)
    return out

# full process_images staging (device tiles)
def full():
    b = proc.process_images(pages[:8], device_pixels=True)
    return float(np.asarray(jnp.sum(b["pixel_values"].astype(jnp.float32))))
timeit("process_images(device)+sync", full)

# split only
def split_only():
    tiles, counts, rc = proc._split_many_device(pages[:8])
    return float(np.asarray(jnp.sum(tiles.astype(jnp.float32))))
timeit("split_many_device+sync", split_only)

# host side only: to_rgb conversions
from colpali_tpu.processors.image_processing import to_rgb_array
timeit("to_rgb x8", lambda: [to_rgb_array(p).astype(np.float32) for p in pages[:8]] and 0)

# tokenize only
def tok():
    layouts = [(13, 4, 3)] * 8
    prompts = [proc.prompt_prefix + proc._image_prompt(4, 3) + "Describe the image." + proc.prompt_suffix] * 8
    proc._tokenize(prompts)
    return 0
timeit("tokenize x8", tok)
