#!/usr/bin/env python
"""Isolate the colSmol staging cost: upload vs fused kernel vs output."""
import time
import numpy as np, jax, jax.numpy as jnp
from embed_bench import _BenchTokenizer, _make_pages
from colpali_tpu.processors.idefics3 import ColIdefics3Processor, _split_resize_normalize, _resize_matrix
from colpali_tpu.processors.image_processing import to_rgb_array

proc = ColIdefics3Processor(_BenchTokenizer())
pages = _make_pages(8)
arrs = np.stack([to_rgb_array(p) for p in pages])  # (8, 1650, 1275, 3) u8

def timeit(name, fn, iters=4):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.1f} ms", flush=True)

# upload + tiny sync
up = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
def upload():
    d = jnp.asarray(arrs.copy())
    return int(np.asarray(up(d)))
timeit("upload 50MB u8 + sync", upload)

# kernel alone on pre-staged device batch
dev = jnp.asarray(arrs)
h0, w0 = 1650, 1275
h1, w1 = h0, w0
rows, cols = 4, 3
s = 512
import math
bounds, mats = [], []
opt_h, opt_w = math.ceil(h1/rows), math.ceil(w1/cols)
for r in range(rows):
    for c in range(cols):
        r0, r1 = r*opt_h, min((r+1)*opt_h, h1)
        c0, c1 = c*opt_w, min((c+1)*opt_w, w1)
        bounds.append((r0, r1, c0, c1))
        mats.append((jnp.asarray(_resize_matrix(r1-r0, s)), jnp.asarray(_resize_matrix(c1-c0, s))))
bounds.append((0, h1, 0, w1))
mats.append((jnp.asarray(_resize_matrix(h1, s)), jnp.asarray(_resize_matrix(w1, s))))
mean = jnp.asarray(proc.image_mean); std = jnp.asarray(proc.image_std)
dummy = jnp.zeros((1,1))

def kern():
    out = _split_resize_normalize(dev, mean, std, dummy, dummy, tuple(mats),
                                  h1, w1, rows, cols, s, tuple(bounds))
    return float(np.asarray(jnp.sum(out.astype(jnp.float32))))
timeit("fused kernel + sum-sync", kern)

# output materialization only: same kernel but reduce INSIDE jit
@jax.jit
def kern_reduced(dev):
    out = _split_resize_normalize(dev, mean, std, dummy, dummy, tuple(mats),
                                  h1, w1, rows, cols, s, tuple(bounds))
    return jnp.sum(out.astype(jnp.float32))
def kr():
    return float(np.asarray(kern_reduced(dev)))
timeit("kernel w/ in-jit reduce", kr)
