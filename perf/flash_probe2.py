#!/usr/bin/env python
"""Tune stock flash_attention block sizes at the vision shape."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

b, s, h, d = 8, 2560, 16, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
seg = jnp.asarray((np.arange(s) < 2464).astype(np.int32)[None].repeat(b, 0))

def timeit(name, fn, iters=8):
    try:
        o = fn(); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)

for bq, bkm, bk in [(512, 512, 512), (1024, 512, 512), (512, 1024, 1024), (256, 512, 512), (2560, 2560, 2560), (1280, 1280, 1280)]:
    bs = fa.BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
    f = jax.jit(lambda bs=bs: fa.flash_attention(q, k, v, causal=False, sm_scale=d**-0.5, block_sizes=bs))
    timeit(f"flash q{bq} km{bkm} k{bk} noseg", f)
    f2 = jax.jit(lambda bs=bs: fa.flash_attention(q, k, v, segment_ids=fa.SegmentIds(seg, seg), causal=False, sm_scale=d**-0.5, block_sizes=bs))
    timeit(f"flash q{bq} km{bkm} k{bk}   seg", f2)
