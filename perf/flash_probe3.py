#!/usr/bin/env python
"""Deeper flash tuning: block_b, larger blocks with s padded to 3072."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

b, h, d = 8, 16, 128
rng = np.random.default_rng(0)

def mk(s):
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
    return q, q + 0.1, q - 0.1, jnp.asarray((np.arange(s) < 2464).astype(np.int32)[None].repeat(b, 0))

def timeit(name, fn, iters=8):
    try:
        o = fn(); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)

for s, bq, bk, bb in [(2560, 512, 512, 2), (2560, 512, 512, 4), (2560, 512, 256, 1),
                      (3072, 1024, 1024, 1), (3072, 1536, 1536, 1), (2560, 2560, 512, 1)]:
    q, k, v, seg = mk(s)
    bs = fa.BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb)
    f = jax.jit(lambda q=q, k=k, v=v, seg=seg, bs=bs: fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(seg, seg), causal=False, sm_scale=80**-0.5, block_sizes=bs))
    timeit(f"s{s} q{bq} k{bk} b{bb}", f)
