#!/usr/bin/env python
"""Splash attention at the ColQwen2 vision shape vs stock flash (7.9 ms)."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as sk
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as sm

b, h, s = 8, 16, 2560
rng = np.random.default_rng(0)

def timeit(name, fn, iters=8):
    try:
        o = fn(); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)

for d in (128, 96):
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
    k, v = q + 0.1, q - 0.1
    mask = sm.MultiHeadMask([sm.FullMask((s, s)) for _ in range(h)])
    kernel = sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)
    fwd = jax.jit(jax.vmap(lambda q_, k_, v_: kernel(q_ * (80 ** -0.5), k_, v_)))
    timeit(f"splash full d={d}", lambda fwd=fwd, q=q, k=k, v=v: fwd(q, k, v))
