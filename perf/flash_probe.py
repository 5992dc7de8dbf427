#!/usr/bin/env python
"""Microbenchmark: stock pallas flash_attention vs our chunked attention at
the ColQwen2 vision shape (b=8, s=2464, h=16, d=80), plus numerics check."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

b, s, h, d = 8, 2464, 16, 80
s_pad = (s + 511) // 512 * 512  # flash wants block-divisible seq
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(b, h, s_pad, 128)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(b, h, s_pad, 128)).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, h, s_pad, 128)).astype(np.float32), jnp.bfloat16)
# zero the padded head dims (80:128) like the integration will
q = q.at[..., 80:].set(0); k = k.at[..., 80:].set(0)
seg = jnp.asarray((np.arange(s_pad) < s).astype(np.int32)[None].repeat(b, 0))
segs = fa.SegmentIds(q=seg, kv=seg)

@jax.jit
def flash(q, k, v, seg_q, seg_kv):
    o = fa.flash_attention(q, k, v, segment_ids=fa.SegmentIds(seg_q, seg_kv),
                           causal=False, sm_scale=d ** -0.5)
    return o

@jax.jit
def chunked(q, k, v, seg):
    # mimic models/layers.Attention chunked path: fp32 logits + bias + softmax
    up = jnp.float32
    bias = jnp.where(seg[:, None, None, :] > 0, 0.0, -1e9).astype(up)
    CH = 512
    nb = s_pad // CH
    qb = q.reshape(b, h, nb, CH, 128)
    def step(_, i):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qb[:, :, i], k, preferred_element_type=up) * d**-0.5
        logits = logits + bias
        p = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return None, jnp.einsum("bhqk,bhkd->bhqd", p, v)
    _, out = jax.lax.scan(step, None, jnp.arange(nb))
    return jnp.moveaxis(out, 0, 2).reshape(b, h, s_pad, 128)

def timeit(name, fn, *args, iters=8):
    o = fn(*args); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms  ({2*2*b*h*s_pad*s_pad*128/dt/1e12:.1f} TFLOP/s padded-d)")
    return o

of = timeit("flash  ", flash, q, k, v, seg, seg)
oc = timeit("chunked", chunked, q, k, v, seg)
diff = np.abs(np.asarray(of[:, :, :s], np.float32) - np.asarray(oc[:, :, :s], np.float32))
print("max|diff| on valid rows:", float(diff.max()))
