#!/usr/bin/env python
"""Where do the ~4 unexplained ms/layer in the vision block go?

flash_d80_probe: kernel 2.92 ms, +pads 3.57 ms, transpose free. The full
block measures 12.4 ms, but LN+MLP (3.0) + qkv (1.05) + o (0.35) + flash
path (~3.6) + rope (~0.6?) only accounts for ~8.6. Time the module-level
pieces at the exact block geometry to locate the rest.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.layers import Attention, apply_rope, flash_attention_padded

PEAK = 197e12
b, p, h, d = 8, 2464, 16, 80
dim = h * d  # 1280
true_flops = 2 * b * h * p * p * d * 2


def chain(fn, x, iters):
    def body(c, _):
        xx = jnp.where(c > 1e30, jnp.ones((), x.dtype), x)
        return jnp.mean(fn(xx).astype(jnp.float32)), None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return out


def timeit(name, fn, x, iters=(4, 16)):
    js = {n: jax.jit(lambda x, n=n: chain(fn, x, n)) for n in iters}
    for n in iters:
        np.asarray(js[n](x))
    ts = {}
    for n in iters:
        t0 = time.perf_counter()
        np.asarray(js[n](x))
        ts[n] = time.perf_counter() - t0
    per = (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])
    print(f"{name:46s} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, p, dim)).astype(np.float32), bf)
    mask = jnp.ones((b, p), jnp.int32)

    inv = 1.0 / (10000.0 ** (np.arange(d // 4) * 2 / (d // 2)))
    pos = np.arange(p)[:, None] * inv
    half = np.concatenate([pos, pos], -1)
    emb = np.tile(np.concatenate([half, half], -1)[None], (b, 1, 1))
    rope = (jnp.asarray(np.cos(emb), bf), jnp.asarray(np.sin(emb), bf))

    kw = dict(num_heads=h, head_dim=d, use_bias=True, out_bias=True, dtype=bf, param_dtype=bf)
    attn = Attention(**kw)
    vs = attn.init(jax.random.key(0), x, mask=mask, rope=rope)

    timeit("Attention module s=2464 (flash auto)", lambda x: attn.apply(vs, x, mask=mask, rope=rope), x)
    timeit("Attention module s=2464 NO rope", lambda x: attn.apply(vs, x, mask=mask), x)

    x2560 = jnp.asarray(rng.normal(size=(b, 2560, dim)).astype(np.float32), bf)
    m2560 = jnp.ones((b, 2560), jnp.int32)
    vs2 = attn.init(jax.random.key(0), x2560, mask=m2560)
    timeit("Attention module s=2560 NO rope", lambda x: attn.apply(vs2, x, mask=m2560), x2560)

    # wrapper alone at s=2464 (pads s->2560 + d->128 inside)
    q = jnp.asarray(rng.normal(size=(b, p, h, d)).astype(np.float32), bf)
    k = jnp.asarray(rng.normal(size=(b, p, h, d)).astype(np.float32), bf)
    v = jnp.asarray(rng.normal(size=(b, p, h, d)).astype(np.float32), bf)
    timeit("flash_attention_padded s=2464", lambda x: flash_attention_padded(x, k, v, mask, d**-0.5), q)

    # rope application alone (q and k)
    timeit("apply_rope on q+k", lambda x: apply_rope(x, *rope) + apply_rope(k, *rope), q)


if __name__ == "__main__":
    main()
