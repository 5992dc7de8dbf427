#!/usr/bin/env python
"""Variant hunt for the ~4 ms/layer attention-module fusion overhead.

A: module after the single-combined-pad wrapper fix (baseline was 8.22 ms)
B: A + rope multiplied in bf16 (HF multiplies in model dtype; our fp32
   upcast doubles intermediate traffic)
C: A at s=2560 (simulates padding the whole tower once to a block multiple)
D: A with use_flash=False (einsum path, for reference)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import colpali_tpu.models.layers as L

b, p, h, d = 8, 2464, 16, 80
dim = h * d


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
    print(f"{name:50s} {per * 1e3:8.2f} ms", flush=True)
    return per


def make(s, rng):
    bf = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32), bf)
    mask = jnp.ones((b, s), jnp.int32)
    inv = 1.0 / (10000.0 ** (np.arange(d // 4) * 2 / (d // 2)))
    pos = np.arange(s)[:, None] * inv
    half = np.concatenate([pos, pos], -1)
    emb = np.tile(np.concatenate([half, half], -1)[None], (b, 1, 1))
    rope = (jnp.asarray(np.cos(emb), bf), jnp.asarray(np.sin(emb), bf))
    return x, mask, rope


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    kw = dict(num_heads=h, head_dim=d, use_bias=True, out_bias=True, dtype=bf, param_dtype=bf)
    attn = L.Attention(**kw)

    x, mask, rope = make(p, rng)
    vs = attn.init(jax.random.key(0), x, mask=mask, rope=rope)
    timeit("A: single-pad wrapper s=2464", lambda x: attn.apply(vs, x, mask=mask, rope=rope), x)

    orig = L.apply_rope

    def rope_bf16(xx, cos, sin):
        half = xx.shape[-1] // 2
        c = cos[:, :, None, :half].astype(xx.dtype)
        s_ = sin[:, :, None, :half].astype(xx.dtype)
        x1 = xx[..., :half]
        x2 = xx[..., half:]
        return jnp.concatenate([x1 * c - x2 * s_, x2 * c + x1 * s_], axis=-1)

    L.apply_rope = rope_bf16
    try:
        timeit("B: + rope in bf16", lambda x: attn.apply(vs, x, mask=mask, rope=rope), x)
    finally:
        L.apply_rope = orig

    x2, m2, r2 = make(2560, rng)
    vs2 = attn.init(jax.random.key(0), x2, mask=m2, rope=r2)
    timeit("C: s=2560 (tower pre-padded)", lambda x: attn.apply(vs2, x, mask=m2, rope=r2), x2)

    ein = L.Attention(use_flash=False, **kw)
    timeit("D: einsum path s=2464", lambda x: ein.apply(vs, x, mask=mask, rope=rope), x)


if __name__ == "__main__":
    main()
