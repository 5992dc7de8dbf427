#!/usr/bin/env python
"""Incremental decomposition of the attention module at the ColQwen2 vision
shape — each stage adds one piece, so diffs are true fused-context costs.

E: qkv projections (3 Dense + reshape)
F: E + rope on q,k
G: F + flash wrapper
H: full module (G + o_proj)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

import colpali_tpu.models.layers as L

b, p, h, d = 8, 2464, 16, 80
dim = h * d
bf = jnp.bfloat16


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


class Partial(nn.Module):
    upto: str  # qkv | rope | flash | full

    @nn.compact
    def __call__(self, x):
        mask = jnp.ones((b, p), jnp.int32)
        dense = lambda f, n: nn.Dense(f, use_bias=True, dtype=bf, param_dtype=bf, name=n)  # noqa: E731
        q = dense(dim, "q_proj")(x).reshape(b, p, h, d)
        k = dense(dim, "k_proj")(x).reshape(b, p, h, d)
        v = dense(dim, "v_proj")(x).reshape(b, p, h, d)
        if self.upto == "qkv":
            return q + k + v
        inv = 1.0 / (10000.0 ** (jnp.arange(d // 4, dtype=jnp.float32) * 2 / (d // 2)))
        pos = jnp.arange(p, dtype=jnp.float32)[:, None] * inv
        half = jnp.concatenate([pos, pos], -1)
        emb = jnp.broadcast_to(jnp.concatenate([half, half], -1)[None], (b, p, d))
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        q = L.apply_rope(q, cos, sin)
        k = L.apply_rope(k, cos, sin)
        if self.upto == "rope":
            return q + k + v
        out = L.flash_attention_padded(q, k, v, mask, d**-0.5)
        if self.upto == "flash":
            return out
        out = out.reshape(b, p, dim)
        return dense(dim, "o_proj")(out.astype(bf))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, p, dim)).astype(np.float32), bf)
    prev = 0.0
    for upto in ("qkv", "rope", "flash", "full"):
        m = Partial(upto)
        vs = m.init(jax.random.key(0), x)
        t = timeit(f"upto={upto}", lambda x, m=m, vs=vs: m.apply(vs, x), x)
        print(f"   delta: {1e3 * (t - prev):+.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
