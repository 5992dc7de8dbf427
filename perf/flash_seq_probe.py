#!/usr/bin/env python
"""On-device validation + timing of the seq-major flash kernel.

1. Numerics: flash_seqmajor vs the einsum additive-bias path at the
   ColQwen2 vision shape (bf16) — prints max|diff| on valid rows.
2. Speed at production shapes: seq-major kernel vs the stock-kernel
   wrapper (transpose + d-pad + s-pad) vs the dense bias path.

Shapes:
  - colqwen2-vision: B=8, S=2464, H=16, D=80 (448^2 images, spatial-merged)
  - colpali-vision (SigLIP so400m): B=8, S=1024, H=16, D=72
  - text-prefix 768-cap: B=8, S=768, H=8, D=256-GQA? -> use Gemma 2B text:
    H=8, D=256 exceeds lanes; use ColQwen2 text H=12 D=128 Hkv=2.

Timing method per verify skill: chained scan with a runtime-only select
dependency; slope between iter counts isolates device time from tunnel RPC.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import colpali_tpu.models.layers as L
from colpali_tpu.ops.flash_seqmajor import flash_seqmajor

bf = jnp.bfloat16


def chain(fn, args, iters):
    """fn(q) -> out; chain via runtime predicate on q."""

    def body(c, _):
        q = jnp.where(c > 1e30, jnp.ones((), args[0].dtype), args[0])
        out = fn(q, *args[1:])
        return jnp.mean(out.astype(jnp.float32)), None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return out


def timeit(name, fn, args, iters=(4, 16)):
    js = {n: jax.jit(lambda *a, n=n: chain(fn, a, n)) for n in iters}
    for n in iters:
        np.asarray(js[n](*args))
    ts = {}
    for n in iters:
        t0 = time.perf_counter()
        np.asarray(js[n](*args))
        ts[n] = time.perf_counter() - t0
    per = (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])
    print(f"  {name:40s} {per * 1e3:8.2f} ms", flush=True)
    return per


def bias_path(q, k, v, mask, scale):
    bias = L.make_attention_bias(mask, causal=False, dtype=jnp.float32)
    b, s, h, d = q.shape
    hkv = k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def validate(b, s, h, d, hkv=None):
    hkv = hkv or h
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), bf)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32), bf)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32), bf)
    mask = np.ones((b, s), np.int32)
    mask[0, s - 31:] = 0
    m = jnp.asarray(mask)
    out = np.asarray(jax.jit(flash_seqmajor, static_argnames=("scale",))(q, k, v, m, d**-0.5).astype(jnp.float32))
    ref = np.asarray(jax.jit(bias_path, static_argnames=("scale",))(q, k, v, m, d**-0.5).astype(jnp.float32))
    valid = mask.astype(bool)
    diff = np.max(np.abs(out[valid] - ref[valid]))
    print(f"  numerics max|diff| valid rows (bf16): {diff:.4f}", flush=True)
    assert diff < 0.05, diff


def bench(tag, b, s, h, d, hkv=None):
    hkv = hkv or h
    print(f"{tag}: B={b} S={s} H={h} Hkv={hkv} D={d}", flush=True)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), bf)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32), bf)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32), bf)
    mask = jnp.ones((b, s), jnp.int32)
    scale = d**-0.5

    t_new = timeit("seq-major kernel", lambda q, k, v, m: flash_seqmajor(q, k, v, m, scale), (q, k, v, mask))
    t_stock = timeit("stock wrapper (pad+transpose)", lambda q, k, v, m: L.flash_attention_padded_stock(q, k, v, m, scale), (q, k, v, mask))
    t_bias = timeit("dense bias path", lambda q, k, v, m: bias_path(q, k, v, m, scale), (q, k, v, mask))
    # attention FLOPs: 2*2*B*H*S^2*D (QK^T + PV)
    flops = 4 * b * h * s * s * d
    print(f"  speedup vs stock {t_stock / t_new:5.2f}x, vs dense {t_bias / t_new:5.2f}x;"
          f" kernel {flops / t_new / 1e12:6.1f} TFLOP/s", flush=True)


def main():
    print("== validate (colqwen2 vision shape, bf16) ==", flush=True)
    validate(2, 1024, 16, 80)
    print("== bench ==", flush=True)
    bench("colqwen2-vision", 8, 2464, 16, 80)
    bench("colpali-vision (siglip)", 8, 1024, 16, 72)
    bench("colqwen2-text GQA", 8, 768, 12, 128, hkv=2)


if __name__ == "__main__":
    main()
