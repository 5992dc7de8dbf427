#!/usr/bin/env python
"""Decompose the Qwen2-VL vision tower's 56%-matmul-MFU number.

Times, with in-jit chained iterations (runtime-predicate dependency so XLA
can neither hoist nor fold — see .claude/skills/verify/SKILL.md):

  1. the three tower matmul shapes standalone (XLA's ceiling at these dims),
  2. LN + MLP (the non-attention half of a block, glue included),
  3. one full vision block (flash attention included),

at the 768-cap batch geometry (B=8 pages x 2464 patches). If (1) is much
faster than its share of (3), the tower loses time to glue/fusion, not to
the MXU; if (1) itself sits near 56%, the shapes are the ceiling.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 FLOP/s


def chain(fn, x, iters):
    """Run fn iters times inside one jit with a runtime-only dependency.

    The dependency must be a SELECT, not an additive term: XLA's algebraic
    simplifier rewrites (x + scalar_broadcast) @ W into x @ W + scalar *
    colsum(W) and hoists the matmul out of the loop (first version of this
    probe measured 118% MFU that way). select(pred, ones, x) has no such
    rewrite.
    """

    def body(c, _):
        xx = jnp.where(c > 1e30, jnp.ones((), x.dtype), x)
        y = fn(xx)
        return jnp.mean(y.astype(jnp.float32)), None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return out


def timeit(name, fn, x, flops, iters=(8, 32)):
    js = {n: jax.jit(lambda x, n=n: chain(fn, x, n)) for n in iters}
    for n in iters:  # compile
        np.asarray(js[n](x))
    ts = {}
    for n in iters:
        t0 = time.perf_counter()
        np.asarray(js[n](x))
        ts[n] = time.perf_counter() - t0
    per = (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])
    print(
        f"{name:36s} {per * 1e3:8.2f} ms/iter  {flops / per / 1e12:6.1f} TF/s"
        f"  {flops / per / PEAK * 100:5.1f}% MFU",
        flush=True,
    )
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patches", type=int, default=2464, help="per-page patch count")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from colpali_tpu.models.qwen2_vl import Qwen2VisionBlock, Qwen2VLVisionConfig

    cfg = Qwen2VLVisionConfig()
    b, p, d = args.batch, args.patches, cfg.embed_dim
    hid = int(d * cfg.mlp_ratio)
    n = b * p
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    x2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), bf)
    w_fc1 = jnp.asarray(rng.normal(size=(d, hid)).astype(np.float32) * 0.02, bf)
    w_fc2 = jnp.asarray(rng.normal(size=(hid, d)).astype(np.float32) * 0.02, bf)
    w_qkv = jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.02, bf)

    print(f"geometry: ({n}, {d})  fc1->{hid}  qkv->{3 * d}", flush=True)
    timeit("matmul fc1 (n,1280)x(1280,5120)", lambda x: x @ w_fc1, x2, 2 * n * d * hid)
    timeit("matmul qkv (n,1280)x(1280,3840)", lambda x: x @ w_qkv, x2, 2 * n * d * 3 * d)
    timeit(
        "fc1+gelu+fc2 fused",
        lambda x: jax.nn.gelu(x @ w_fc1) @ w_fc2,
        x2,
        2 * n * d * hid * 2,
    )

    # LN + MLP half of the block (flax, glue included)
    import flax.linen as nn

    class MLPHalf(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-6, dtype=bf, param_dtype=bf)(x)
            h = nn.Dense(hid, dtype=bf, param_dtype=bf)(h)
            h = jax.nn.gelu(h)
            h = nn.Dense(d, dtype=bf, param_dtype=bf)(h)
            return x + h

    x3 = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32), bf)
    mlp = MLPHalf()
    vs = mlp.init(jax.random.key(0), x3)
    timeit("LN+MLP half-block", lambda x: mlp.apply(vs, x), x3, 2 * n * d * hid * 2)

    # full block with flash attention
    blk = Qwen2VisionBlock(cfg, dtype=bf, param_dtype=bf)
    mask = jnp.ones((b, p), jnp.int32)
    freq_dim = cfg.head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(freq_dim) * 2 / (cfg.head_dim // 2)))
    pos = np.arange(p)[:, None] * inv
    half = np.concatenate([pos, pos], -1)
    emb = np.tile(np.concatenate([half, half], -1)[None], (b, 1, 1))
    rope = (jnp.asarray(np.cos(emb), bf), jnp.asarray(np.sin(emb), bf))
    bvs = blk.init(jax.random.key(1), x3, mask, rope)
    blk_flops = (
        2 * n * d * hid * 2  # mlp
        + 2 * n * d * 3 * d  # qkv
        + 2 * n * d * d  # o_proj
        + 2 * b * cfg.num_heads * p * p * cfg.head_dim * 2  # attention
    )
    per = timeit(
        "full vision block (flash attn)",
        lambda x: blk.apply(bvs, x, mask, rope),
        x3,
        blk_flops,
        iters=(4, 12),
    )
    print(f"32-layer tower extrapolation: {per * 32 * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
