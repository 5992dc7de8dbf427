#!/usr/bin/env python
"""Does the stock flash kernel accept head_dim=80 directly, and is it faster
than the wrapper's pad-to-128 path?

The kernel supports head_dim < MIN_BLOCK_SIZE natively (l_broadcast slices
l[:, :head_dim]); the wrapper pads d 80->128 in HBM, which costs 1.6x on
q/k/v/out traffic AND 1.6x on both kernel matmuls. Measure both at the
ColQwen2 vision shape, plus the transpose cost.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental.pallas.ops.tpu import flash_attention as _fa

PEAK = 197e12
b, h, s, d = 8, 16, 2560, 80
true_flops = 2 * b * h * s * s * d * 2


def chain(fn, x, iters):
    def body(c, _):
        xx = jnp.where(c > 1e30, jnp.ones((), x.dtype), x)
        y = fn(xx)
        return jnp.mean(y.astype(jnp.float32)), None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return out


def timeit(name, fn, x, flops, iters=(4, 16)):
    js = {n: jax.jit(lambda x, n=n: chain(fn, x, n)) for n in iters}
    for n in iters:
        np.asarray(js[n](x))
    ts = {}
    for n in iters:
        t0 = time.perf_counter()
        np.asarray(js[n](x))
        ts[n] = time.perf_counter() - t0
    per = (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])
    print(
        f"{name:44s} {per * 1e3:8.2f} ms  {flops / per / 1e12:6.1f} TF/s"
        f"  {flops / per / PEAK * 100:5.1f}% MFU(true)",
        flush=True,
    )
    return per


def sizes(blk):
    return _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), bf)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), bf)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32), bf)
    seg = jnp.ones((b, s), jnp.int32)
    scale = d**-0.5

    def flash(qq, kk, vv, blk=512):
        return _fa.flash_attention(
            qq, kk, vv,
            segment_ids=_fa.SegmentIds(q=seg, kv=seg),
            causal=False, sm_scale=scale, block_sizes=sizes(blk),
        )

    # 1. d=80 direct
    try:
        out80 = np.asarray(flash(q, k, v)[0, 0, 0, :4], dtype=np.float32)
        print("d=80 direct: COMPILES, out[0,:4] =", out80, flush=True)
        timeit("flash d=80 direct", lambda x: flash(x, k, v), q, true_flops)
    except Exception as e:
        print("d=80 direct: FAIL", type(e).__name__, str(e)[:200], flush=True)

    # 2. pad to 128 inside the timed region (what the wrapper does today)
    def padded(x):
        qq = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 48)))
        kk = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 48)))
        vv = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 48)))
        return flash(qq, kk, vv)[..., :d]

    timeit("flash d->128 (pad in region)", padded, q, true_flops)

    # 3. pre-padded (kernel-only cost at d=128)
    q128 = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 48)))
    k128 = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 48)))
    v128 = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 48)))
    timeit("flash d=128 pre-padded (kernel only)", lambda x: flash(x, k128, v128), q128, true_flops)

    # 4. transpose cost (B,S,H,D) -> (B,H,S,D) for q,k,v
    qs = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), bf)
    timeit(
        "transpose+flash d=80 from (B,S,H,D)",
        lambda x: flash(x.transpose(0, 2, 1, 3), k, v),
        qs, true_flops,
    )

    # 5. block-size variants at d=80
    for blk in (256, 1024):
        try:
            timeit(f"flash d=80 blk={blk}", lambda x: flash(x, k, v, blk), q, true_flops)
        except Exception as e:
            print(f"blk={blk}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
