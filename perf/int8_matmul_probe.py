#!/usr/bin/env python
"""Probe: is int8 matmul actually ~2x bf16 on this v5e chip via XLA?

If lax.dot_general(int8, int8, preferred_element_type=int32) maps to the
native int8 MXU path (v5e peak ~394 TOPS vs 197 bf16 TFLOP/s), a w8a8
inference mode can roughly halve the compute-bound embed forward.

Measures square matmuls plus the ColQwen2 vision shapes (the embed
pipeline's dominant FLOPs): MLP fc1 (S,1280)x(1280,5120), fc2 back, and
qkv (S,1280)x(1280,3840) at the batch-8/768-cap geometry S=19712.

Timing: in-jit chained lax.scan with a select-based runtime dependency
(XLA can neither hoist nor fold), two iteration counts, difference
quotient, np.asarray to sync — same harness as perf/vision_mfu_probe.py.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def chain(fn, x, iters):
    def body(c, _):
        xx = jnp.where(c > 1e30, jnp.ones((), x.dtype), x)
        y = fn(xx)
        return jnp.sum(y.astype(jnp.float32)).astype(jnp.float32) * 1e-9, None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return out


def timeit(name, fn, x, flops, peak, iters=(8, 32)):
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
        f"{name:40s} {per * 1e3:8.2f} ms  {flops / per / 1e12:6.1f} T/s"
        f"  {flops / per / peak * 100:5.1f}% of peak",
        flush=True,
    )
    return per


def main():
    rng = np.random.default_rng(0)
    import os
    only = os.environ.get("SHAPES", "")
    shapes = [
        ("square 4096^3", 4096, 4096, 4096),
        ("square 8192^3", 8192, 8192, 8192),
        ("vision fc1 (19712,1280,5120)", 19712, 1280, 5120),
        ("vision fc2 (19712,5120,1280)", 19712, 5120, 1280),
        ("vision qkv (19712,1280,3840)", 19712, 1280, 3840),
    ]
    if only:
        idx = [int(i) for i in only.split(",")]
        shapes = [shapes[i] for i in idx]
    for name, m, k, n in shapes:
        fl = 2 * m * k * n
        a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        abf = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        bbf = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32), jnp.bfloat16)

        t_bf = timeit(f"bf16 {name}", lambda x, w=bbf: x @ w, abf, fl, PEAK_BF16)
        # int8 path: the chained select needs an int8 x, dot in int32.
        t_i8 = timeit(
            f"int8 {name}",
            lambda x, w=b8: jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ),
            a8,
            fl,
            PEAK_INT8,
        )
        # w8a8 with dequant epilogue: int32 accum -> scale -> bf16 out. This is
        # what a real quantized layer pays (per-channel scale multiply fused).
        scale = jnp.asarray(rng.uniform(0.01, 0.02, (n,)).astype(np.float32), jnp.bfloat16)
        t_i8d = timeit(
            f"int8+dequant {name}",
            lambda x, w=b8, s=scale: (
                jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                ).astype(jnp.bfloat16)
                * s
            ),
            a8,
            fl,
            PEAK_INT8,
        )
        print(
            f"  -> int8 speedup over bf16: {t_bf / t_i8:.2f}x raw, "
            f"{t_bf / t_i8d:.2f}x with dequant epilogue",
            flush=True,
        )


if __name__ == "__main__":
    main()
