"""Probe: absorb the flash d=80->128 pad into the projection WEIGHTS.

The flash wrapper zero-pads q/k/v from head_dim 80 to 128 at runtime (the
kernel's d<128 mode measured slower — perf/flash_d80_probe.py). Hypothesis:
emit padded heads directly from the qkv projections by padding the weight
matrices once (trade ~60% more projection FLOPs for zero runtime pad
traffic).

Rope correctness under padding needs a PERMUTED layout: d=80 rope rotates
pairs (i, i+40). In a 128-wide head we place x1 (dims 0..39) at 0..39 and
x2 (dims 40..79) at 64..103, zeros elsewhere; a 128-wide half-table rope
with cos padded by 1 and sin padded by 0 at the dead positions then applies
the exact d=80 rotation (dead dims rotate by identity and stay zero). Logits
are unchanged (zeros dot to nothing, the permutation is consistent across
q/k), and o_proj reads the permuted rows.

Usage: python perf/attn_padnative_probe.py  (on the axon TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.layers import _FLASH_BLOCK, _flash_kernel_call

B, S, H, D = 8, 2464, 16, 80
MODEL = H * D  # 1280
DP = 128  # padded head dim
ITERS = 12


def half_table_rope(x, cos, sin):
    # x: (B, S, H, d); cos/sin: (S, d) with duplicated halves
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c, s = cos[None, :, None, :d2], sin[None, :, None, :d2]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1).astype(x.dtype)


def run_flash(q, k, v, seg, scale):
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa
    blk = min(_FLASH_BLOCK, qt.shape[2])
    sizes = _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    return _flash_kernel_call(qt, kt, vt, seg, scale, False, sizes).transpose(0, 2, 1, 3)


def module_current(x, wq, wk, wv, wo, cos, sin, seg):
    """Today's path: project at d=80, rope, runtime pad to 128, flash, slice."""
    scale = D ** -0.5
    q = (x @ wq).reshape(B, -1, H, D)
    k = (x @ wk).reshape(B, -1, H, D)
    v = (x @ wv).reshape(B, -1, H, D)
    q = half_table_rope(q, cos, sin)
    k = half_table_rope(k, cos, sin)
    s = q.shape[1]
    s_pad = (-s) % _FLASH_BLOCK
    spec = ((0, 0), (0, s_pad), (0, 0), (0, DP - D))
    q, k, v = (jnp.pad(t, spec) for t in (q, k, v))
    segp = jnp.pad(seg, ((0, 0), (0, s_pad)), constant_values=-2)
    out = run_flash(q, k, v, segp, scale)[:, :s, :, :D]
    return (out.reshape(B, s, H * D) @ wo).astype(x.dtype)


def module_padnative(x, wq, wk, wv, wo, cos, sin, seg):
    """Padded-weight path: project straight to d=128 permuted heads."""
    scale = D ** -0.5
    s = x.shape[1]
    s_pad = (-s) % _FLASH_BLOCK
    q = (x @ wq).reshape(B, s, H, DP)
    k = (x @ wk).reshape(B, s, H, DP)
    v = (x @ wv).reshape(B, s, H, DP)
    q = half_table_rope(q, cos, sin)
    k = half_table_rope(k, cos, sin)
    spec = ((0, 0), (0, s_pad), (0, 0), (0, 0))
    q, k, v = (jnp.pad(t, spec) for t in (q, k, v))
    segp = jnp.pad(seg, ((0, 0), (0, s_pad)), constant_values=-2)
    out = run_flash(q, k, v, segp, scale)[:, :s]
    return (out.reshape(B, s, H * DP) @ wo).astype(x.dtype)


def pad_weights(wq, wk, wv, wo):
    """(MODEL, H*80) -> (MODEL, H*128) with the permuted-rope layout."""
    def pad_in(w):
        w = np.asarray(w, np.float32).reshape(MODEL, H, D)
        out = np.zeros((MODEL, H, DP), np.float32)
        out[:, :, 0:40] = w[:, :, 0:40]      # x1 half
        out[:, :, 64:104] = w[:, :, 40:80]   # x2 half
        return jnp.asarray(out.reshape(MODEL, H * DP), jnp.bfloat16)

    wo_np = np.asarray(wo, np.float32).reshape(H, D, MODEL)
    wo_out = np.zeros((H, DP, MODEL), np.float32)
    wo_out[:, 0:40] = wo_np[:, 0:40]
    wo_out[:, 64:104] = wo_np[:, 40:80]
    return (pad_in(wq), pad_in(wk), pad_in(wv),
            jnp.asarray(wo_out.reshape(H * DP, MODEL), jnp.bfloat16))


def pad_tables(cos, sin):
    c = np.asarray(cos, np.float32).reshape(-1, 2, 40)
    s = np.asarray(sin, np.float32).reshape(-1, 2, 40)
    cp = np.ones((c.shape[0], 2, 64), np.float32)
    sp = np.zeros((s.shape[0], 2, 64), np.float32)
    cp[:, :, :40], sp[:, :, :40] = c, s
    return jnp.asarray(cp.reshape(-1, 128)), jnp.asarray(sp.reshape(-1, 128))


def bench(fn, args, tag):
    """In-jit chained timing (select dependency defeats hoisting; the
    intercept between two iter counts removes tunnel RPC — see PERF.md)."""
    x0, rest = args[0], args[1:]

    def loop(x0, rest, iters):
        def step(carry, _):
            # runtime-false predicate: XLA cannot hoist fn out of the scan
            xi = jnp.where(carry > 1e30, jnp.ones_like(x0), x0)
            out = fn(xi, *rest)
            return carry + jnp.mean(out.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return c

    times = {}
    for iters in (4, 4 + ITERS):
        jloop = jax.jit(lambda x, r, n=iters: loop(x, r, n))
        np.asarray(jloop(x0, rest))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jloop(x0, rest))
            ts.append((time.perf_counter() - t0) * 1e3)
        times[iters] = float(np.median(ts))
    per = (times[4 + ITERS] - times[4]) / ITERS
    print(f"{tag:12s} {per:7.2f} ms/layer  (raw {times})")
    return per


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, MODEL), scale=0.5), jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(rng.normal(size=(MODEL, MODEL), scale=0.02), jnp.bfloat16)
                  for _ in range(3))
    wo = jnp.asarray(rng.normal(size=(MODEL, MODEL), scale=0.02), jnp.bfloat16)
    inv = 1.0 / (10000 ** (np.arange(0, 40, dtype=np.float64) / 40))
    ang = np.arange(S)[:, None] * inv[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), (1, 2)), jnp.float32)
    sin = jnp.asarray(np.tile(np.sin(ang), (1, 2)), jnp.float32)
    seg = jnp.ones((B, S), jnp.int32)

    wqp, wkp, wvp, wop = pad_weights(wq, wk, wv, wo)
    cosp, sinp = pad_tables(cos, sin)

    a = np.asarray(jax.jit(module_current)(x, wq, wk, wv, wo, cos, sin, seg), np.float32)
    b = np.asarray(jax.jit(module_padnative)(x, wqp, wkp, wvp, wop, cosp, sinp, seg), np.float32)
    print(f"max|current - padnative| = {np.abs(a - b).max():.4f} "
          f"(rel {np.abs(a - b).max() / np.abs(a).std():.4f})")

    bench(module_current, (x, wq, wk, wv, wo, cos, sin, seg), "current")
    bench(module_padnative, (x, wqp, wkp, wvp, wop, cosp, sinp, seg), "padnative")


if __name__ == "__main__":
    main()
