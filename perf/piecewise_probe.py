#!/usr/bin/env python
"""Piecewise forward timing at the e2e bench shapes: vision tower alone,
text decoder alone, full model — locates where the 1067 ms/batch goes."""
import time
import jax, jax.numpy as jnp, numpy as np
from colpali_tpu.models.qwen2_vl import (
    ColQwen2, Qwen2VLConfig, Qwen2VisionTower, Qwen2Decoder)

cfg = Qwen2VLConfig()
b, patches, s = 8, 2464, 636
rng = np.random.default_rng(0)

def timeit(name, fn, *args, iters=6):
    o = fn(*args); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:7.1f} ms/batch", flush=True)

# vision tower
vt = Qwen2VisionTower(cfg.vision, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=True)
grid_h = 56
px = jnp.asarray(rng.normal(size=(b, patches, 1176)).astype(np.float32), jnp.bfloat16)
hpos = jnp.asarray(np.tile(np.arange(patches) // grid_h, (b, 1)).astype(np.int32))
wpos = jnp.asarray(np.tile(np.arange(patches) % grid_h, (b, 1)).astype(np.int32))
pmask = jnp.ones((b, patches), bool)
vparams = jax.jit(lambda: vt.init(jax.random.PRNGKey(0), px, hpos, wpos, pmask))()
vfwd = jax.jit(lambda p, a, b_, c, d: vt.apply(p, a, b_, c, d))
print("[compiling vision tower]", flush=True)
timeit("vision tower ", vfwd, vparams, px, hpos, wpos, pmask)

# text decoder
dec = Qwen2Decoder(cfg.text, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=True)
ids = jnp.asarray(rng.integers(3, 1000, (b, s)).astype(np.int32))
mask = jnp.ones((b, s), jnp.int32)
pos = jnp.asarray(np.tile(np.arange(s), (3, b, 1)).astype(np.int64))
from colpali_tpu.models.layers import make_attention_bias
def dec_fwd(p, ids, mask, pos):
    embeds = dec.apply(p, ids, method=dec.embed)
    bias = make_attention_bias(mask, causal=True)
    return dec.apply(p, embeds, bias, pos)
def _init_all(rngk):
    embeds = dec.embed(ids)
    return dec(embeds, make_attention_bias(mask, causal=True), pos)
p_embed = dec.init(jax.random.PRNGKey(0), ids, method=dec.embed)
p_layers = dec.init(jax.random.PRNGKey(0), jnp.zeros((b, s, cfg.text.hidden_size), jnp.bfloat16), make_attention_bias(mask, causal=True), pos)
dparams = {"params": {**p_embed["params"], **p_layers["params"]}}
jfwd = jax.jit(dec_fwd)
print("[compiling decoder]", flush=True)
timeit("text decoder ", jfwd, dparams, ids, mask, pos)
