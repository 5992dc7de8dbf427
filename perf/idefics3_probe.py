#!/usr/bin/env python
"""Locate colSmol's slow stage: vision tower alone vs full forward."""
import time
import jax, jax.numpy as jnp, numpy as np
from colpali_tpu.models.idefics3 import Idefics3VisionTower, Idefics3VisionConfig

def timeit(name, fn, *args, iters=6):
    o = fn(*args); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.1f} ms", flush=True)

rng = np.random.default_rng(0)
cfg = Idefics3VisionConfig()  # SigLIP-B/16-512
for bt in (104,):
    vt = Idefics3VisionTower(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=True)
    tiles = jnp.asarray(rng.normal(size=(bt, 512, 512, 3)).astype(np.float32), jnp.bfloat16)
    params = jax.jit(lambda: vt.init(jax.random.PRNGKey(0), tiles))()
    f = jax.jit(lambda p, x: vt.apply(p, x))
    print("[compiling vision tower]", flush=True)
    timeit(f"idefics3 vision bt={bt}", f, params, tiles)

# text decoder at the colSmol shape
from colpali_tpu.models.qwen2_vl import Qwen2Decoder, Qwen2TextConfig
from colpali_tpu.models.layers import make_attention_bias
tc = Qwen2TextConfig(vocab_size=49280, hidden_size=576, intermediate_size=1536,
                     num_hidden_layers=30, num_attention_heads=9, num_key_value_heads=3,
                     head_dim=64, rope_theta=100000.0, attention_bias=False, mrope_section=(32,))
dec = Qwen2Decoder(tc, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=True)
b, s = 8, 896
embeds = jnp.asarray(rng.normal(size=(b, s, 576)).astype(np.float32), jnp.bfloat16)
mask = jnp.ones((b, s), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, b, s))
bias = make_attention_bias(mask, causal=True)
dp = jax.jit(lambda: dec.init(jax.random.PRNGKey(0), embeds, bias, pos))()
g = jax.jit(lambda p, e: dec.apply(p, e, bias, pos))
print("[compiling decoder]", flush=True)
timeit("idefics3 text dec", g, dp, embeds)
