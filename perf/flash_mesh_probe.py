"""Validate + time the shard_map flash path on a real TPU.

Runs the REAL stock kernel through jax.shard_map over a 1-device mesh (the
only mesh this host can build) and checks it against the plain
flash_attention_padded dispatch: numerics must match exactly (same kernel,
same blocks) and the shard_map wrapper must add no measurable overhead.
CPU-mesh tests (tests/models/test_flash_mesh.py) cover the multi-shard
spec/GQA logic with an oracle kernel; this probe covers the real-hardware
half: Mosaic compiles and runs correctly inside shard_map's manual-sharding
region.

Usage: python perf/flash_mesh_probe.py  (on the axon TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from colpali_tpu.models.layers import (
    flash_attention_padded,
    flash_attention_sharded,
)


def main():
    assert jax.devices()[0].platform == "tpu", "run on the TPU host"
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    ctx = (mesh, "data", "model")

    B, S, H, KV, D = 8, 2464, 16, 16, 80  # ColQwen2 vision shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    scale = D ** -0.5

    plain = jax.jit(lambda q, k, v, m: flash_attention_padded(q, k, v, m, scale))
    sharded = jax.jit(
        lambda q, k, v, m: flash_attention_sharded(q, k, v, m, scale, False, ctx)
    )

    out_p = np.asarray(plain(q, k, v, mask), np.float32)
    out_s = np.asarray(sharded(q, k, v, mask), np.float32)
    diff = np.abs(out_p - out_s).max()
    print(f"max|plain - shard_map| = {diff:.3e}")
    assert diff < 1e-2, "shard_map path diverges from plain kernel"

    for name, fn in (("plain", plain), ("shard_map", sharded)):
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v, mask))  # np.asarray forces tunnel sync
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name:10s} median {np.median(ts):7.2f} ms (incl. tunnel RPC + fetch)")


if __name__ == "__main__":
    main()
