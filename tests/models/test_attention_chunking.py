"""Query-chunked attention == dense attention (the O(S^2) logits tensor is
the vision-tower HBM ceiling at large batch; chunking must not change
values)."""

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.layers import Attention, make_attention_bias


def _run(q_chunk, x, mask, rope=None):
    attn = Attention(num_heads=4, head_dim=8, num_kv_heads=2, q_chunk=q_chunk)
    bias = make_attention_bias(mask, causal=True)
    params = attn.init(jax.random.PRNGKey(0), x, bias)
    return np.asarray(attn.apply(params, x, bias))


def test_chunked_matches_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 37, 32)).astype(np.float32))
    mask = np.ones((2, 37), np.int32)
    mask[1, 30:] = 0
    mask = jnp.asarray(mask)
    dense = _run(None, x, mask)
    chunked = _run(16, x, mask)  # 37 -> 3 blocks of 16 with padding
    np.testing.assert_allclose(chunked, dense, atol=1e-6)


def test_chunked_without_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 20, 32)).astype(np.float32))
    attn_d = Attention(num_heads=4, head_dim=8, q_chunk=None)
    attn_c = Attention(num_heads=4, head_dim=8, q_chunk=8)
    params = attn_d.init(jax.random.PRNGKey(0), x)
    dense = np.asarray(attn_d.apply(params, x))
    chunked = np.asarray(attn_c.apply(params, x))
    np.testing.assert_allclose(chunked, dense, atol=1e-6)


def test_chunked_with_broadcast_bias():
    """(B, 1, 1, Sk) key-only bias (query-broadcast) must work chunked."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 21, 32)).astype(np.float32))
    mask = np.ones((2, 21), np.int32)
    mask[0, 15:] = 0
    bias = jnp.where(jnp.asarray(mask)[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
    attn_d = Attention(num_heads=4, head_dim=8, q_chunk=None)
    attn_c = Attention(num_heads=4, head_dim=8, q_chunk=8)
    params = attn_d.init(jax.random.PRNGKey(0), x, bias)
    np.testing.assert_allclose(
        np.asarray(attn_c.apply(params, x, bias)),
        np.asarray(attn_d.apply(params, x, bias)),
        atol=1e-6,
    )
