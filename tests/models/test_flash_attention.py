"""flash_attention_padded: padding/segment/GQA plumbing tests.

The real Pallas kernel is TPU-only (numerics vs the chunked path measured
on-device: max|diff| 0.002 at the ColQwen2 vision shape — perf/flash_probe.py).
These tests validate OUR wrapper logic hermetically by substituting a dense
oracle with the kernel's exact segment semantics: tokens attend iff their
segment ids match (pads are segment 0, so pad rows attend pads — garbage
rows the callers mask downstream), plus optional causality.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import colpali_tpu.models.layers as layers_mod
from colpali_tpu.models.layers import Attention, flash_attention_padded, make_attention_bias


def _dense_segment_oracle(q, k, v, ab=None, segment_ids=None, *, causal=False,
                          sm_scale=1.0, block_sizes=None, debug=False):
    """Dense attention with SegmentIds semantics (stands in for the kernel)."""
    qf, kf, vf = (np.asarray(x, np.float32) for x in (q, k, v))
    b, h, s, d = qf.shape
    logits = np.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    if segment_ids is not None:
        sq = np.asarray(segment_ids.q)[:, None, :, None]
        skv = np.asarray(segment_ids.kv)[:, None, None, :]
        logits = np.where(sq == skv, logits, -1e30)
    if causal:
        qi = np.arange(s)[None, None, :, None]
        ki = np.arange(s)[None, None, None, :]
        logits = np.where(ki <= qi, logits, -1e30)
    logits -= logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=-1, keepdims=True)
    return jnp.asarray(np.einsum("bhqk,bhkd->bhqd", p, vf), q.dtype)


@pytest.fixture()
def oracle_kernel(monkeypatch):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    monkeypatch.setattr(fa, "flash_attention", _dense_segment_oracle)


class TestFlashPaddedWrapper:
    def _ref(self, q, k, v, mask, scale, causal):
        """The module's own bias path as ground truth on valid rows."""
        b, s, h, d = q.shape
        bias = make_attention_bias(mask.astype(jnp.int32), causal=causal)
        kv_heads = k.shape[2]
        groups = h // kv_heads
        qg = np.asarray(q, np.float32).reshape(b, s, kv_heads, groups, d)
        logits = np.einsum("bqhgd,bkhd->bhgqk", qg, np.asarray(k, np.float32)) * scale
        logits = logits + np.asarray(bias)[:, :, None, :, :]
        logits -= logits.max(-1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(-1, keepdims=True)
        out = np.einsum("bhgqk,bkhd->bqhgd", p, np.asarray(v, np.float32))
        return out.reshape(b, s, h, d)

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_bias_path_with_padding(self, oracle_kernel, causal):
        rng = np.random.default_rng(0)
        b, s, h, d = 2, 7, 4, 16  # s forces seq padding; d forces lane padding
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        mask = np.ones((b, s), np.int32)
        mask[0, 5:] = 0  # right padding
        mask[1, :2] = 0  # left padding
        out = np.asarray(flash_attention_padded(q, k, v, jnp.asarray(mask), d**-0.5, causal=causal))
        ref = self._ref(q, k, v, jnp.asarray(mask), d**-0.5, causal)
        valid = mask.astype(bool)
        np.testing.assert_allclose(out[valid], ref[valid], rtol=1e-4, atol=1e-5)

    def test_gqa_head_repeat(self, oracle_kernel):
        rng = np.random.default_rng(1)
        b, s, h, kvh, d = 1, 8, 6, 2, 16
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, kvh, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, kvh, d)).astype(np.float32))
        mask = jnp.ones((b, s), jnp.int32)
        out = np.asarray(flash_attention_padded(q, k, v, mask, d**-0.5))
        ref = self._ref(q, k, v, mask, d**-0.5, False)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_segments_express_window_attention(self, oracle_kernel):
        """Windowed attention (Qwen2.5 vision) = segment ids: the flash path
        with per-window ids must equal the module's segment-equality bias
        fallback on valid rows."""
        import jax

        rng = np.random.default_rng(3)
        b, s, dm = 1, 12, 32
        x = jnp.asarray(rng.normal(size=(b, s, dm)).astype(np.float32))
        # 3 windows of 4 tokens, last 2 tokens padding (id -1)
        seg = np.array([[0, 0, 0, 0, 1, 1, 1, 1, 2, 2, -1, -1]], np.int32)
        kwargs = dict(num_heads=4, head_dim=8, dtype=jnp.float32)
        attn_flash = Attention(**kwargs, use_flash=True)
        attn_ref = Attention(**kwargs, use_flash=False)
        v = attn_ref.init(jax.random.PRNGKey(0), x, segments=jnp.asarray(seg))
        out_f = np.asarray(attn_flash.apply(v, x, segments=jnp.asarray(seg)))
        out_r = np.asarray(attn_ref.apply(v, x, segments=jnp.asarray(seg)))
        valid = (seg >= 0)
        np.testing.assert_allclose(out_f[valid], out_r[valid], rtol=1e-4, atol=1e-5)
        # tokens in different windows must not influence each other: zeroing
        # window 1's inputs must not change window 0's outputs
        x2 = x.at[0, 4:8].set(0.0)
        out_r2 = np.asarray(attn_ref.apply(v, x2, segments=jnp.asarray(seg)))
        np.testing.assert_allclose(out_r[0, :4], out_r2[0, :4], rtol=1e-5, atol=1e-6)

    def test_attention_module_flash_toggle(self, oracle_kernel):
        """Attention(use_flash=True) through the oracle == bias path, on the
        valid rows (pad rows are garbage by design in the flash path)."""
        import jax

        rng = np.random.default_rng(2)
        b, s, dm = 2, 10, 32
        x = jnp.asarray(rng.normal(size=(b, s, dm)).astype(np.float32))
        mask = np.ones((b, s), np.int32)
        mask[1, 7:] = 0
        kwargs = dict(num_heads=4, head_dim=8, dtype=jnp.float32)
        attn_flash = Attention(**kwargs, use_flash=True)
        attn_ref = Attention(**kwargs, use_flash=False)
        variables = attn_ref.init(jax.random.PRNGKey(0), x, mask=jnp.asarray(mask))
        out_f = np.asarray(attn_flash.apply(variables, x, mask=jnp.asarray(mask)))
        out_r = np.asarray(attn_ref.apply(variables, x, mask=jnp.asarray(mask)))
        valid = mask.astype(bool)
        np.testing.assert_allclose(out_f[valid], out_r[valid], rtol=1e-4, atol=1e-5)
