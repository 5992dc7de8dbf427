"""flash_seqmajor: the repo's seq-major flash kernel, in interpret mode.

Validates the REAL kernel body (running-max/denominator accumulation,
segment masking, ragged-tail masking, GQA head indexing, causal skip)
against a dense fp32 oracle on CPU. On-device numerics at the production
shapes are asserted by perf/flash_seq_probe.py (TPU-only).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.ops.flash_seqmajor import flash_seqmajor


def dense_oracle(q, k, v, seg, scale, causal=False):
    """(B,S,H,D) dense attention; attend iff segment ids match."""
    qf, kf, vf = (np.asarray(x, np.float64) for x in (q, k, v))
    b, s, h, d = qf.shape
    hkv = kf.shape[2]
    if hkv != h:
        rep = h // hkv
        kf = np.repeat(kf, rep, axis=2)
        vf = np.repeat(vf, rep, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    sq = np.asarray(seg)[:, None, :, None]
    skv = np.asarray(seg)[:, None, None, :]
    logits = np.where(sq == skv, logits, -1e30)
    if causal:
        qi = np.arange(s)[None, None, :, None]
        ki = np.arange(s)[None, None, None, :]
        logits = np.where(ki <= qi, logits, -1e30)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, vf)


def run(b, s, h, d, hkv=None, causal=False, seed=0, block_q=512, block_k=512,
        seg=None):
    rng = np.random.default_rng(seed)
    hkv = hkv or h
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    if seg is None:
        seg = np.ones((b, s), np.int32)
    out = np.asarray(
        flash_seqmajor(q, k, v, jnp.asarray(seg), d**-0.5, causal=causal,
                       block_q=block_q, block_k=block_k, interpret=True)
    )
    ref = dense_oracle(q, k, v, seg, d**-0.5, causal=causal)
    return out, ref, np.asarray(seg)


class TestFlashSeqmajor:
    @pytest.mark.parametrize("d", [80, 72, 128])
    def test_head_dims_full_attention(self, d):
        out, ref, _ = run(2, 64, 2, d)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_ragged_seq_multiple_q_blocks(self):
        # s=300 with block_q=128 -> 3 q blocks, last one ragged; block_k=128
        # -> 3 kv blocks with an in-kernel tail mask
        out, ref, _ = run(1, 300, 2, 80, block_q=128, block_k=128)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_padding_segments(self):
        seg = np.ones((2, 70), np.int32)
        seg[0, 60:] = 0  # right pad
        seg[1, :5] = 0  # left pad
        out, ref, seg = run(2, 70, 2, 32, seg=seg)
        valid = seg.astype(bool)
        np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-5)

    def test_window_segments_cross_block(self):
        # window ids spanning kv-block boundaries (Qwen2.5 windowed vision)
        s = 160
        seg = np.repeat(np.arange(s // 16), 16)[None, :].astype(np.int32)
        out, ref, _ = run(1, s, 2, 80, seg=seg, block_q=64, block_k=128)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_gqa_head_index_map(self):
        out, ref, _ = run(1, 96, 6, 32, hkv=2, block_q=32, block_k=32)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("s", [64, 200])
    def test_causal(self, s):
        out, ref, _ = run(1, s, 2, 32, causal=True, block_q=64, block_k=64)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_causal_with_padding(self):
        seg = np.ones((1, 100), np.int32)
        seg[0, 90:] = 0
        out, ref, seg = run(1, 100, 2, 32, causal=True, seg=seg,
                            block_q=32, block_k=32)
        valid = seg.astype(bool)
        np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-5)

    def test_bf16(self):
        rng = np.random.default_rng(3)
        b, s, h, d = 2, 128, 4, 80
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32), jnp.bfloat16)
        seg = jnp.ones((b, s), jnp.int32)
        out = np.asarray(
            flash_seqmajor(q, k, v, seg, d**-0.5, interpret=True), dtype=np.float32
        )
        ref = dense_oracle(q, k, v, np.ones((b, s), np.int32), d**-0.5)
        assert np.max(np.abs(out - ref)) < 0.05

    def test_numerics_need_many_kv_blocks(self):
        """Running max/denominator across >2 kv blocks with adversarial
        magnitudes (late block holds the max)."""
        rng = np.random.default_rng(4)
        b, s, h, d = 1, 384, 1, 32
        q = rng.normal(size=(b, s, h, d)).astype(np.float32)
        k = rng.normal(size=(b, s, h, d)).astype(np.float32)
        k[0, 300:] *= 8.0  # max logits live in the last kv block
        v = rng.normal(size=(b, s, h, d)).astype(np.float32)
        seg = np.ones((b, s), np.int32)
        out = np.asarray(
            flash_seqmajor(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(seg), d**-0.5, block_q=128, block_k=128,
                           interpret=True)
        )
        ref = dense_oracle(q, k, v, seg, d**-0.5)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
