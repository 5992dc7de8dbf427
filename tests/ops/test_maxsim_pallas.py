"""Pallas MaxSim kernel tests (interpreter mode — hermetic on CPU).

Real-TPU validation of this kernel (bit-exactness vs XLA + bandwidth
measurements) runs in bench.py; these tests pin the semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.ops.maxsim import maxsim
from colpali_tpu.ops.maxsim_pallas import (
    maxsim_pallas,
    maxsim_pallas_int8_tm,
    maxsim_topk_tm,
    to_token_major,
)
from colpali_tpu.ops.quant import quantize_per_token


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestMaxSimPallas:
    def test_matches_xla_reference(self, rng):
        q = jnp.asarray(rng.normal(size=(4, 16, 128)).astype(np.float32))
        docs = jnp.asarray(rng.normal(size=(256, 32, 128)).astype(np.float32))
        expected = maxsim(q, docs)
        got = maxsim_pallas(q, docs, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=3e-3, atol=3e-3)

    def test_single_query(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 16, 128)).astype(np.float32))
        docs = jnp.asarray(rng.normal(size=(128, 16, 128)).astype(np.float32))
        expected = maxsim(q, docs)
        got = maxsim_pallas(q, docs, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=3e-3, atol=3e-3)

    def test_topk(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
        docs = jnp.asarray(rng.normal(size=(256, 16, 128)).astype(np.float32))
        scores, idx = maxsim_topk_tm(q, to_token_major(docs), k=5, interpret=True)
        full = np.asarray(maxsim(q, docs))
        expected_idx = np.argsort(-full, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), expected_idx)

    def test_non_multiple_of_tile_raises(self, rng):
        q = jnp.zeros((1, 16, 128), jnp.float32)
        docs = jnp.zeros((100, 16, 128), jnp.float32)
        with pytest.raises(ValueError, match="multiple of"):
            maxsim_pallas(q, docs, interpret=True)

    def test_int8_close_to_fp(self, rng):
        q = rng.normal(size=(2, 16, 128)).astype(np.float32)
        docs = rng.normal(size=(128, 16, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
        d_int8, scales = quantize_per_token(jnp.asarray(docs))
        got = maxsim_pallas_int8_tm(
            jnp.asarray(q),
            to_token_major(d_int8),
            jnp.transpose(scales, (1, 0)),
            interpret=True,
        )
        expected = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(docs)))
        # int8 quantization error on unit vectors is ~1/127 per component
        np.testing.assert_allclose(np.asarray(got), expected, rtol=0.05, atol=0.2)

    def test_int8_mxu_close_to_fp(self, rng):
        """Full-int8 MXU kernel (int8 matmuls, scales folded into max/sum)."""
        from colpali_tpu.ops.maxsim_pallas import maxsim_pallas_int8mxu_tm

        q = rng.normal(size=(2, 16, 128)).astype(np.float32)
        docs = rng.normal(size=(128, 16, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
        q_int8, q_scales = quantize_per_token(jnp.asarray(q))
        d_int8, d_scales = quantize_per_token(jnp.asarray(docs))
        got = maxsim_pallas_int8mxu_tm(
            q_int8, q_scales, to_token_major(d_int8), jnp.transpose(d_scales, (1, 0)), interpret=True
        )
        expected = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(docs)))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=0.05, atol=0.3)


class TestTileMajorKernels:
    """Tile-major layout: same math as token-major, contiguous DMA blocks."""

    def test_layout_roundtrip(self, rng):
        from colpali_tpu.ops.maxsim_pallas import scales_to_tile_major, to_tile_major

        tm = jnp.asarray(rng.normal(size=(8, 256, 16)).astype(np.float32))
        tiled = to_tile_major(tm)
        assert tiled.shape == (2, 8, 128, 16)
        # doc j of tile i is corpus doc i*128+j with all its tokens
        np.testing.assert_array_equal(np.asarray(tiled[1, :, 3]), np.asarray(tm[:, 131]))
        sc = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        sct = scales_to_tile_major(sc)
        assert sct.shape == (2, 8, 128)
        np.testing.assert_array_equal(np.asarray(sct[1, :, 3]), np.asarray(sc[:, 131]))

    def test_bf16_tiled_matches_xla(self, rng):
        from colpali_tpu.ops.maxsim_pallas import maxsim_pallas_tiled, to_tile_major

        q = jnp.asarray(rng.normal(size=(3, 16, 128)).astype(np.float32))
        docs = jnp.asarray(rng.normal(size=(256, 32, 128)).astype(np.float32))
        tiled = to_tile_major(to_token_major(docs))
        got = maxsim_pallas_tiled(q, tiled, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(maxsim(q, docs)), rtol=1e-5, atol=1e-5)

    def test_int8_tiled_close_to_fp(self, rng):
        from colpali_tpu.ops.maxsim_pallas import (
            maxsim_pallas_int8_tiled,
            scales_to_tile_major,
            to_tile_major,
        )

        q = rng.normal(size=(2, 16, 128)).astype(np.float32)
        docs = rng.normal(size=(128, 16, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
        d_int8, scales = quantize_per_token(jnp.asarray(docs))
        got = maxsim_pallas_int8_tiled(
            jnp.asarray(q),
            to_tile_major(to_token_major(d_int8)),
            scales_to_tile_major(jnp.transpose(scales, (1, 0))),
            interpret=True,
        )
        expected = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(docs)))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=0.05, atol=0.2)

    def test_int8_mxu_tiled_matches_token_major(self, rng):
        """The tiled full-int8 kernel must be bit-identical to the token-major
        one (identical math, different memory layout)."""
        from colpali_tpu.ops.maxsim_pallas import (
            maxsim_pallas_int8mxu_tiled,
            maxsim_pallas_int8mxu_tm,
            scales_to_tile_major,
            to_tile_major,
        )

        q = rng.normal(size=(2, 16, 128)).astype(np.float32)
        docs = rng.normal(size=(256, 16, 128)).astype(np.float32)
        q_int8, q_scales = quantize_per_token(jnp.asarray(q))
        d_int8, d_scales = quantize_per_token(jnp.asarray(docs))
        d_tm, s_tm = to_token_major(d_int8), jnp.transpose(d_scales, (1, 0))
        ref = maxsim_pallas_int8mxu_tm(q_int8, q_scales, d_tm, s_tm, interpret=True)
        got = maxsim_pallas_int8mxu_tiled(
            q_int8, q_scales, to_tile_major(d_tm), scales_to_tile_major(s_tm), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
