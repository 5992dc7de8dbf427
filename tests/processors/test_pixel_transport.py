"""Pixel wire formats for bandwidth-limited ingestion (image_processing.py).

YUV420 halves (and gray thirds) the host->device bytes of the document-
embedding pipeline; these tests pin the BT.601 round-trip quality bounds and
the host_resize_rgb fast path's equivalence to the round-3 resize order.
"""

import numpy as np
import pytest
from PIL import Image

from colpali_tpu.processors.image_processing import (
    host_resize_rgb,
    normalize_pixels,
    rgb_to_yuv420,
    yuv420_to_rgb,
)


def _document_page(size=448):
    """White page, dark text bars, two colored figures, one gradient."""
    rng = np.random.default_rng(0)
    a = np.full((size, size, 3), 255, np.uint8)
    for _ in range(40):
        y0 = int(rng.integers(0, size - 8))
        x0 = int(rng.integers(0, size // 2))
        w = int(rng.integers(size // 4, size - x0))
        a[y0 : y0 + 3, x0 : x0 + w] = rng.integers(0, 80)
    a[50:150, 250:400] = [200, 60, 40]
    a[300:380, 60:200] = [30, 90, 180]
    return a


class TestYUV420:
    def test_grayscale_roundtrip_exact(self):
        rng = np.random.default_rng(1)
        gray = np.repeat(rng.integers(0, 256, size=(64, 64, 1)), 3, axis=2).astype(np.uint8)
        y, uv = rgb_to_yuv420(gray)
        rec = np.asarray(yuv420_to_rgb(y[None], uv[None]))[0]
        # achromatic input: chroma is constant 128, luma is lossless to +-1
        assert np.abs(rec - gray.astype(np.float32)).max() <= 1.0

    def test_document_page_roundtrip_tight(self):
        a = _document_page()
        y, uv = rgb_to_yuv420(a)
        rec = np.asarray(yuv420_to_rgb(y[None], uv[None]))[0]
        err = np.abs(rec - a.astype(np.float32))
        # colored-region interiors round-trip to ~1/255; only chroma EDGES
        # (2px) see subsampling error — far below int8 embedding quantization
        assert err.mean() < 0.5
        assert np.percentile(err, 99) < 4.0

    def test_half_the_bytes(self):
        a = _document_page(64)
        y, uv = rgb_to_yuv420(a)
        assert y.nbytes + uv.nbytes == a.nbytes // 2
        assert y.shape == (64, 64) and uv.shape == (32, 32, 2)

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError, match="even"):
            rgb_to_yuv420(np.zeros((63, 64, 3), np.uint8))

    def test_batched_device_decode_shape_dtype(self):
        a = _document_page(64)
        y, uv = rgb_to_yuv420(a)
        out = yuv420_to_rgb(np.stack([y, y]), np.stack([uv, uv]))
        assert out.shape == (2, 64, 64, 3)
        out = np.asarray(out)
        assert out.min() >= 0.0 and out.max() <= 255.0


class TestNormalizePixels:
    def test_matches_hf_pipeline_order(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 255, size=(2, 8, 8, 3)).astype(np.float32)
        got = np.asarray(normalize_pixels(x, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
        np.testing.assert_allclose(got, (x / 255.0 - 0.5) / 0.5, rtol=1e-6)


class TestHostResizeRgb:
    def test_matches_convert_first_order_for_rgb(self):
        """resize-then-convert == convert-then-resize when source is RGB."""
        a = _document_page(128)
        im = Image.fromarray(a)
        fast = host_resize_rgb(im, (56, 56))
        slow = np.asarray(
            Image.fromarray(np.asarray(im.convert("RGB"))).resize(
                (56, 56), Image.Resampling.BICUBIC
            )
        )
        np.testing.assert_array_equal(fast, slow)

    def test_grayscale_and_rgba_inputs(self):
        gray = Image.fromarray(np.full((64, 64), 200, np.uint8), mode="L")
        out = host_resize_rgb(gray, (32, 32))
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
        rgba = Image.fromarray(
            np.concatenate([_document_page(64), np.full((64, 64, 1), 255, np.uint8)], -1),
            mode="RGBA",
        )
        out = host_resize_rgb(rgba, (32, 32))
        assert out.shape == (32, 32, 3)

    def test_no_resize_when_already_target(self):
        a = _document_page(56)
        out = host_resize_rgb(Image.fromarray(a), (56, 56))
        np.testing.assert_array_equal(out, a)

    def test_numpy_input(self):
        a = _document_page(64)
        out = host_resize_rgb(a, (32, 32))
        assert out.shape == (32, 32, 3)


class TestPilStaging:
    """stage_yuv420 / stage_gray: the all-PIL-C-speed host staging paths.

    They must agree with the fp32 reference math (rgb_to_yuv420 /
    BT.601 luma over host_resize_rgb output) to +-1 u8 step — PIL's
    fixed-point YCbCr vs our float matmul.
    """

    def test_stage_yuv420_matches_fp32_reference(self):
        from colpali_tpu.processors.image_processing import stage_yuv420

        a = _document_page(448)
        im = Image.fromarray(a)
        y_fast, uv_fast = stage_yuv420(im, (448, 448))
        y_ref, uv_ref = rgb_to_yuv420(host_resize_rgb(im, (448, 448)))
        assert y_fast.shape == y_ref.shape and uv_fast.shape == uv_ref.shape
        assert np.abs(y_fast.astype(int) - y_ref.astype(int)).max() <= 1
        assert np.abs(uv_fast.astype(int) - uv_ref.astype(int)).max() <= 1

    def test_stage_gray_matches_bt601_luma(self):
        from colpali_tpu.processors.image_processing import stage_gray

        a = _document_page(448)
        y_fast = stage_gray(Image.fromarray(a), (448, 448))
        rgb = host_resize_rgb(Image.fromarray(a), (448, 448)).astype(np.float32)
        y_ref = np.clip(
            np.rint(rgb @ np.array([0.299, 0.587, 0.114], np.float32)), 0, 255
        ).astype(np.uint8)
        assert y_fast.shape == y_ref.shape
        assert np.abs(y_fast.astype(int) - y_ref.astype(int)).max() <= 1

    def test_reducing_gap_stays_close_to_exact_bicubic(self):
        """reducing_gap=1.0 (box pre-reduce) must stay visually equivalent:
        bounded max step and tiny mean drift on a document page."""
        from PIL import Image as PILImage

        a = np.kron(_document_page(412), np.ones((4, 4, 1))).astype(np.uint8)
        im = PILImage.fromarray(a)  # 1648x1648 page, ~3.7x downscale
        exact = host_resize_rgb(im, (448, 448))
        fast = host_resize_rgb(im, (448, 448), reducing_gap=1.0)
        diff = np.abs(exact.astype(int) - fast.astype(int))
        assert diff.mean() < 2.0
        assert np.percentile(diff, 99) <= 24  # block-edge pixels; <10% of u8 range

    def test_stage_accepts_numpy_input(self):
        from colpali_tpu.processors.image_processing import stage_gray, stage_yuv420

        a = _document_page(64)
        y, uv = stage_yuv420(a, (32, 32))
        assert y.shape == (32, 32) and uv.shape == (16, 16, 2)
        g = stage_gray(a, (32, 32))
        assert g.shape == (32, 32) and g.dtype == np.uint8

    def test_packed_wire_buffer_roundtrip(self):
        """pack_yuv420_group -> unpack_yuv420 must return the exact planes
        (the packed form exists so a group is ONE host->device transfer)."""
        from colpali_tpu.processors.image_processing import (
            pack_yuv420_group,
            stage_yuv420,
            unpack_yuv420,
        )

        size, chunk, batch = 32, 2, 3
        planes = [
            stage_yuv420(_document_page(64), (size, size))
            for _ in range(chunk * batch)
        ]
        buf = np.empty((chunk, batch, size * size * 3 // 2), np.uint8)
        pack_yuv420_group(planes, buf, size)
        y, uv = unpack_yuv420(buf, size)
        y, uv = np.asarray(y), np.asarray(uv)
        for j, (y_ref, uv_ref) in enumerate(planes):
            c, b = divmod(j, batch)
            assert (y[c, b] == y_ref).all()
            assert (uv[c, b] == uv_ref).all()
