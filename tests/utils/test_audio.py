"""WAV loading (utils/audio.py): PCM round-trip, mono mixdown, resampling."""

import wave

import numpy as np

from colpali_tpu.utils.audio import TARGET_RATE, load_wav, save_wav


def _sine(rate: int, seconds: float = 0.25, f0: float = 440.0) -> np.ndarray:
    t = np.arange(int(rate * seconds), dtype=np.float32) / rate
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


class TestLoadWav:
    def test_int16_roundtrip(self, tmp_path):
        wav = _sine(TARGET_RATE)
        path = str(tmp_path / "a.wav")
        save_wav(path, wav)
        out = load_wav(path)
        assert out.dtype == np.float32 and out.shape == wav.shape
        np.testing.assert_allclose(out, wav, atol=2 / 32768)

    def test_stereo_mixdown(self, tmp_path):
        left = _sine(TARGET_RATE)
        right = -left  # cancels to silence when averaged
        inter = np.stack([left, right], axis=1).reshape(-1)
        pcm = (np.clip(inter, -1, 1) * 32767).astype(np.int16)
        path = str(tmp_path / "st.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(TARGET_RATE)
            w.writeframes(pcm.tobytes())
        out = load_wav(path)
        assert out.shape == left.shape
        assert np.abs(out).max() < 1e-3

    def test_resample_44k_to_16k(self, tmp_path):
        rate_in = 44100
        wav = _sine(rate_in, seconds=0.5, f0=220.0)
        path = str(tmp_path / "r.wav")
        save_wav(path, wav, rate=rate_in)
        out = load_wav(path)
        expect_len = int(round(wav.shape[0] * TARGET_RATE / rate_in))
        assert abs(out.shape[0] - expect_len) <= 1
        # a 220 Hz tone survives linear resampling nearly unchanged: compare
        # against the analytically expected sine at the new rate (endpoint
        # mapping stretches the effective rate by n/(n-1), so phase drifts
        # ~one part in n_out toward the end — bound, don't zero, the error)
        t = np.arange(out.shape[0], dtype=np.float32) / TARGET_RATE
        ref = 0.5 * np.sin(2 * np.pi * 220.0 * t)
        assert np.abs(out - ref).max() < 0.05
        assert np.sqrt(np.mean((out - ref) ** 2)) < 0.02

    def test_u8_offset_binary(self, tmp_path):
        path = str(tmp_path / "u8.wav")
        pcm = np.array([128, 255, 0, 128], np.uint8)  # 0, ~+1, -1, 0
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(TARGET_RATE)
            w.writeframes(pcm.tobytes())
        out = load_wav(path)
        np.testing.assert_allclose(out, [0.0, 127 / 128, -1.0, 0.0], atol=1e-6)
