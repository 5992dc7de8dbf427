"""WAV loading for audio-document retrieval (the ColQwen-Omni family).

The reference's Omni processor consumes raw waveforms handed to it by the
caller (librosa/torchaudio in its examples —
/root/reference/colpali_engine/models/qwen_omni/colqwen_omni/processing_colqwen_omni.py:90-122);
this repo's corpus tooling loads standard PCM WAV with the stdlib so the
audio path has zero extra dependencies.
"""

from __future__ import annotations

import wave

import numpy as np

#: the Omni audio front-end's expected rate (processors/qwen_omni.SAMPLE_RATE)
TARGET_RATE = 16_000

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def load_wav(path: str, target_rate: int = TARGET_RATE) -> np.ndarray:
    """PCM WAV file -> mono float32 waveform in [-1, 1] at ``target_rate``.

    Multi-channel audio is averaged to mono; other sample rates are
    linearly resampled (adequate for speech/document audio — the mel
    front-end low-passes far below any interpolation artifacts).
    """
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width not in _PCM_DTYPES:
        raise ValueError(f"{path}: unsupported PCM sample width {width} bytes")
    a = np.frombuffer(raw, _PCM_DTYPES[width]).astype(np.float32)
    if width == 1:  # u8 WAV is unsigned, offset-binary
        a = (a - 128.0) / 128.0
    else:
        a = a / float(2 ** (8 * width - 1))
    if channels > 1:
        a = a.reshape(-1, channels).mean(axis=1)
    if rate != target_rate:
        n_out = max(1, int(round(a.shape[0] * target_rate / rate)))
        a = np.interp(
            np.linspace(0.0, a.shape[0] - 1, n_out, dtype=np.float64),
            np.arange(a.shape[0], dtype=np.float64),
            a,
        ).astype(np.float32)
    return a


def save_wav(path: str, waveform: np.ndarray, rate: int = TARGET_RATE) -> None:
    """Mono float32 [-1, 1] -> 16-bit PCM WAV (test/demo fixture writer)."""
    pcm = np.clip(np.asarray(waveform, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
