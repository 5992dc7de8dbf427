"""ColQwen2_5Omni processor: audio (mel) / image / video documents.

Behavioral spec: reference ColQwen2_5OmniProcessor
(/root/reference/colpali_engine/models/qwen_omni/colqwen_omni/processing_colqwen_omni.py):
chat-template conversations per modality, ``query_prefix = "Query: "``,
process_images / process_audios / process_videos; Whisper-style feature
extraction (16 kHz, 128 mel bins, 25 ms window / 10 ms hop) feeding the audio
tower; ``get_n_patches`` raises (no spatial grid for audio docs).

The mel front-end is a numpy port of WhisperFeatureExtractor's log-mel
pipeline (Slaney-scale filterbank, log10, max-8 clamp, (x+4)/4 scaling).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import numpy as np

from colpali_tpu.processors.base import Batch
from colpali_tpu.processors.qwen2_5_vl import ColQwen2_5Processor

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 128


def _hertz_to_mel(freq):
    """Slaney mel scale (HF audio_utils convention)."""
    freq = np.asarray(freq, np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    logstep = 27.0 / np.log(6.4)
    return np.where(log_region, 15.0 + np.log(np.maximum(freq, 1e-10) / 1000.0) * logstep, mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    freq = 200.0 * mels / 3.0
    log_region = mels >= 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(log_region, 1000.0 * np.exp(logstep * (mels - 15.0)), freq)


def mel_filter_bank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = N_MELS, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Triangular Slaney-normalized filterbank (HF mel_filter_bank equivalent)."""
    fft_freqs = np.linspace(0, sr // 2, n_freqs)
    mel_pts = np.linspace(_hertz_to_mel(0.0), _hertz_to_mel(8000.0), n_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0, np.minimum(down, up))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


def log_mel_spectrogram(waveform: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """(T_samples,) float waveform @16kHz -> (n_mels, T_frames) log-mel.

    Whisper pipeline: hann window, |STFT|^2, mel filterbank, log10 with 1e-10
    floor, clamp at max-8, (x + 4) / 4.
    """
    waveform = np.asarray(waveform, np.float32)
    pad = N_FFT // 2
    padded = np.pad(waveform, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, n=N_FFT, axis=1)) ** 2  # (T, n_freqs)
    mel = spec @ mel_filter_bank(n_mels=n_mels)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    # Whisper drops the final frame (matches HF extractor output length)
    return log_spec[:-1].T.astype(np.float32)


class ColQwen2_5OmniProcessor(ColQwen2_5Processor):  # noqa: N801
    query_prefix: str = "Query: "
    audio_token: str = "<|AUDIO|>"
    audio_bos: str = "<|audio_bos|>"
    audio_eos: str = "<|audio_eos|>"

    def __init__(self, *args, n_window: int = 100, num_mel_bins: int = N_MELS,
                 position_id_per_seconds: int = 25, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_window = n_window
        self.num_mel_bins = num_mel_bins
        # temporal M-RoPE granularity for video documents: position ids per
        # second of video (thinker config position_id_per_seconds, default 25)
        self.position_id_per_seconds = position_id_per_seconds
        self.audio_token_id = self.tokenizer.convert_tokens_to_ids(self.audio_token)
        self.video_token_id = self.tokenizer.convert_tokens_to_ids(self.video_token)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColQwen2_5OmniProcessor":
        """Also read the audio chunking geometry (n_window, num_mel_bins)
        from config.json's thinker audio_config — mel chunk boundaries must
        match the checkpoint's audio tower exactly."""
        import json
        import os

        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            thinker = cfg.get("thinker_config", cfg)
            audio_cfg = thinker.get("audio_config", {})
            if "n_window" in audio_cfg:
                kwargs.setdefault("n_window", audio_cfg["n_window"])
            if "num_mel_bins" in audio_cfg:
                kwargs.setdefault("num_mel_bins", audio_cfg["num_mel_bins"])
            if "position_id_per_seconds" in thinker:
                kwargs.setdefault("position_id_per_seconds",
                                  thinker["position_id_per_seconds"])
        return super().from_pretrained(path, **kwargs)

    def _audio_prompt(self, n_tokens: int) -> str:
        return (
            "<|im_start|>user\n"
            f"{self.audio_bos}{self.audio_token * n_tokens}{self.audio_eos}"
            "Describe the audio.<|im_end|><|endoftext|>"
        )

    def process_audios(self, audios: Sequence[np.ndarray], sampling_rate: int = SAMPLE_RATE) -> Batch:
        """Waveforms -> chunked mel batches + expanded prompts.

        Output: input_ids/attention_mask plus ``audio_chunks
        (B, C, 2*n_window, mel)`` and ``audio_frame_mask``.
        """
        if sampling_rate != SAMPLE_RATE:
            raise ValueError(f"Expected {SAMPLE_RATE}Hz audio, got {sampling_rate}")
        chunk_len = 2 * self.n_window

        mels: List[np.ndarray] = [log_mel_spectrogram(a, self.num_mel_bins) for a in audios]
        texts = []
        per_audio_chunks: List[List[Tuple[np.ndarray, int]]] = []
        for mel in mels:
            t = mel.shape[1]
            chunks = []
            n_tokens = 0
            for start in range(0, t, chunk_len):
                valid = min(chunk_len, t - start)
                chunks.append((mel[:, start : start + valid], valid))
                after_cnn = (valid - 1) // 2 + 1
                n_tokens += after_cnn // 2
            per_audio_chunks.append(chunks)
            texts.append(self._audio_prompt(n_tokens))

        batch = self._tokenize(texts)
        c_max = max(len(c) for c in per_audio_chunks)
        b = len(audios)
        audio_chunks = np.zeros((b, c_max, chunk_len, self.num_mel_bins), np.float32)
        frame_mask = np.zeros((b, c_max, chunk_len), bool)
        for i, chunks in enumerate(per_audio_chunks):
            for c, (mel_chunk, valid) in enumerate(chunks):
                audio_chunks[i, c, :valid] = mel_chunk.T
                frame_mask[i, c, :valid] = True
        batch["audio_chunks"] = audio_chunks
        batch["audio_frame_mask"] = frame_mask
        return batch

    video_token: str = "<|VIDEO|>"

    def process_videos(self, videos: Sequence[Any], fps: float = 1.0) -> Batch:
        """Videos -> qwen2.5 vision pipeline with temporal patching (pairs
        of frames share one temporal patch, grid_t = T/2).

        Each entry is either a frame sequence (arrays / PIL) or a video FILE
        PATH, decoded + fps-sampled via utils/video.load_video_frames (the
        reference delegates paths to HF's torchvision/decord backends,
        processing_colqwen_omni.py:153; here OpenCV/imageio fill that role).
        """
        import os

        import jax
        import jax.numpy as jnp

        from colpali_tpu.processors.image_processing import to_rgb_array
        from colpali_tpu.processors.qwen2_vl import (
            get_rope_index,
            patchify_video,
            smart_resize,
            vision_positions,
        )
        from colpali_tpu.processors.qwen2_5_vl import window_ids_from_positions
        from colpali_tpu.utils.video import load_video_frames

        videos = [
            load_video_frames(os.fspath(v), fps=fps) if isinstance(v, (str, os.PathLike)) else v
            for v in videos
        ]
        flats, grids = [], []
        for frames in videos:
            # uint8 upload (float32 would be 4x the host->device bytes)
            arrs = [to_rgb_array(f) for f in frames]
            h0, w0 = arrs[0].shape[:2]
            h1, w1 = smart_resize(h0, w0, self.patch_size * self.merge_size, self.min_pixels, self.max_pixels)
            # all frames of one video share a shape: resize them in ONE
            # batched device call (per-frame dispatch is the hot spot on
            # remote-attached accelerators)
            resized = np.asarray(
                jax.image.resize(
                    jnp.asarray(np.stack(arrs)).astype(jnp.float32),
                    (len(arrs), h1, w1, 3), method="bicubic", antialias=True,
                )
            )
            norm = ((resized / 255.0 - self.image_mean) / self.image_std).transpose(0, 3, 1, 2)
            flat, grid = patchify_video(
                norm, self.patch_size, self.temporal_patch_size, self.merge_size
            )
            flats.append(flat)
            grids.append(grid)

        texts = []
        for t, h, w in grids:
            n_merged = t * (h // self.merge_size) * (w // self.merge_size)
            texts.append(
                "<|im_start|>user\n<|vision_start|>"
                + self.video_token * n_merged
                + "<|vision_end|>Describe the video.<|im_end|><|endoftext|>"
            )
        batch = self._tokenize(texts)

        group = self.merge_size**2
        p_max = ((max(f.shape[0] for f in flats) + group - 1) // group) * group
        b = len(videos)
        pixel_values = np.zeros((b, p_max, flats[0].shape[1]), np.float32)
        patch_mask = np.zeros((b, p_max), bool)
        hpos = np.zeros((b, p_max), np.int32)
        wpos = np.zeros((b, p_max), np.int32)
        window_id = np.full((b, p_max), -1, np.int32)
        for i, (flat, grid) in enumerate(zip(flats, grids)):
            n = flat.shape[0]
            pixel_values[i, :n] = flat
            patch_mask[i, :n] = True
            hp, wp = vision_positions(grid, self.merge_size)
            hpos[i, :n] = hp
            wpos[i, :n] = wp
            window_id[i, :n] = window_ids_from_positions(
                hp, wp, grid, self.merge_size, self._window_patches
            )
        batch.update(
            pixel_values=pixel_values, patch_mask=patch_mask, vision_hpos=hpos,
            vision_wpos=wpos, window_id=window_id,
            video_grid_thw=np.asarray(grids, np.int64),
        )
        # real-time temporal M-RoPE: each temporal grid covers
        # temporal_patch_size / fps seconds, and positions stride
        # position_id_per_seconds per second (the Omni convention; plain
        # qwen2.5-VL strides 1 per grid). video_second_per_grid is
        # metadata for the HF-oracle/interop feed, like *_grid_thw.
        spg = self.temporal_patch_size / fps
        batch["video_second_per_grid"] = np.full(b, spg, np.float32)
        batch["position_ids"] = get_rope_index(
            batch["input_ids"],
            batch["attention_mask"],
            batch["video_grid_thw"],
            self.video_token_id,
            self.vision_start_token_id,
            self.merge_size,
            t_steps=np.full(b, spg * self.position_id_per_seconds, np.float64),
        )
        return batch

    def process_queries(self, texts=None, queries=None, **kwargs) -> Batch:
        return super().process_queries(texts=texts, queries=queries, **kwargs)

    def get_n_patches(self, image_size, *args, **kwargs):
        raise NotImplementedError(
            "ColQwen2_5OmniProcessor does not expose a spatial patch grid "
            "(reference processing_colqwen_omni.py:226-238 raises as well)."
        )
