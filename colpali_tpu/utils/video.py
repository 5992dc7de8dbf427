"""Video file decoding for the Omni processor.

The reference delegates video decoding to HF's pluggable backends
(torchvision / decord / pyav — processing_colqwen_omni.py:153 passes
``videos=`` straight to the HF processor). Here the same role is filled by
whichever of OpenCV / imageio is importable; no backend is a hard
dependency (frame arrays are always accepted directly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _decode_cv2(path: str) -> Tuple[np.ndarray, float]:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"OpenCV could not open video file: {path}")
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        raise ValueError(f"No frames decoded from {path}")
    return np.stack(frames), native_fps


def _decode_imageio(path: str) -> Tuple[np.ndarray, float]:
    import imageio.v3 as iio

    frames = iio.imread(path, plugin=None)  # (T, H, W, 3) RGB
    meta = iio.immeta(path)
    if frames.ndim == 3:
        frames = frames[None]
    # containers without a frame-rate field report fps=None
    return np.asarray(frames), float(meta.get("fps") or 0.0)


_BACKENDS = {"cv2": _decode_cv2, "imageio": _decode_imageio}


def load_video_frames(
    path: str,
    fps: float = 1.0,
    max_frames: Optional[int] = None,
    backend: Optional[str] = None,
) -> np.ndarray:
    """Decode a video file and sample frames at ``fps`` frames per second.

    Args:
        path: video file path (any format the backend's codecs support).
        fps: target sampling rate; frames are picked uniformly from the
            native timeline. If the native rate is unknown, all frames are
            kept (then capped by ``max_frames``).
        max_frames: optional hard cap on sampled frames (uniform thinning).
        backend: force "cv2" or "imageio"; default tries cv2 then imageio.

    Returns:
        ``(T, H, W, 3)`` uint8 RGB frames, T made even (the Qwen vision
        stack's temporal patch size is 2; the last frame is repeated, as the
        HF video processor does).
    """
    names = [backend] if backend else ["cv2", "imageio"]
    frames = native_fps = None
    errors = []
    for name in names:
        if name not in _BACKENDS:
            raise ValueError(f"Unknown video backend {name!r} (cv2 or imageio)")
        try:
            frames, native_fps = _BACKENDS[name](path)
            break
        except ImportError as e:
            errors.append(f"{name}: not installed ({e})")
        except Exception as e:  # noqa: BLE001 — codec/container failures fall through
            errors.append(f"{name}: {e}")
    if frames is None:
        if all("not installed" in e for e in errors):
            raise ImportError(
                "No video decoding backend available (install opencv-python "
                f"or imageio, or pass frame arrays directly): {errors}"
            )
        raise ValueError(f"Could not decode {path!r} with any backend: {errors}")

    n = frames.shape[0]
    if native_fps and fps and native_fps > fps:
        idx = np.arange(0, n, native_fps / fps).astype(np.int64)
        frames = frames[np.minimum(idx, n - 1)]
    if max_frames is not None and frames.shape[0] > max_frames:
        idx = np.linspace(0, frames.shape[0] - 1, max_frames).astype(np.int64)
        frames = frames[idx]
    if frames.shape[0] % 2 == 1:  # temporal patch pairs
        frames = np.concatenate([frames, frames[-1:]])
    return np.ascontiguousarray(frames.astype(np.uint8))
