"""Video codecs: gif <-> tensor (PIL), mp4 <-> tensor (cv2).

Reference: data.py:78-192. All tensors are channels-last numpy float32 in
[0, 1] with shape (frames, H, W, c) — the layout the TPU models consume
directly (the reference uses torch (c, f, H, W))."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

CHANNELS_TO_MODE = {1: "L", 3: "RGB", 4: "RGBA"}


def seek_all_images(img: Image.Image, channels: int = 3):
    """Iterate all frames of a (possibly animated) PIL image
    (reference data.py:88-99)."""
    mode = CHANNELS_TO_MODE[channels]
    i = 0
    while True:
        try:
            img.seek(i)
            yield img.convert(mode)
        except EOFError:
            break
        i += 1


def video_tensor_to_gif(
    tensor: np.ndarray,
    path: str,
    duration: int = 120,
    loop: int = 0,
    optimize: bool = True,
) -> None:
    """(frames, H, W, c) float [0,1] -> animated gif (reference data.py:103-113).

    Uses the native C++ encoder (native/phenaki_io.cpp) when available;
    falls back to PIL."""
    tensor = np.asarray(tensor)
    frames = np.clip(tensor * 255.0, 0, 255).astype(np.uint8)

    if frames.shape[-1] == 3:
        from phenaki_tpu.data import native

        if native.available():
            native.gif_encode(path, frames, delay_ms=duration, loop=loop)
            return
    images = [Image.fromarray(f.squeeze(-1) if f.shape[-1] == 1 else f) for f in frames]
    first, *rest = images
    first.save(
        path,
        save_all=True,
        append_images=rest,
        duration=duration,
        loop=loop,
        optimize=optimize,
    )


def gif_to_tensor(path: str, channels: int = 3, transform=None) -> np.ndarray:
    """gif -> (frames, H, W, c) float32 [0,1] (reference data.py:117-124).

    With no per-frame transform and RGB output, decoding goes through the
    native C++ codec when available."""
    if transform is None and channels == 3:
        from phenaki_tpu.data import native

        if native.available():
            return native.gif_decode(path).astype(np.float32) / 255.0

    img = Image.open(path)
    frames = []
    for frame in seek_all_images(img, channels=channels):
        if transform is not None:
            frame = transform(frame)
        arr = np.asarray(frame, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        frames.append(arr)
    return np.stack(frames, axis=0)


def crop_center(img: np.ndarray, cropx: int, cropy: int) -> np.ndarray:
    """(H, W, c) center crop (reference data.py:184-192)."""
    y, x = img.shape[:2]
    sx = max(x // 2 - cropx // 2, 0)
    sy = max(y // 2 - cropy // 2, 0)
    return img[sy : sy + cropy, sx : sx + cropx]


def video_to_tensor(
    path: str, num_frames: int = -1, crop_size: Optional[int | Tuple[int, int]] = None
) -> np.ndarray:
    """mp4 -> (frames, H, W, c) float32 [0,1] via cv2, BGR->RGB
    (reference data.py:128-155)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if crop_size is not None:
            cs = crop_size if isinstance(crop_size, tuple) else (crop_size, crop_size)
            frame = crop_center(frame, cs[1], cs[0])
        frames.append(frame)
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    video = np.stack(frames, axis=0).astype(np.float32) / 255.0
    if num_frames > 0:
        video = video[:num_frames]
    return video


def tensor_to_video(
    tensor: np.ndarray, path: str, fps: int = 25, video_format: str = "MP4V"
) -> None:
    """(frames, H, W, c) float [0,1] -> mp4 via cv2 (reference data.py:157-182)."""
    import cv2

    tensor = np.asarray(tensor)
    frames = np.clip(tensor * 255.0, 0, 255).astype(np.uint8)
    _, H, W, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*video_format)
    writer = cv2.VideoWriter(path, fourcc, fps, (W, H))
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
