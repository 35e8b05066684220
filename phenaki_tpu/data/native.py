"""ctypes bindings for the native C++ IO runtime (native/phenaki_io.cpp).

Replaces the PIL GIF decode/encode hot path (reference data.py:88-124) with a
self-contained C++ codec plus a thread-pool batch loader that decodes a whole
training batch in parallel straight into one contiguous float32 buffer.

The library is built on demand with `make -C native` (g++ is part of the
image); if the build or load fails, callers fall back to the PIL path — the
Python API surface is identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libphenaki_io.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.io_gif_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.io_gif_probe.restype = ctypes.c_int
    lib.io_gif_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.io_gif_decode.restype = ctypes.c_int
    lib.io_gif_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.io_gif_encode.restype = ctypes.c_int
    lib.io_load_gif_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.io_load_gif_batch.restype = ctypes.c_int
    lib.io_transform_image.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.io_transform_image.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def gif_decode(path: str) -> np.ndarray:
    """GIF file -> (frames, H, W, 3) uint8 (full-canvas composited frames)."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    w = ctypes.c_int()
    h = ctypes.c_int()
    f = ctypes.c_int()
    rc = lib.io_gif_probe(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(f))
    if rc != 0:
        raise ValueError(f"failed to parse gif {path!r} (rc={rc})")
    out = np.empty((f.value, h.value, w.value, 3), np.uint8)
    rc = lib.io_gif_decode(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"failed to decode gif {path!r} (rc={rc})")
    return out


def gif_encode(
    path: str, frames: np.ndarray, *, delay_ms: int = 120, loop: int = 0
) -> None:
    """(frames, H, W, 3) uint8 -> animated GIF file."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    frames = np.ascontiguousarray(frames, np.uint8)
    assert frames.ndim == 4 and frames.shape[-1] == 3
    F, H, W, _ = frames.shape
    rc = lib.io_gif_encode(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        F,
        H,
        W,
        delay_ms,
        loop,
    )
    if rc != 0:
        raise IOError(f"failed to write gif {path!r} (rc={rc})")


def load_gif_batch(
    paths: Sequence[str],
    *,
    num_frames: int,
    height: int,
    width: int,
    hflip: Optional[np.ndarray] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode + transform a batch of GIFs in parallel (C++ thread pool) into
    (n, num_frames, height, width, 3) float32 in [0, 1]. Short videos are
    zero-padded (cast_num_frames semantics); failed files decode to zeros."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    n = len(paths)
    out = np.empty((n, num_frames, height, width, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if hflip is not None:
        hflip = np.ascontiguousarray(hflip, np.uint8)
        hflip_ptr = hflip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        hflip_ptr = None
    lib.io_load_gif_batch(
        c_paths,
        n,
        num_frames,
        height,
        width,
        hflip_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out


def transform_image(
    img: np.ndarray, *, height: int, width: int, hflip: bool = False
) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 (height, width, 3): bilinear short-side
    resize + center crop + optional hflip + [0,1] scale."""
    lib = get_lib()
    assert lib is not None, "native IO library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, _ = img.shape
    out = np.empty((height, width, 3), np.float32)
    lib.io_transform_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sh,
        sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        1 if hflip else 0,
    )
    return out
