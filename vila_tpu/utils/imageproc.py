"""Native batched frame resize — ctypes binding for native/imageproc.cpp.

The video prompt host path resizes 64-512 decoded frames per request; one
native call over the whole stack replaces per-frame PIL round trips
(llava/mm_utils.py:35-203's cv2-resize role). Falls back to PIL where no
compiler exists. Bicubic a=-0.75 (cv2 INTER_CUBIC semantics).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.join(_NATIVE_DIR, "imageproc.cpp")
        so = os.path.join(_NATIVE_DIR, "libimageproc.so")
        try:
            if not os.path.exists(so) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(so)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.resize_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.resize_batch_u8.restype = None
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB


def resize_frames(frames: np.ndarray, size: int) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, size, size, 3) uint8, bicubic."""
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    n, h, w, _ = frames.shape
    if h == size and w == size:
        return frames
    lib = _load_lib()
    if lib is not None:
        src = np.ascontiguousarray(frames)
        dst = np.empty((n, size, size, 3), np.uint8)
        lib.resize_batch_u8(
            src.ctypes.data_as(ctypes.c_void_p), n, h, w,
            dst.ctypes.data_as(ctypes.c_void_p), size, size,
        )
        return dst
    # PIL fallback
    from PIL import Image as PILImage

    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        out[i] = np.asarray(
            PILImage.fromarray(frames[i]).resize(
                (size, size), PILImage.BICUBIC
            )
        )
    return out


def resize_pil_batch(pil_frames: List, size: int) -> np.ndarray:
    """List of PIL images (mixed sizes allowed) -> (N, size, size, 3).

    Same-shaped frames batch through one native call; stragglers resize
    individually."""
    arrs = [np.asarray(f.convert("RGB")) for f in pil_frames]
    out = np.empty((len(arrs), size, size, 3), np.uint8)
    by_shape: dict = {}
    for i, a in enumerate(arrs):
        by_shape.setdefault(a.shape, []).append(i)
    for shape, idxs in by_shape.items():
        stack = np.stack([arrs[i] for i in idxs])
        resized = resize_frames(stack, size)
        for j, i in enumerate(idxs):
            out[i] = resized[j]
    return out
