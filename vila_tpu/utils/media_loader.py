"""Video frame loading: uniform / fps-capped sampling.

Capability parity: `_load_video` (llava/utils/media.py:39-83) and frame
samplers in llava/mm_utils.py:35-203. cv2 is optional — frame directories
and pre-extracted frame lists work without it.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from vila_tpu.media import Video

try:
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    HAS_CV2 = False


def _load_from_dir(path: str, num_frames: int) -> List:
    from PIL import Image as PILImage

    frame_paths = sorted(glob.glob(os.path.join(path, "*")))
    if not frame_paths:
        raise ValueError(f"no frames in directory {path}")
    indices = np.round(
        np.linspace(0, len(frame_paths) - 1, num_frames)
    ).astype(int)
    return [PILImage.open(frame_paths[i]).convert("RGB") for i in indices]


def _load_from_file(path: str, num_frames: int, fps: float) -> List:
    if not HAS_CV2:
        raise RuntimeError(
            "cv2 is required to decode video files; pass a frame directory "
            "or a pre-extracted frame list instead"
        )
    from PIL import Image as PILImage

    vidcap = cv2.VideoCapture(path)
    video_fps = vidcap.get(cv2.CAP_PROP_FPS)
    frame_count = int(vidcap.get(cv2.CAP_PROP_FRAME_COUNT))
    # Find the last readable frame — counts can overestimate
    # (utils/media.py:51-58).
    while frame_count > 0:
        vidcap.set(cv2.CAP_PROP_POS_FRAMES, frame_count - 1)
        if vidcap.grab():
            break
        frame_count -= 1
    if frame_count <= 0:
        raise ValueError(f"video '{path}' has no frames")

    duration = frame_count / video_fps if video_fps > 0 else 0.0
    if fps > 0:
        timestamps = np.arange(0, duration, 1.0 / fps)[:num_frames]
        indices = [int(t * video_fps) for t in timestamps]
    else:
        indices = np.round(np.linspace(0, frame_count - 1, num_frames)).astype(int)

    frames = {}
    for index in indices:
        if index in frames:
            continue
        vidcap.set(cv2.CAP_PROP_POS_FRAMES, int(index))
        ok, frame = vidcap.read()
        if not ok:
            continue
        frames[index] = PILImage.fromarray(
            cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        )
    return [frames[i] for i in indices if i in frames]


def load_video_frames(video, num_frames: int, fps: float = 0.0) -> List:
    """Video handle -> list of PIL frames (black-frame fallback on failure,
    mirroring mm_utils.py:42-54)."""
    from PIL import Image as PILImage

    if isinstance(video, Video) and not video.path:
        frames = video.frames
        indices = np.round(np.linspace(0, len(frames) - 1, num_frames)).astype(int)
        from vila_tpu.data.preprocess import load_image

        return [load_image(frames[i]) for i in indices]

    path = video.path if isinstance(video, Video) else video
    try:
        if os.path.isdir(path):
            return _load_from_dir(path, num_frames)
        return _load_from_file(path, num_frames, fps)
    except Exception:
        return [PILImage.new("RGB", (720, 720))] * num_frames
