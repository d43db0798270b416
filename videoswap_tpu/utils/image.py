"""PIL <-> array video helpers (VaeImageProcessor equivalent).

Parity: diffusers VaeImageProcessor.preprocess/postprocess as used by the
reference pipeline (pipeline_videoswap.py:651, 610): images scaled to
[-1, 1], sizes snapped down to multiples of 8. Channels-last video arrays
(B, F, H, W, 3) float32.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def preprocess_video(frames: list[Image.Image]) -> np.ndarray:
    """PIL frames -> (1, F, H, W, 3) float32 in [-1, 1], H/W snapped to /8."""
    w, h = frames[0].size
    w, h = w - w % 8, h - h % 8
    arrs = []
    for im in frames:
        if im.size != (w, h):
            im = im.resize((w, h), Image.LANCZOS)
        arrs.append(np.asarray(im.convert('RGB'), dtype=np.float32) / 127.5
                    - 1.0)
    return np.stack(arrs)[None]


def postprocess_video(video: np.ndarray) -> list[Image.Image]:
    """(B, F, H, W, 3) in [-1, 1] -> list of F PIL images (batch 0)."""
    video = np.asarray(video, dtype=np.float32)[0]
    video = np.clip(video / 2 + 0.5, 0.0, 1.0)
    return [Image.fromarray((f * 255).round().astype(np.uint8))
            for f in video]


def video_tensor_from_chw(x: np.ndarray) -> np.ndarray:
    """(C, F, H, W) torch-convention video -> (1, F, H, W, C)."""
    return np.transpose(x, (1, 2, 3, 0))[None]
