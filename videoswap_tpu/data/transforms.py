"""Video-frame transforms (torch-free).

Parity: /root/reference/videoswap/data/transform.py:22-48, which registers
torchvision Resize/CenterCrop/Normalize and a custom ToTensor. Here the
pixel ops run on PIL/numpy; the output video convention is channels-last
(F, H, W, 3) float32, matching the TPU layout end to end.

`Resize` keeps torchvision semantics: an int resizes the SHORTER side
preserving aspect; a [h, w] pair resizes exactly.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from videoswap_tpu.utils.registry import TRANSFORM_REGISTRY


def build_transform(opt: dict):
    opt = dict(opt)
    t_type = opt.pop('type')
    return TRANSFORM_REGISTRY.get(t_type)(**opt)


@TRANSFORM_REGISTRY.register()
class Resize:
    def __init__(self, size):
        self.size = size

    def __call__(self, img: Image.Image) -> Image.Image:
        if isinstance(self.size, (list, tuple)):
            h, w = self.size
        else:
            w0, h0 = img.size
            if w0 <= h0:
                w, h = self.size, int(round(self.size * h0 / w0))
            else:
                h, w = self.size, int(round(self.size * w0 / h0))
        return img.resize((w, h), Image.BILINEAR)


@TRANSFORM_REGISTRY.register()
class CenterCrop:
    def __init__(self, size):
        self.size = size if isinstance(size, (list, tuple)) else (size, size)

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        th, tw = self.size
        left = (w - tw) // 2
        top = (h - th) // 2
        return img.crop((left, top, left + tw, top + th))


@TRANSFORM_REGISTRY.register()
class ToTensor:
    """PIL -> (H, W, 3) float32 in [0, 1] (channels-last, not CHW)."""

    def __call__(self, img):
        if isinstance(img, Image.Image):
            return np.asarray(img, dtype=np.float32) / 255.0
        return np.asarray(img, dtype=np.float32)


@TRANSFORM_REGISTRY.register()
class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return (arr - self.mean) / self.std


@TRANSFORM_REGISTRY.register()
class Compose:
    def __init__(self, transforms):
        self.transforms = [build_transform(t) if isinstance(t, dict) else t
                           for t in transforms]

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


@TRANSFORM_REGISTRY.register()
class T2I_Preprocess:
    """Resize + [0,1] tensorize for image-conditioned T2I adapters
    (reference transform.py:41-48 wrapping diffusers'
    _preprocess_adapter_image). Output (H, W, C) float32 in [0, 1]."""

    def __init__(self, height, width):
        self.height, self.width = height, width

    def __call__(self, img):
        if isinstance(img, Image.Image):
            img = img.resize((self.width, self.height), Image.BILINEAR)
            return np.asarray(img, dtype=np.float32) / 255.0
        arr = np.asarray(img, dtype=np.float32)
        if arr.shape[:2] != (self.height, self.width):
            arr = np.stack([
                np.asarray(Image.fromarray(arr[..., c]).resize(
                    (self.width, self.height), Image.BILINEAR))
                for c in range(arr.shape[-1])], axis=-1)
        return arr
