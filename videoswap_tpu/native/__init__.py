"""Native (C++) host-side frame preprocessing.

The reference's data path runs torchvision Resize/CenterCrop/ToTensor/
Normalize per frame through PIL objects (/root/reference/videoswap/data/
transform.py:22-48). Here the whole numeric chain is ONE fused C++ pass
(`frameloader.cpp`): triangle-filter resample (PIL.BILINEAR-compatible
geometry, float32 accumulation instead of PIL's 8-bit fixed point) +
center-crop + per-channel normalize, uint8 in -> float32 out.

The shared library is compiled with g++ at first use and cached under
~/.cache/videoswap_native (keyed by source hash); loading is ctypes — no
pybind11 dependency. Everything degrades gracefully: `available()` is
False (and callers fall back to the PIL/numpy path) if compilation fails
or `VS_NO_NATIVE=1` is set.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name('frameloader.cpp')
_LIB = None
_TRIED = False


def _build() -> ctypes.CDLL | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:12]
    cache = Path(os.environ.get(
        'VS_NATIVE_CACHE', '~/.cache/videoswap_native')).expanduser()
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f'frameloader_{tag}.so'
    if not so.exists():
        tmp = so.with_suffix('.so.tmp')
        cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
               '-march=native', str(_SRC), '-o', str(tmp)]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
        os.replace(tmp, so)
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.vs_preprocess.restype = ctypes.c_int
    lib.vs_preprocess.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if not os.environ.get('VS_NO_NATIVE'):
            _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def resize_shape(h0: int, w0: int, size) -> tuple[int, int]:
    """torchvision Resize semantics: int resizes the SHORTER side
    preserving aspect; an (h, w) pair resizes exactly."""
    if isinstance(size, (list, tuple)):
        return int(size[0]), int(size[1])
    if w0 <= h0:
        return int(round(size * h0 / w0)), int(size)
    return int(size), int(round(size * w0 / h0))


def preprocess_frame(img: np.ndarray, resize=None, crop=None,
                     mean=None, std=None) -> np.ndarray:
    """Fused resize + center-crop + (v/255 - mean)/std for one (H, W, C)
    uint8 frame -> float32 (H', W', C). `resize` follows torchvision
    semantics (see `resize_shape`); `crop` is int or (h, w)."""
    lib = _lib()
    assert lib is not None, 'native backend unavailable'
    img = np.ascontiguousarray(img)
    assert img.dtype == np.uint8 and img.ndim == 3
    h0, w0, c = img.shape
    rh, rw = resize_shape(h0, w0, resize) if resize is not None else (h0, w0)
    if crop is None:
        ch, cw = rh, rw
    elif isinstance(crop, (list, tuple)):
        ch, cw = int(crop[0]), int(crop[1])
    else:
        ch = cw = int(crop)
    assert ch <= rh and cw <= rw, (
        f'crop ({ch},{cw}) larger than resized ({rh},{rw})')

    def fptr(v):
        if v is None:
            return None
        arr = np.ascontiguousarray(np.broadcast_to(
            np.asarray(v, np.float32), (c,)))
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr

    m = fptr(mean)
    s = fptr(std)
    out = np.empty((ch, cw, c), np.float32)
    rc = lib.vs_preprocess(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h0, w0, c, rh, rw, ch, cw,
        m[0] if m else None, s[0] if s else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert rc == 0, f'vs_preprocess failed rc={rc}'
    return out


def preprocess_frames(frames, resize=None, crop=None, mean=None,
                      std=None) -> np.ndarray:
    """Stack of fused-preprocessed frames -> (F, H, W, C) float32."""
    return np.stack([preprocess_frame(np.asarray(f), resize, crop,
                                      mean, std) for f in frames])


def resample_triangle_np(img: np.ndarray, out_h: int,
                         out_w: int) -> np.ndarray:
    """Pure-numpy restatement of the C++ triangle resample (same tap
    geometry as PIL.BILINEAR) — the fallback path and the parity oracle
    for tests."""
    img = np.asarray(img, np.float32)

    def taps(in_size, out_size):
        scale = in_size / out_size
        fs = max(scale, 1.0)
        mats = np.zeros((out_size, in_size), np.float32)
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - fs + 0.5), 0)
            xmax = min(int(center + fs + 0.5), in_size)
            j = np.arange(xmin, xmax)
            w = np.maximum(0.0, 1.0 - np.abs((j + 0.5 - center) / fs))
            mats[i, xmin:xmax] = w / w.sum()
        return mats

    my = taps(img.shape[0], out_h)
    mx = taps(img.shape[1], out_w)
    return np.einsum('yh,xw,hwc->yxc', my, mx, img, optimize=True)
