"""Atlas input loading: frames, masks, flows, consistency masks.

Parity: /root/reference/videoswap/atlas/unwrap_utils.py:12-101, without the
cv2 dependency: resizing via PIL, flow warping (cv2.remap) via bilinear
sampling in numpy. Layout is frame-major (F, H, W, ...) — the TPU-friendly
gather order for coordinate batches — instead of the reference's
(H, W, ..., F).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def bilinear_sample(img: np.ndarray, x: np.ndarray, y: np.ndarray
                    ) -> np.ndarray:
    """Sample img[y, x] with bilinear interpolation; out-of-range clamps
    (cv2.remap INTER_LINEAR + BORDER_REPLICATE-ish; consistency masking
    makes border behavior immaterial)."""
    h, w = img.shape[:2]
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0)[..., None]
    fy = np.clip(y - y0, 0.0, 1.0)[..., None]
    v00, v01 = img[y0, x0], img[y0, x1]
    v10, v11 = img[y1, x0], img[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def warp_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    h, w = flow.shape[:2]
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return bilinear_sample(img, xx + flow[..., 0], yy + flow[..., 1])


def compute_consistency(flow12: np.ndarray, flow21: np.ndarray) -> np.ndarray:
    diff = flow12 + warp_flow(flow21, flow12)
    return np.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)


def get_consistency_mask(flow_fwd, flow_bwd, thresh: float = 1.0):
    return (compute_consistency(flow_fwd, flow_bwd) < thresh,
            compute_consistency(flow_bwd, flow_fwd) < thresh)


def resize_flow(flow: np.ndarray, newh: int, neww: int) -> np.ndarray:
    oldh, oldw = flow.shape[:2]
    out = np.stack([
        np.asarray(Image.fromarray(flow[..., c]).resize(
            (neww, newh), Image.BILINEAR)) for c in range(2)], axis=-1)
    # reference scales x-channel by newh/oldh and y by neww/oldw
    # (unwrap_utils.py:34-39 — kept verbatim for parity)
    out[..., 0] *= newh / oldh
    out[..., 1] *= neww / oldw
    return out


def _resize_img(arr: np.ndarray, neww: int, newh: int,
                nearest: bool = False) -> np.ndarray:
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if arr.ndim == 2:
        return np.asarray(Image.fromarray(arr).resize((neww, newh), mode))
    return np.stack([
        np.asarray(Image.fromarray(arr[..., c]).resize((neww, newh), mode))
        for c in range(arr.shape[-1])], axis=-1)


def load_input_data(datasets_opt: dict) -> dict:
    """Returns float32 arrays:
    video (F,H,W,3), mask (F,H,W), dx/dy (F,H,W,3),
    flows/flows_rev (F,H,W,2), flow_masks/flow_masks_rev (F,H,W)."""
    res_x, res_y = datasets_opt['res_x'], datasets_opt['res_y']
    frame_files = sorted(Path(datasets_opt['frame_path']).iterdir())
    mask_files = sorted(Path(datasets_opt['mask_path']).iterdir())
    flow_files = sorted(Path(datasets_opt['flow_path']).iterdir())
    n = min(datasets_opt['max_frames'], len(frame_files))
    filter_flow = datasets_opt.get('filter_optical_flow', True)

    video = np.zeros((n, res_y, res_x, 3), np.float32)
    masks = np.zeros((n, res_y, res_x), np.float32)
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    flows = np.zeros((n, res_y, res_x, 2), np.float32)
    flows_rev = np.zeros((n, res_y, res_x, 2), np.float32)
    fmask = np.zeros((n, res_y, res_x), np.float32)
    fmask_rev = np.zeros((n, res_y, res_x), np.float32)

    for i in range(n):
        img = np.asarray(Image.open(frame_files[i]).convert('RGB'),
                         np.float32) / 255.0
        msk = np.asarray(Image.open(mask_files[i]).convert('L'),
                         np.float32) / 255.0
        video[i] = _resize_img(img, res_x, res_y)
        masks[i] = _resize_img(msk, res_x, res_y, nearest=True)
        dy[i, :-1] = video[i, 1:] - video[i, :-1]
        dx[i, :, :-1] = video[i, :, 1:] - video[i, :, :-1]

        if i < n - 1:
            fl = np.load(flow_files[i]).astype(np.float32)
            fwd, bwd = fl[0], fl[1]
            if fwd.shape[0] != res_y or fwd.shape[1] != res_x:
                fwd = resize_flow(fwd, res_y, res_x)
                bwd = resize_flow(bwd, res_y, res_x)
            mf, mb = get_consistency_mask(fwd, bwd)
            flows[i] = fwd
            flows_rev[i + 1] = bwd
            fmask[i] = mf if filter_flow else 1.0
            fmask_rev[i + 1] = mb if filter_flow else 1.0

    return dict(video=video, mask=masks, dx=dx, dy=dy, flows=flows,
                flows_rev=flows_rev, flow_masks=fmask,
                flow_masks_rev=fmask_rev)
