"""Synthetic atlas dataset: frames + masks + flows for smoke runs."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make(out_dir: str, frames: int = 6, size: int = 32) -> None:
    from videoswap_tpu.preprocess.flow import compute_bidirectional_flow
    fdir = os.path.join(out_dir, 'frames')
    mdir = os.path.join(out_dir, 'masks')
    fldir = os.path.join(out_dir, 'flows')
    for d in (fdir, mdir, fldir):
        os.makedirs(d, exist_ok=True)

    imgs = []
    for i in range(frames):
        yy, xx = np.mgrid[0:size, 0:size]
        img = np.stack([xx / size, yy / size,
                        np.full_like(xx, 0.4, dtype=float)], -1) * 0.5
        cx = size * (0.3 + 0.4 * i / max(frames - 1, 1))
        blob = np.exp(-(((xx - cx) ** 2 + (yy - size / 2) ** 2)
                        / (2 * (size * 0.12) ** 2)))
        img = img + blob[..., None] * np.array([0.5, 0.3, 0.1])
        img = np.clip(img, 0, 1)
        mask = (blob > 0.4).astype(np.float32)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(fdir, f'{i:05d}.jpg'))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(mdir, f'{i:05d}.png'))
        imgs.append(img.astype(np.float32))

    for i in range(frames - 1):
        flow = compute_bidirectional_flow(imgs[i], imgs[i + 1])
        np.save(os.path.join(fldir, f'{i:05d}.npy'), flow)
    print(f'atlas smoke data at {out_dir}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('out_dir')
    ap.add_argument('--frames', type=int, default=6)
    ap.add_argument('--size', type=int, default=32)
    a = ap.parse_args()
    make(a.out_dir, a.frames, a.size)
