"""Generate a tiny synthetic video + TAP file for weightless smoke runs.

Mirrors the 2001_catheadturn layout (frames dir + TAP.pth) at toy scale: a
moving bright blob on a gradient background, with two tracked points riding
the blob. TAP.pth uses the reference tensor-dict format
(extract_semantic_point.py:229) so either framework can consume it.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def make(out_dir: str, frames: int = 8, size: int = 64,
         points: int = 3, embed_dim: int = 12, seed: int = 0) -> None:
    rs = np.random.RandomState(seed)
    frame_dir = os.path.join(out_dir, 'frames')
    os.makedirs(frame_dir, exist_ok=True)

    tracks = np.zeros((frames, points, 2), np.float32)
    for f in range(frames):
        cx = size * (0.3 + 0.4 * f / max(frames - 1, 1))
        cy = size * 0.5
        yy, xx = np.mgrid[0:size, 0:size]
        img = np.stack([xx / size, yy / size,
                        np.full_like(xx, 0.3, dtype=float)], -1)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                        / (2 * (size * 0.1) ** 2)))
        img = img * 0.4 + blob[..., None] * np.array([0.9, 0.6, 0.2])
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(frame_dir, f'{f:05d}.png'))
        for p in range(points):
            ang = 2 * np.pi * p / points
            tracks[f, p] = [cx + size * 0.05 * np.cos(ang),
                            cy + size * 0.05 * np.sin(ang)]

    import torch
    tap = {
        'pred_tracks': torch.from_numpy(tracks),
        'point_embedding': torch.from_numpy(
            rs.randn(points, embed_dim).astype(np.float32)),
        'point_name2id': {f'p{i}': i for i in range(points)},
    }
    torch.save(tap, os.path.join(out_dir, 'TAP.pth'))

    # concept images for the ED-LoRA smoke config (train_edlora_smoke.yml):
    # the same blob subject on varying backgrounds
    concept_dir = os.path.join(out_dir, 'concepts')
    os.makedirs(concept_dir, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(3):
        bg = rs.rand(3) * 0.5
        blob = np.exp(-(((xx - size * 0.5) ** 2 + (yy - size * 0.5) ** 2)
                        / (2 * (size * 0.12) ** 2)))
        img = (np.ones((size, size, 3)) * bg
               + blob[..., None] * np.array([0.9, 0.6, 0.2]))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(concept_dir, f'{i}.png'))
    print(f'smoke dataset at {out_dir}: {frames} frames {size}x{size}, '
          f'{points} points, 3 concept images')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('out_dir')
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--size', type=int, default=64)
    args = ap.parse_args()
    make(args.out_dir, frames=args.frames, size=args.size)
