"""Preprocessing B: bidirectional optical flow per consecutive frame pair.

Parity: /root/reference/scripts/extract_flow.py — per pair i, save
`<flow_dir>/{i:05d}.npy` with shape [2, H, W, 2] (forward, backward). The
reference uses an external UniMatch checkout; here the native
GMFlow-class global-matching flow (matching_flow.py: global correlation
softmax matching + LK refinement + photometric fusion) runs by default,
with `--method lk` for the pure-LK tier and the same thirdparty gating.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from videoswap_tpu.preprocess.flow import compute_bidirectional_flow  # noqa


def main(frame_dir: str, out_dir: str, method: str = 'matching') -> None:
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(Path(frame_dir).iterdir())
    frames = [np.asarray(Image.open(p).convert('RGB'), np.float32) / 255.0
              for p in paths]
    for i in range(len(frames) - 1):
        flow = compute_bidirectional_flow(frames[i], frames[i + 1],
                                          method=method)
        np.save(os.path.join(out_dir, f'{i:05d}.npy'), flow)
        print(f'{i:05d}.npy: flow range '
              f'[{flow.min():.2f}, {flow.max():.2f}]')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--frame_dir', type=str, required=True)
    parser.add_argument('--out_dir', type=str, required=True)
    parser.add_argument('--method', type=str, default='matching',
                        choices=['matching', 'lk'])
    args = parser.parse_args()
    main(args.frame_dir, args.out_dir, args.method)
