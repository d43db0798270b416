"""Preprocessing B: bidirectional optical flow per consecutive frame pair.

Parity: /root/reference/scripts/extract_flow.py — per pair i, save
`<flow_dir>/{i:05d}.npy` with shape [2, H, W, 2] (forward, backward). The
reference runs an external UniMatch checkout; here `--method auto` runs
the NATIVE UniMatch port (preprocess/unimatch.py — the same
gmflow-scale2-regrefine6 graph, flax) whenever its checkpoint is on disk,
falling back to the weight-free GMFlow-class global-matching flow
(matching_flow.py); `--method lk` is the pure-LK tier.
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


def main(frame_dir: str, out_dir: str, method: str = 'auto') -> None:
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
    parser.add_argument('--method', type=str, default='auto',
                        choices=['auto', 'unimatch', 'matching', 'lk'],
                        help="'auto' runs the native UniMatch port when "
                             'its checkpoint is on disk (VS_UNIMATCH_CKPT '
                             'or pretrained_models/), else the weight-free '
                             'matching flow')
    args = parser.parse_args()
    main(args.frame_dir, args.out_dir, args.method)
