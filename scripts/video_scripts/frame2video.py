"""Frame directory -> video (reference scripts/video_scripts/frame2video.py)."""

import argparse
from pathlib import Path

import imageio
import numpy as np
from PIL import Image


def main(frame_dir: str, out_path: str, fps: int = 8) -> None:
    paths = sorted(Path(frame_dir).iterdir())
    with imageio.get_writer(out_path, fps=fps) as w:
        for p in paths:
            w.append_data(np.asarray(Image.open(p).convert('RGB')))
    print(f'wrote {out_path}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('frame_dir')
    p.add_argument('out_path')
    p.add_argument('--fps', type=int, default=8)
    a = p.parse_args()
    main(a.frame_dir, a.out_path, a.fps)
