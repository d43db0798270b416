"""Resize every frame in a directory (reference video_resize.py)."""

import argparse
import os
from pathlib import Path

from PIL import Image


def main(frame_dir: str, out_dir: str, width: int, height: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for p in sorted(Path(frame_dir).iterdir()):
        Image.open(p).convert('RGB').resize(
            (width, height), Image.LANCZOS).save(
            os.path.join(out_dir, os.path.basename(p)))
    print(f'wrote resized frames to {out_dir}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('frame_dir')
    p.add_argument('out_dir')
    p.add_argument('width', type=int)
    p.add_argument('height', type=int)
    a = p.parse_args()
    main(a.frame_dir, a.out_dir, a.width, a.height)
