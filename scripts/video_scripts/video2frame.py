"""Video -> frame directory (reference scripts/video_scripts/video2frame.py,
cv2-free via imageio)."""

import argparse
import os

import imageio
from PIL import Image


def main(video_path: str, out_dir: str, size=None, max_frames=None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    reader = imageio.get_reader(video_path)
    for i, frame in enumerate(reader):
        if max_frames is not None and i >= max_frames:
            break
        img = Image.fromarray(frame)
        if size is not None:
            img = img.resize(size, Image.LANCZOS)
        img.save(os.path.join(out_dir, f'{i:05d}.jpg'))
    print(f'wrote frames to {out_dir}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('video_path')
    p.add_argument('out_dir')
    p.add_argument('--width', type=int, default=None)
    p.add_argument('--height', type=int, default=None)
    p.add_argument('--max_frames', type=int, default=None)
    a = p.parse_args()
    size = (a.width, a.height) if a.width and a.height else None
    main(a.video_path, a.out_dir, size, a.max_frames)
