"""Visualization / video IO helpers.

Parity: /root/reference/videoswap/utils/vis_util.py — grid/gif/mp4/frame
savers dispatched on `save_type` substrings, point-overlay rendering, and
the OpenPose keypoint name map. cv2/moviepy are not in this image; mp4 goes
through imageio(+ffmpeg) when available, else falls back to gif.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw

OPENPOSE_NAME2ID = {
    'nose': 0, 'neck': 1, 'right_shoulder': 2, 'right_elbow': 3,
    'right_wrist': 4, 'left_shoulder': 5, 'left_elbow': 6, 'left_wrist': 7,
    'right_hip': 8, 'right_knee': 9, 'right_ankle': 10, 'left_hip': 11,
    'left_knee': 12, 'left_ankle': 13, 'right_eye': 14, 'left_eye': 15,
    'right_ear': 16, 'left_ear': 17,
}


def overlay_points(frame_list: list[Image.Image], tap_dict: dict,
                   radius: int = 5, color=(0, 255, 0)) -> list[Image.Image]:
    """Draw tracked points on frames (reference pipeline `visualize`,
    pipeline_videoswap.py:44-83): skips deselected and hidden (x<0) points."""
    tracks = np.asarray(tap_dict['pred_tracks'])
    index_list = tap_dict.get('index_list')
    out = []
    for idx, image in enumerate(frame_list):
        if idx >= len(tracks):
            continue
        draw = ImageDraw.Draw(image)
        for point_idx in range(tracks.shape[1]):
            if index_list is not None and point_idx not in index_list:
                continue
            x, y = tracks[idx, point_idx]
            if x >= 0 and y >= 0:
                draw.ellipse((x - radius, y - radius, x + radius, y + radius),
                             fill=color)
        out.append(image)
    return out


def make_grid(images: list[Image.Image], cols: int = 4) -> Image.Image:
    cols = min(cols, len(images))
    rows = (len(images) + cols - 1) // cols
    w, h = images[0].size
    grid = Image.new('RGB', (cols * w, rows * h))
    for i, im in enumerate(images):
        grid.paste(im, ((i % cols) * w, (i // cols) * h))
    return grid


def save_video_to_dir(video_frames: list[Image.Image], save_dir: str,
                      save_suffix: str, save_type: str = 'frame_gif',
                      fps: int = 8) -> None:
    """Dispatch on substrings of save_type: 'frame', 'gif', 'video'
    (reference vis_util.py:67-87)."""
    os.makedirs(save_dir, exist_ok=True)
    if 'frame' in save_type:
        frame_dir = os.path.join(save_dir, f'frames_{save_suffix}')
        os.makedirs(frame_dir, exist_ok=True)
        for i, f in enumerate(video_frames):
            f.save(os.path.join(frame_dir, f'{i:05d}.jpg'))
    if 'gif' in save_type:
        video_frames[0].save(
            os.path.join(save_dir, f'{save_suffix}.gif'), save_all=True,
            append_images=video_frames[1:], duration=int(1000 / fps), loop=0)
    if 'video' in save_type:
        path = os.path.join(save_dir, f'{save_suffix}.mp4')
        try:
            import imageio
            with imageio.get_writer(path, fps=fps) as w:
                for f in video_frames:
                    w.append_data(np.asarray(f))
        except Exception:
            video_frames[0].save(
                os.path.join(save_dir, f'{save_suffix}.gif'), save_all=True,
                append_images=video_frames[1:], duration=int(1000 / fps),
                loop=0)


def save_images_grid(images: list[Image.Image], path: str,
                     cols: int = 4) -> None:
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    make_grid(images, cols).save(path)
