"""Atlas evaluation: full-video reconstruction, PSNR, layer visualizations.

Parity: /root/reference/videoswap/atlas/evaluate.py:202-591 (core outputs:
reconstructed video, alpha video, FG/BG layer videos, reconstruction PSNR
:516-519). PSNR is computed directly (no skimage in this image). Texture
dumps/checkerboard re-rendering come with the editing tooling.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import losses


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float('inf')
    return 10.0 * np.log10(data_range ** 2 / mse)


def reconstruct_video(nets, params, res_x: int, res_y: int, num_frames: int,
                      norm_s, norm_t, chunk: int = 65536):
    """Evaluate the atlas at every pixel. Returns dict of (F, H, W, C)."""
    xs, ys = np.meshgrid(np.arange(res_x), np.arange(res_y))
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)

    @jax.jit
    def eval_chunk(params, xyt):
        fg = nets['FG_UV_Mapping'].apply(params['FG_UV_Mapping'], xyt)
        bg = nets['BG_UV_Mapping'].apply(params['BG_UV_Mapping'], xyt)
        alpha = losses.scaled_alpha(
            nets['F_Alpha'].apply(params['F_Alpha'], xyt))
        atlas = lambda p: nets['F_Atlas'].apply(   # noqa: E731
            params['F_Atlas'], p)
        rgb, rgb_fg, rgb_bg = losses.reconstruct_rgb(fg, bg, alpha, atlas)
        return rgb, rgb_fg, rgb_bg, alpha, fg, bg

    out = {k: [] for k in ('rgb', 'fg', 'bg', 'alpha')}
    for f in range(num_frames):
        rows = {k: [] for k in out}
        for i in range(0, len(coords), chunk):
            c = coords[i:i + chunk]
            xyt = np.stack([norm_s(c[:, 0]), norm_s(c[:, 1]),
                            np.full(len(c), norm_t(f))],
                           axis=-1).astype(np.float32)
            rgb, rgb_fg, rgb_bg, alpha, _, _ = jax.device_get(
                eval_chunk(params, jnp.asarray(xyt)))
            rows['rgb'].append(rgb)
            rows['fg'].append(rgb_fg)
            rows['bg'].append(rgb_bg)
            rows['alpha'].append(alpha)
        for k in out:
            ch = rows[k][0].shape[-1]
            out[k].append(np.concatenate(rows[k]).reshape(res_y, res_x, ch))
    return {k: np.stack(v) for k, v in out.items()}


def evaluate_model(nets, params, video: np.ndarray, res_x: int, res_y: int,
                   num_frames: int, norm_s, norm_t,
                   save_dir: str | None = None) -> float:
    """Reconstruction PSNR over the full video (+ optional video dumps)."""
    rec = reconstruct_video(nets, params, res_x, res_y, num_frames,
                            norm_s, norm_t)
    value = psnr(rec['rgb'], video[:num_frames])
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        _save_video(rec['rgb'], os.path.join(save_dir, 'reconstruction.mp4'))
        _save_video(np.repeat(rec['alpha'], 3, -1),
                    os.path.join(save_dir, 'alpha.mp4'))
        _save_video(rec['fg'] * rec['alpha'],
                    os.path.join(save_dir, 'foreground.mp4'))
        _save_video(rec['bg'], os.path.join(save_dir, 'background.mp4'))
    return value


def _save_video(frames: np.ndarray, path: str, fps: int = 10) -> None:
    arr = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    try:
        import imageio
        with imageio.get_writer(path, fps=fps) as w:
            for f in arr:
                w.append_data(f)
    except Exception:
        from PIL import Image
        imgs = [Image.fromarray(f) for f in arr]
        imgs[0].save(path.replace('.mp4', '.gif'), save_all=True,
                     append_images=imgs[1:], duration=int(1000 / fps),
                     loop=0)
