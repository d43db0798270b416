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

from ..utils.metrics import psnr
from . import losses


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
        for layer in ('fg', 'bg'):
            tex = render_atlas_texture(nets, params, layer, resolution=256)
            from PIL import Image
            Image.fromarray((np.clip(tex, 0, 1) * 255).astype(
                np.uint8)).save(os.path.join(save_dir,
                                             f'atlas_{layer}.png'))
        _save_video(render_checkerboard(nets, params, res_x, res_y,
                                        num_frames, norm_s, norm_t),
                    os.path.join(save_dir, 'checkerboard.mp4'))
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


def render_atlas_texture(nets, params, layer: str = 'fg',
                         resolution: int = 512) -> np.ndarray:
    """Evaluate F_Atlas on a UV grid of the layer's quadrant
    (reference evaluate.py texture dumps): FG colors live in
    [0,1]x[0,1], BG in [-1,0]x[-1,0] (train_atlas.py:157-160).
    Returns (res, res, 3) in [0, 1]."""
    lo, hi = (0.0, 1.0) if layer == 'fg' else (-1.0, 0.0)
    us, vs = np.meshgrid(np.linspace(lo, hi, resolution),
                         np.linspace(lo, hi, resolution))
    uv = np.stack([us.reshape(-1), vs.reshape(-1)], -1).astype(np.float32)

    @jax.jit
    def f(params, uv):
        return (nets['F_Atlas'].apply(params['F_Atlas'], uv) + 1.0) * 0.5

    out = []
    for i in range(0, len(uv), 65536):
        out.append(np.asarray(f(params, jnp.asarray(uv[i:i + 65536]))))
    return np.concatenate(out).reshape(resolution, resolution, 3)


def render_checkerboard(nets, params, res_x: int, res_y: int,
                        num_frames: int, norm_s, norm_t,
                        squares: int = 16) -> np.ndarray:
    """Re-render the video with a checkerboard texture through the FG
    mapping — the reference's editability sanity view (texture swap):
    checker(uv_fg) composited over the BG layer by alpha."""
    rec = reconstruct_video(nets, params, res_x, res_y, num_frames,
                            norm_s, norm_t)
    xs, ys = np.meshgrid(np.arange(res_x), np.arange(res_y))
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)

    @jax.jit
    def uv_alpha(params, xyt):
        uv = nets['FG_UV_Mapping'].apply(params['FG_UV_Mapping'], xyt)
        a = losses.scaled_alpha(nets['F_Alpha'].apply(params['F_Alpha'],
                                                      xyt))
        return uv, a

    frames = []
    for f in range(num_frames):
        xyt = np.stack([norm_s(coords[:, 0]), norm_s(coords[:, 1]),
                        np.full(len(coords), norm_t(f))],
                       -1).astype(np.float32)
        uv, a = jax.device_get(uv_alpha(params, jnp.asarray(xyt)))
        grid = np.floor((uv * 0.5 + 0.5) * squares).astype(np.int64)
        checker = ((grid[:, 0] + grid[:, 1]) % 2).astype(np.float32)
        tex = np.stack([checker, 1 - checker, np.ones_like(checker)], -1)
        a = a.reshape(res_y, res_x, 1)
        frame = (tex.reshape(res_y, res_x, 3) * a
                 + rec['bg'][f] * (1 - a))
        frames.append(frame)
    return np.stack(frames)
