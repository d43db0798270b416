"""Attention-map visualization.

Parity: /root/reference/videoswap/utils/p2p_utils/visualization.py —
aggregate stored cross-attention maps over layers/heads, render per-token
heatmap strips as images/gif (:12-86), and an SVD view of self-attention
(:89-109). Operates on the captured 'attn_store' dicts (per-step arrays)
instead of a live controller object.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw


def aggregate_attention(step_store: dict, res_y: int, res_x: int,
                        places=('up', 'down'), kind: str = 'cross',
                        frame: int = 0) -> np.ndarray:
    """Mean over selected sites/heads of maps at resolution (res_y, res_x).

    step_store: {site_name: (F, heads, S, T)}. Returns (res_y, res_x, T).
    """
    out = []
    for name, maps in step_store.items():
        place, k, _ = name.split('_')
        if k != kind or place not in places:
            continue
        m = np.asarray(maps)
        if m.ndim == 5:       # (steps, F, heads, S, T): average steps
            m = m.mean(0)
        if m.shape[-2] != res_y * res_x:
            continue
        out.append(m[frame].mean(0))          # (S, T)
    assert out, f'no {kind} maps at {res_y}x{res_x}'
    agg = np.stack(out).mean(0)
    return agg.reshape(res_y, res_x, -1)


def show_cross_attention(tokenizer, prompt: str, step_store: dict,
                         res_y: int, res_x: int, save_dir: str,
                         frame: int = 0, places=('up', 'down')) -> list:
    """Per-token heatmap strip saved as PNG (reference :37-86)."""
    attn = aggregate_attention(step_store, res_y, res_x, places, 'cross',
                               frame)
    if hasattr(tokenizer, 'encode'):
        ids = tokenizer.encode(prompt)
        decode = lambda i: tokenizer.decode([ids[i]])      # noqa: E731
        n_tokens = len(ids)
    else:
        words = ['<bos>'] + prompt.split(' ') + ['<eos>']
        decode = lambda i: words[i] if i < len(words) else ''  # noqa: E731
        n_tokens = len(words)

    images = []
    for i in range(min(n_tokens, attn.shape[-1])):
        m = attn[..., i]
        m = (m - m.min()) / (m.max() - m.min() + 1e-8)
        img = Image.fromarray((m * 255).astype(np.uint8)).resize(
            (256, 256), Image.BILINEAR).convert('RGB')
        draw = ImageDraw.Draw(img)
        draw.text((8, 232), decode(i), fill=(255, 80, 80))
        images.append(img)

    os.makedirs(save_dir, exist_ok=True)
    strip = Image.new('RGB', (256 * len(images), 256))
    for i, im in enumerate(images):
        strip.paste(im, (256 * i, 0))
    strip.save(os.path.join(save_dir, 'cross_attention.png'))
    return images


def show_self_attention_comp(step_store: dict, res_y: int, res_x: int,
                             save_dir: str, frame: int = 0,
                             max_com: int = 10) -> None:
    """Top SVD components of the self-attention matrix (reference :89-109)."""
    attn = aggregate_attention(step_store, res_y, res_x, kind='self',
                               frame=frame)
    flat = attn.reshape(res_y * res_x, -1).astype(np.float64)
    u, s, vh = np.linalg.svd(flat - flat.mean(0, keepdims=True),
                             full_matrices=False)
    os.makedirs(save_dir, exist_ok=True)
    for i in range(min(max_com, vh.shape[0])):
        comp = vh[i].reshape(res_y, res_x)
        comp = (comp - comp.min()) / (comp.max() - comp.min() + 1e-8)
        Image.fromarray((comp * 255).astype(np.uint8)).resize(
            (256, 256), Image.BILINEAR).save(
            os.path.join(save_dir, f'self_svd_{i:02d}.png'))
