"""Spatial blending masks from cross-attention maps (pure jnp).

Parity: /root/reference/videoswap/utils/p2p_utils/spatial_blend.py —
word-selected cross-attn maps are head-averaged, 3x3-max-pooled, nearest-
resized to the latent resolution, per-map max-normalized and thresholded.
'both' unions the source and target masks; 'source' uses only the
inversion maps. Masks gate (a) latent blending x = x_src + m*(x_tgt-x_src)
within [start_blend, end_blend] steps and (b) masked self-attention
replacement.

All shapes here are per-frame batched: maps (P, F, heads, S, 77) where P is
1 (source) or 2 (source, target-running-sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reshape_maps(maps: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(P, F, heads, S, W77) -> (P, F, heads, rh, rw, W77) inferring the map
    resolution from S and the image aspect (reference spatial_blend.py:106-116)."""
    p, f, h, s, w77 = maps.shape
    ratio = height / width
    rh = int(round((s * ratio) ** 0.5))
    rw = s // rh
    assert rh * rw == s, f'cannot factor {s} tokens at aspect {ratio}'
    return maps.reshape(p, f, h, rh, rw, w77)


def max_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME max pool over the trailing two axes."""
    nd = x.ndim
    window = (1,) * (nd - 2) + (3, 3)
    strides = (1,) * nd
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides,
                                 'SAME')


def blend_mask(site_maps: list[jnp.ndarray], alpha_layers: jnp.ndarray,
               th: float, out_hw: tuple[int, int], height: int, width: int,
               use_pool: bool = True) -> jnp.ndarray:
    """site_maps: list of (P, F, heads, S, 77), same S across sites.
    alpha_layers: (P, 77) word-selection. Returns bool (P, F, h, w) after
    per-(P, F) max-normalization and thresholding."""
    stacked = jnp.concatenate(
        [reshape_maps(m.astype(jnp.float32), height, width)
         for m in site_maps], axis=2)                     # (P,F,H*,rh,rw,77)
    alpha = alpha_layers[:, None, None, None, None, :].astype(jnp.float32)
    maps = (stacked * alpha).sum(-1).mean(2)              # (P, F, rh, rw)
    if use_pool:
        maps = max_pool_3x3(maps)
    p, f = maps.shape[:2]
    mask = jax.image.resize(maps, (p, f) + tuple(out_hw), method='nearest')
    denom = mask.max(axis=(-2, -1), keepdims=True)
    mask = mask / jnp.where(denom == 0, 1.0, denom)
    return mask > th


def union_both(mask: jnp.ndarray) -> jnp.ndarray:
    """'both' mode: target mask becomes source|target (reference :46-47)."""
    return mask[:1] | mask


def latent_blend(x_src: jnp.ndarray, x_tgt: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """x = x_src + m * (x_tgt - x_src); mask (F, h, w) broadcast over
    (B, F, h, w, C)."""
    m = mask[None, :, :, :, None].astype(x_tgt.dtype)
    return x_src + m * (x_tgt - x_src)
