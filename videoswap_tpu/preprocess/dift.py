"""DIFT (diffusion features) extraction + correspondence queries.

Parity: /root/reference/videoswap/utils/dift_util.py — one U-Net step at
t=261 on the VAE latent of an image, features taken after up-block index 1
(1280 channels), ensemble of 8 noise draws averaged (SDFeaturizer :185-227);
cosine-similarity correspondence between a source point's feature vector
and a target feature map (DIFT_Demo :230-267).

TPU-native: the 3D U-Net runs with F=ensemble (noise draws fold into the
frame axis, one jitted call); features come from the 'features' sow
collection instead of an early-exit fork of the model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.schedulers import add_noise


@dataclass
class SDFeaturizer:
    unet: Any
    vae: Any
    text_encoder: Any
    tokenizer: Any
    sched: Any
    params: dict
    t: int = 261
    up_ft_index: int = 1
    ensemble_size: int = 8

    def __post_init__(self):
        self._fn = None

    def _build(self, hw):
        up_name = f'up_block_{self.up_ft_index}'

        def fn(params, image, ids, rng):
            latents = self.vae.apply(params['vae'], image,
                                     method=AutoencoderKL.encode_video)
            lat = jnp.repeat(latents, self.ensemble_size, axis=1)
            noise = jax.random.normal(rng, lat.shape, lat.dtype)
            noisy = add_noise(self.sched, lat, noise, jnp.asarray(self.t))
            text = self.text_encoder.apply(params['text_encoder'], ids)
            _, feats = self.unet.apply(params['unet'], noisy,
                                       jnp.asarray([self.t]), text,
                                       mutable=['features'])
            ft = feats['features'][up_name]
            if isinstance(ft, tuple):
                ft = ft[0]
            # (B=1, ensemble, h, w, C) -> ensemble mean -> (h, w, C)
            return ft[0].mean(axis=0)

        return jax.jit(fn)

    def forward(self, image: np.ndarray, prompt: str,
                rng=None) -> np.ndarray:
        """image: (H, W, 3) in [-1, 1] -> (h, w, 1280) feature map."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = jnp.asarray(np.asarray(self.tokenizer(
            [prompt], padding='max_length',
            max_length=self.tokenizer.model_max_length,
            truncation=True).input_ids))
        if self._fn is None:
            self._fn = self._build(image.shape[:2])
        img = jnp.asarray(image, jnp.float32)[None, None]   # (1, 1, H, W, 3)
        return np.asarray(self._fn(self.params, img, ids, rng))


def _resize_feat(feat: np.ndarray, h: int, w: int) -> jnp.ndarray:
    """(fh, fw, C) -> (h, w, C) bilinear."""
    return jax.image.resize(jnp.asarray(feat), (h, w, feat.shape[-1]),
                            method='bilinear')


def dift_query(source_feat: np.ndarray, source_hw: tuple[int, int],
               query_xy: tuple[float, float], target_feat: np.ndarray,
               target_hw: tuple[int, int],
               target_xy: tuple[float, float] | None = None):
    """Cosine-similarity correspondence (reference DIFT_Demo.query).

    Returns (best_xy, confidence_at_target_or_best, target_feature_vector).
    """
    h, w = source_hw
    th, tw = target_hw
    src = _resize_feat(source_feat, h, w)
    tgt = _resize_feat(target_feat, th, tw)
    sx, sy = int(round(query_xy[0])), int(round(query_xy[1]))
    sx, sy = np.clip(sx, 0, w - 1), np.clip(sy, 0, h - 1)
    vec = src[sy, sx]
    sims = (tgt @ vec) / (
        jnp.linalg.norm(tgt, axis=-1) * jnp.linalg.norm(vec) + 1e-8)
    sims = np.asarray(sims)
    by, bx = np.unravel_index(sims.argmax(), sims.shape)
    if target_xy is not None:
        tx, ty = int(round(target_xy[0])), int(round(target_xy[1]))
        tx, ty = np.clip(tx, 0, tw - 1), np.clip(ty, 0, th - 1)
        return (int(bx), int(by)), float(sims[ty, tx]), np.asarray(
            tgt[ty, tx])
    return (int(bx), int(by)), float(sims[by, bx]), np.asarray(tgt[by, bx])
