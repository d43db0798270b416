"""SparsePointAdapter: semantic point embeddings -> multi-resolution U-Net
residual maps.

Parity: /root/reference/videoswap/models/adapter_model.py. The reference
splats each point's MLP feature into zero maps with a Python double loop
over points x frames (adapter_model.py:121-130) — the #1 hot spot flagged in
SURVEY.md §2.3. Here the bilinear splat is a single vectorized
scatter-add over all (frame, point, corner) triples, which XLA lowers to one
scatter per level.

Semantics preserved exactly:
- corner indices clipped to the map independently, weights from the
  unclipped fractional offsets (adapter_model.py:25-47);
- points with x<0 or y<0 are invisible and contribute nothing;
- training-time random point dropout and inference-time `index_list`
  subsetting are expressed as a boolean `point_mask`;
- the 'local' loss mask is the union over frames/points of radius-2 boxes
  at the /8 resolution, replicated across frames (adapter_model.py:72-95,
  including the half-open [lo, hi) box and the hi-clip to size-1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from videoswap_tpu.utils.registry import MODEL_REGISTRY


class AdapterConfig(NamedTuple):
    embedding_channels: int = 1280
    channels: Sequence[int] = (320, 640, 1280, 1280)
    downsample_rate: Sequence[int] = (8, 16, 32, 64)
    mid_dim: int = 128
    radius: int = 2


def bilinear_splat(feat: jnp.ndarray, tracks: jnp.ndarray,
                   valid: jnp.ndarray, height: int, width: int,
                   rate: int) -> jnp.ndarray:
    """Scatter point features into a zero map with bilinear weights.

    feat: [P, C]; tracks: [F, P, 2] pixel (x, y); valid: [F, P] bool.
    Returns [F, height, width, C].
    """
    f, p, _ = tracks.shape
    pos = tracks.astype(jnp.float32) / rate
    px, py = pos[..., 0], pos[..., 1]                      # [F, P]
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    xf, yf = px - x1, py - y1

    def clip_x(v):
        return jnp.clip(v.astype(jnp.int32), 0, width - 1)

    def clip_y(v):
        return jnp.clip(v.astype(jnp.int32), 0, height - 1)

    xs = jnp.stack([clip_x(x1), clip_x(x1 + 1), clip_x(x1), clip_x(x1 + 1)],
                   axis=-1)                                 # [F, P, 4]
    ys = jnp.stack([clip_y(y1), clip_y(y1), clip_y(y1 + 1), clip_y(y1 + 1)],
                   axis=-1)
    ws = jnp.stack([(1 - xf) * (1 - yf), xf * (1 - yf),
                    (1 - xf) * yf, xf * yf], axis=-1)       # [F, P, 4]
    ws = ws * valid[..., None].astype(ws.dtype)

    frame_idx = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[:, None, None], (f, p, 4))
    contrib = (ws[..., None] * feat[None, :, None, :]).astype(feat.dtype)

    out = jnp.zeros((f, height, width, feat.shape[-1]), dtype=feat.dtype)
    return out.at[frame_idx.reshape(-1), ys.reshape(-1),
                  xs.reshape(-1)].add(contrib.reshape(f * p * 4, -1))


def local_loss_mask(tracks: jnp.ndarray, valid: jnp.ndarray, height: int,
                    width: int, rate: int, radius: int) -> jnp.ndarray:
    """Union of [lo, hi) boxes around every visible point, any frame.

    Returns [height, width] float mask (same for every frame, matching the
    reference's `loss_mask[:, :, y1:y2, x1:x2] = 1` inside the point loop).
    """
    pos = jnp.floor(tracks.astype(jnp.float32) / rate).astype(jnp.int32)
    px, py = pos[..., 0].reshape(-1), pos[..., 1].reshape(-1)   # [F*P]
    v = valid.reshape(-1)
    x1 = jnp.clip(px - radius, 0, width - 1)
    x2 = jnp.clip(px + radius, 0, width - 1)
    y1 = jnp.clip(py - radius, 0, height - 1)
    y2 = jnp.clip(py + radius, 0, height - 1)
    gx = jnp.arange(width)[None, None, :]                       # [1, 1, W]
    gy = jnp.arange(height)[None, :, None]                      # [1, H, 1]
    inside = ((gx >= x1[:, None, None]) & (gx < x2[:, None, None])
              & (gy >= y1[:, None, None]) & (gy < y2[:, None, None])
              & v[:, None, None])
    return jnp.any(inside, axis=0).astype(jnp.float32)


@MODEL_REGISTRY.register()
class SparsePointAdapter(nn.Module):
    cfg: AdapterConfig = AdapterConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pred_tracks: jnp.ndarray, size: tuple[int, int],
                 point_embedding: jnp.ndarray,
                 point_mask: Optional[jnp.ndarray] = None,
                 loss_type: Optional[str] = None):
        """pred_tracks: [F, P, 2] (x, y) pixels; size: (W, H) static;
        point_embedding: [P, E]; point_mask: [P] bool (dropout / subset).

        Returns a list of per-level residuals [F, H/r, W/r, C_l]; when
        `loss_type` is given also returns the [F, H/8, W/8, 1] loss mask.
        """
        cfg = self.cfg
        w, h = size
        visible = (pred_tracks[..., 0] >= 0) & (pred_tracks[..., 1] >= 0)
        if point_mask is not None:
            visible = visible & point_mask[None, :]

        states = []
        for level, (ch, rate) in enumerate(zip(cfg.channels,
                                               cfg.downsample_rate)):
            feat = nn.Dense(cfg.mid_dim, dtype=self.dtype,
                            name=f'model_list_{level}_mlp_0')(
                                point_embedding.astype(self.dtype))
            feat = nn.silu(feat)
            feat = nn.Dense(ch, dtype=self.dtype,
                            name=f'model_list_{level}_mlp_2')(feat)
            states.append(bilinear_splat(feat, pred_tracks, visible,
                                         h // rate, w // rate, rate))

        if loss_type is None:
            return states

        h8, w8 = h // cfg.downsample_rate[0], w // cfg.downsample_rate[0]
        if loss_type == 'global':
            mask = jnp.ones((pred_tracks.shape[0], h8, w8, 1))
        else:
            m = local_loss_mask(pred_tracks, visible, h8, w8,
                                cfg.downsample_rate[0], cfg.radius)
            mask = jnp.broadcast_to(m[None, :, :, None],
                                    (pred_tracks.shape[0], h8, w8, 1))
        return states, mask
