"""Semantic point tracking.

The reference propagates keyframe points with Co-Tracker (a git-ignored
thirdparty checkout, sys.path-injected at extract_semantic_point.py:20-21)
and then FILTERS drifting tracks with DIFT cosine confidence. Here the
native path tracks with DIFT correspondence plus the two mechanisms that
make Co-Tracker's joint transformer tracking strong, rebuilt TPU-first:

- **appearance**: cosine maps between every keyframe point feature and
  every frame's feature map, computed as ONE (H*W, C) @ (C, P) MXU matmul
  per frame (the per-point/per-frame eager loop would cost P*F*2 remote
  dispatches on the axon tunnel);
- **joint motion**: all points share the dense global-matching flow field
  (matching_flow.py) chained frame-to-frame — the locality prior is
  centered on the flow-predicted position, so fast motion beyond the
  prior's capture range stays locked, and an occluded point COASTS with
  the scene motion instead of freezing (Co-Tracker reaches both through
  cross-track attention over a correlation pyramid);
- **sub-pixel**: quadratic peak interpolation on the cosine map (argmax
  alone quantizes to integer pixels).

A match whose raw cosine falls below `conf_thresh` is treated as occluded
— the track coasts on flow (or holds, without flow) and re-locks when the
texture reappears; the reference reaches the same end via Co-Tracker
visibility + downstream DIFT-confidence filtering
(extract_semantic_point.py:104-140). When a thirdparty co-tracker
checkout is present it is used instead, preserving the reference behavior
(backward_tracking=True semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dift import SDFeaturizer, _resize_feat


def _cos_maps(feat_hw_c, vecs_pc) -> np.ndarray:
    """(h, w, C), (P, C) -> (h, w, P) cosine maps in one MXU matmul."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(f, v):
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
        return f @ v.T

    return np.asarray(go(jnp.asarray(feat_hw_c), jnp.asarray(vecs_pc)))


def _subpixel(cos_p: np.ndarray, by: int, bx: int) -> tuple[float, float]:
    """Quadratic (parabola) peak interpolation around an argmax."""
    h, w = cos_p.shape

    def fit(cm, c0, cp):
        denom = cm - 2.0 * c0 + cp
        if denom >= -1e-12:            # not a proper local max
            return 0.0
        return float(np.clip(0.5 * (cm - cp) / denom, -0.5, 0.5))

    dx = fit(cos_p[by, bx - 1], cos_p[by, bx], cos_p[by, bx + 1]) \
        if 0 < bx < w - 1 else 0.0
    dy = fit(cos_p[by - 1, bx], cos_p[by, bx], cos_p[by + 1, bx]) \
        if 0 < by < h - 1 else 0.0
    return dx, dy


@dataclass
class DIFTTracker:
    featurizer: SDFeaturizer
    locality_sigma: float = 0.15   # fraction of image diagonal
    # min cosine to accept a match: calibrated so true matches under
    # modest rotation/scale (>= 0.95 measured) clear it while spurious
    # noise peaks (~0.6) do not; cf. the reference's downstream DIFT
    # confidence filters at 0.7/0.35 (extract_semantic_point.py:127,156)
    conf_thresh: float = 0.75
    use_flow: bool = True          # joint-motion guidance (see module doc)
    subpixel: bool = True

    def track(self, frames: list[np.ndarray], keyframe_idx: int,
              points_xy: np.ndarray, category: str) -> np.ndarray:
        """frames: list of (H, W, 3) in [-1, 1]; points_xy: (P, 2) on the
        keyframe. Returns (F, P, 2) tracks (float32)."""
        prompt = f'photo of a {category}'
        h, w = frames[0].shape[:2]
        nf = len(frames)
        feats = [_resize_feat(self.featurizer.forward(f, prompt), h, w)
                 for f in frames]
        pts = np.asarray(points_xy, np.float32)
        ii = np.clip(np.round(pts).astype(int),
                     0, [w - 1, h - 1])                     # (P, 2) x,y
        vecs = np.asarray(feats[keyframe_idx])[ii[:, 1], ii[:, 0]]
        cos_all = [_cos_maps(f, vecs) for f in feats]       # F x (h, w, P)

        flow_step: dict[tuple[int, int], np.ndarray] = {}
        if self.use_flow and nf > 1:
            from .matching_flow import global_matching_flow
            for fi in range(keyframe_idx, nf - 1):
                flow_step[(fi, fi + 1)] = np.asarray(
                    global_matching_flow(frames[fi], frames[fi + 1]))
            for fi in range(keyframe_idx, 0, -1):
                flow_step[(fi, fi - 1)] = np.asarray(
                    global_matching_flow(frames[fi], frames[fi - 1]))

        tracks = np.zeros((nf, len(pts), 2), np.float32)
        sigma2 = (self.locality_sigma * np.hypot(h, w)) ** 2
        ys, xs = np.mgrid[0:h, 0:w]

        for pi, (px, py) in enumerate(pts):
            for order in (range(keyframe_idx, nf),
                          range(keyframe_idx, -1, -1)):
                prev = np.array([px, py], np.float32)
                last = None
                n_coast = 0
                for fi in order:
                    pred = prev
                    if last is not None and (last, fi) in flow_step:
                        fl = flow_step[(last, fi)]
                        iy = int(np.clip(round(prev[1]), 0, h - 1))
                        ix = int(np.clip(round(prev[0]), 0, w - 1))
                        pred = prev + fl[iy, ix]
                        pred = np.clip(pred, 0, [w - 1, h - 1])
                    cos = cos_all[fi][..., pi]
                    # positional uncertainty grows while occluded: each
                    # coasted frame compounds flow error at a position
                    # whose flow is itself corrupted by the occluder, so
                    # the re-lock search widens with coast length (else
                    # the true peak sits in the prior's tail and a nearby
                    # background false match wins — measured on the
                    # rendered occluder fixture, tests/
                    # test_tracking_realistic.py). Capped: an unbounded
                    # prior would devolve into global argmax teleports.
                    widen = float(min(1 + n_coast, 4)) ** 2
                    prior = np.exp(-((xs - pred[0]) ** 2
                                     + (ys - pred[1]) ** 2)
                                   / (2 * sigma2 * widen))
                    by, bx = np.unravel_index(
                        (cos * prior).argmax(), cos.shape)
                    if cos[by, bx] < self.conf_thresh:
                        tracks[fi, pi] = pred   # occluded: coast (or hold)
                        prev = pred.astype(np.float32)
                        n_coast += 1
                    else:
                        pos = np.array([bx, by], np.float32)
                        if self.subpixel:
                            dx, dy = _subpixel(cos, by, bx)
                            pos += (dx, dy)
                        tracks[fi, pi] = pos
                        prev = pos
                        n_coast = 0
                    last = fi
        return tracks


def load_thirdparty_cotracker(thirdparty_dir: str = 'thirdparty/co-tracker'):
    """Reference-style gated import of an external co-tracker checkout."""
    import os
    import sys
    if not os.path.isdir(thirdparty_dir):
        return None
    sys.path.insert(0, thirdparty_dir)
    try:
        from cotracker.predictor import CoTrackerPredictor  # type: ignore
        return CoTrackerPredictor
    except Exception:
        return None
