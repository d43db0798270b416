"""Preprocessing fallbacks beyond pure translation: rotation, scale and
occlusion suites for the pyramidal-LK flow and the DIFT-style tracker,
plus the end-to-end check that LK flow is good enough for the atlas
(bounded PSNR penalty vs ground-truth flow).

The native fallbacks replace Co-Tracker (joint transformer tracking,
reference extract_semantic_point.py:80-111) and GMFlow
(scripts/extract_flow.py:55-133); these tests quantify how far they can
be trusted — bounds are recorded in PARITY.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.atlas.data import get_consistency_mask
from videoswap_tpu.preprocess.flow import pyramid_flow


def _texture(h, w, seed=0):
    """Smooth random texture: white noise is unfriendly to warping
    (bilinear resampling decorrelates it), natural images are smooth."""
    rs = np.random.RandomState(seed)
    img = rs.rand(h, w).astype(np.float32)
    k = np.outer(np.hanning(9), np.hanning(9))
    from scipy.signal import convolve2d
    img = convolve2d(img, k / k.sum(), mode='same', boundary='symm')
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
    return np.stack([img] * 3, -1)


def _warp_affine(img, mat, center):
    """img1(q) = img0(A^-1 (q - c) + c): bilinear inverse warp."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([xs - center[0], ys - center[1]], -1)
    inv = np.linalg.inv(mat)
    src = pts @ inv.T
    sx = np.clip(src[..., 0] + center[0], 0, w - 1)
    sy = np.clip(src[..., 1] + center[1], 0, h - 1)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


def _gt_flow(mat, center, h, w):
    """Ground-truth img0->img1 flow for the affine q = A(p-c)+c."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([xs - center[0], ys - center[1]], -1)
    return pts @ mat.T - pts


def _epe(flow, gt, margin=16):
    d = flow[margin:-margin, margin:-margin] - gt[margin:-margin,
                                                  margin:-margin]
    return np.median(np.hypot(d[..., 0], d[..., 1]))


def _run_flow(img0, img1):
    return np.asarray(pyramid_flow(jnp.asarray(img0), jnp.asarray(img1),
                                   levels=3, iters=20))


def test_flow_rotation():
    """3-degree rotation about the center: median EPE < 0.75 px in the
    central region (GMFlow-class nets reach ~0.1; this bounds the gap)."""
    h, w = 96, 128
    img0 = _texture(h, w)
    th = np.deg2rad(3.0)
    mat = np.asarray([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]], np.float32)
    c = (w / 2, h / 2)
    img1 = _warp_affine(img0, mat, c)
    epe = _epe(_run_flow(img0, img1), _gt_flow(mat, c, h, w))
    assert epe < 0.75, f'rotation EPE {epe}'


def test_flow_scale():
    """5% zoom-in: median EPE < 0.75 px."""
    h, w = 96, 128
    img0 = _texture(h, w, seed=1)
    mat = np.asarray([[1.05, 0.0], [0.0, 1.05]], np.float32)
    c = (w / 2, h / 2)
    img1 = _warp_affine(img0, mat, c)
    epe = _epe(_run_flow(img0, img1), _gt_flow(mat, c, h, w))
    assert epe < 0.75, f'scale EPE {epe}'


def test_flow_occlusion_masked_out():
    """A block pasted over img1 occludes the motion there. The flow in the
    unoccluded region must stay accurate AND the forward-backward
    consistency mask must reject most of the occluded block — that mask is
    exactly what keeps bad flow out of the atlas flow losses."""
    h, w = 96, 128
    img0 = _texture(h, w, seed=2)
    img1 = np.roll(img0, 3, axis=1)
    img1[36:60, 48:80] = 0.5   # occluder
    fwd = _run_flow(img0, img1)
    bwd = _run_flow(img1, img0)
    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0] = 3.0
    err = np.hypot(*(fwd - gt).transpose(2, 0, 1))
    vis = np.ones((h, w), bool)
    vis[30:66, 40:88] = False           # occluder + margin
    vis[:16] = vis[-16:] = False
    vis[:, :16] = vis[:, -16:] = False
    assert np.median(err[vis]) < 0.75, np.median(err[vis])

    mask_f, _ = get_consistency_mask(fwd, bwd)
    occ = np.zeros((h, w), bool)
    occ[40:56, 52:76] = True            # core of the occluder
    # most of the occluded core must be flagged inconsistent
    assert mask_f[occ].mean() < 0.5, mask_f[occ].mean()
    # and the visible textured area must be mostly kept
    assert mask_f[vis].mean() > 0.8, mask_f[vis].mean()


class _PatchFeaturizer:
    """5x5 patch descriptors of the frame itself (isolates tracker math
    from the SD featurizer — same stand-in as tests/test_preprocess.py)."""

    def forward(self, image: np.ndarray, prompt: str) -> np.ndarray:
        g = image.mean(-1)
        h, w = g.shape
        pad = np.pad(g, 2, mode='edge')
        feats = np.stack([pad[dy:dy + h, dx:dx + w]
                          for dy in range(5) for dx in range(5)], axis=-1)
        # mean-center per pixel: cosine becomes ZNCC-like (raw all-positive
        # patches have ~0.75 baseline cosine, which would defeat the
        # tracker's occlusion confidence gate; real DIFT features are
        # roughly zero-centered)
        feats = feats - feats.mean(-1, keepdims=True)
        return feats.astype(np.float32)


def _affine_frames(base, mats, center):
    return [_warp_affine(base, m, center) for m in mats]


def test_tracker_rotation():
    """Cumulative rotation up to 6 degrees: tracked points within 2 px of
    the affine ground truth."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    h, w = 80, 96
    base = _texture(h, w, seed=3)
    c = (w / 2, h / 2)
    angles = [0, 2, 4, 6]
    mats = [np.asarray([[np.cos(np.deg2rad(a)), -np.sin(np.deg2rad(a))],
                        [np.sin(np.deg2rad(a)), np.cos(np.deg2rad(a))]],
                       np.float32) for a in angles]
    frames = _affine_frames(base, mats, c)
    pts = np.asarray([[30.0, 25.0], [60.0, 50.0], [25.0, 55.0]])
    tracks = DIFTTracker(_PatchFeaturizer(),
                         locality_sigma=0.12).track(frames, 0, pts, 't')
    for fi, m in enumerate(mats):
        gt = (pts - c) @ m.T + c
        err = np.hypot(*(tracks[fi] - gt).T).max()
        assert err <= 2.0, f'frame {fi}: err {err}'


def test_tracker_scale():
    """Cumulative zoom to 12%: tracked points within 2 px."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    h, w = 80, 96
    base = _texture(h, w, seed=4)
    c = (w / 2, h / 2)
    mats = [np.eye(2, dtype=np.float32) * s
            for s in (1.0, 1.04, 1.08, 1.12)]
    frames = _affine_frames(base, mats, c)
    pts = np.asarray([[30.0, 25.0], [60.0, 50.0], [25.0, 55.0]])
    tracks = DIFTTracker(_PatchFeaturizer(),
                         locality_sigma=0.12).track(frames, 0, pts, 't')
    for fi, m in enumerate(mats):
        gt = (pts - c) @ m.T + c
        err = np.hypot(*(tracks[fi] - gt).T).max()
        assert err <= 2.0, f'frame {fi}: err {err}'


def test_tracker_occlusion_recovery():
    """A point occluded mid-sequence: the track may drift while hidden but
    must re-lock within 1.5 px once the texture reappears (the reference
    filters hidden-frame points by DIFT confidence downstream)."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    # raw white noise: integer np.roll shifts keep descriptors exact and
    # unique, so the confidence gate (not prior luck) decides occlusion
    rs = np.random.RandomState(5)
    base = np.stack([rs.rand(64, 80).astype(np.float32)] * 3, -1)
    shifts = [(0, 0), (2, 1), (4, 2), (6, 3)]
    frames = [np.roll(np.roll(base, dy, axis=0), dx, axis=1)
              for dx, dy in shifts]
    frames[2] = frames[2].copy()
    frames[2][15:35, 20:45] = 0.0       # occlude around the tracked point
    pts = np.asarray([[30.0, 25.0]])
    tracks = DIFTTracker(_PatchFeaturizer(),
                         locality_sigma=0.15).track(frames, 0, pts, 't')
    gt_last = pts[0] + np.asarray(shifts[-1])
    err = np.hypot(*(tracks[3, 0] - gt_last))
    assert err <= 1.5, f'recovery err {err}'


def test_tracker_fast_motion_needs_flow_guidance():
    """25 px/frame displacement with a tight locality prior (sigma ~8 px):
    the flow-predicted prior center keeps the lock (Co-Tracker's joint-
    motion advantage, rebuilt on the dense matching flow); the same
    tracker WITHOUT flow guidance must lose it — otherwise this test no
    longer exercises the guidance path."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    h, w = 96, 128
    rs = np.random.RandomState(7)
    big = rs.rand(h + 90, w + 90).astype(np.float32)
    from scipy.signal import convolve2d
    k = np.outer(np.hanning(7), np.hanning(7))
    big = convolve2d(big, k / k.sum(), mode='same', boundary='symm')
    big = np.stack([big] * 3, -1)
    shifts = [(0, 0), (25, 5), (50, 10), (75, 15)]
    frames = [big[dy:dy + h, dx:dx + w] for dx, dy in shifts]
    # both points must stay in frame through the cumulative (75, 15) shift
    pts = np.asarray([[90.0, 40.0], [100.0, 70.0]])

    guided = DIFTTracker(_PatchFeaturizer(), locality_sigma=0.05,
                         conf_thresh=0.6).track(frames, 0, pts, 't')
    plain = DIFTTracker(_PatchFeaturizer(), locality_sigma=0.05,
                        conf_thresh=0.6, use_flow=False
                        ).track(frames, 0, pts, 't')
    errs_g, errs_p = [], []
    for fi, (dx, dy) in enumerate(shifts):
        gt = pts - np.asarray([dx, dy], np.float32)
        errs_g.append(np.hypot(*(guided[fi] - gt).T).max())
        errs_p.append(np.hypot(*(plain[fi] - gt).T).max())
    assert max(errs_g) <= 2.0, f'guided errs {errs_g}'
    assert max(errs_p) > 5.0, (
        f'plain tracker unexpectedly survived 25 px/frame ({errs_p}) — '
        'flow guidance is no longer load-bearing in this test')


def test_tracker_subpixel_localization():
    """Half-pixel ground truth: sub-pixel peak interpolation must localize
    well under the 0.5 px quantization floor of plain argmax."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    h, w = 80, 96
    base = _texture(h, w, seed=9)
    mats = [np.eye(2, dtype=np.float32),
            np.eye(2, dtype=np.float32) * 1.015]   # ~0.5 px at r=33
    frames = _affine_frames(base, mats, (w / 2, h / 2))
    pts = np.asarray([[15.0, 40.0], [81.0, 40.0], [48.0, 7.0]])
    tracks = DIFTTracker(_PatchFeaturizer(), locality_sigma=0.12,
                         use_flow=False).track(frames, 0, pts, 't')
    gt = (pts - (w / 2, h / 2)) @ mats[1].T + (w / 2, h / 2)
    err = np.hypot(*(tracks[1] - gt).T)
    assert err.max() <= 0.35, f'subpixel err {err}'


@pytest.mark.slow
def test_atlas_with_lk_flow_psnr_penalty_bounded():
    """End-to-end: fit a tiny atlas on synthetic rolling motion twice —
    once with analytic ground-truth flow, once with pyramid-LK flow +
    consistency masks — and assert the reconstruction PSNR penalty of the
    LK flow is < 1.5 dB. This is the actual question about the fallback:
    does its error leak into atlas quality, or do the flow-consistency
    masks contain it?"""
    from videoswap_tpu.atlas import IMLP
    from videoswap_tpu.atlas.evaluate import evaluate_model
    from videoswap_tpu.atlas.trainer import AtlasTrainer

    f, h, w = 4, 32, 32
    base = _texture(h, w, seed=6)
    shift = 2
    video = np.stack([np.roll(base, shift * i, axis=1) for i in range(f)])
    mask = np.zeros((f, h, w), np.float32)
    mask[:, 10:22, 10:22] = 1.0
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    dx[:, :, :-1] = video[:, :, 1:] - video[:, :, :-1]
    dy[:, :-1] = video[:, 1:] - video[:, :-1]

    def fit(flows, flows_rev, fm, fmr):
        nets = {
            'FG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=32,
                                  mlp_layers=3),
            'BG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=32,
                                  mlp_layers=3),
            'F_Alpha': IMLP(input_dim=3, output_dim=1, hidden_dim=32,
                            mlp_layers=3, pe_type='encoding', pe_dim=2),
            'F_Atlas': IMLP(input_dim=2, output_dim=3, hidden_dim=32,
                            mlp_layers=3, pe_type='hash_encoding',
                            hash_levels=4, log2_hashmap_size=10),
        }
        data = {k: jnp.asarray(v) for k, v in dict(
            video=video, mask=mask, dx=dx, dy=dy, flows=flows,
            flows_rev=flows_rev, flow_masks=fm,
            flow_masks_rev=fmr).items()}
        opt = {
            'optimizer': {'lr': 1e-3}, 'uv_mapping_scale': 0.8,
            'sample_batch_size': 512, 'derivative_amount': 1,
            'global_derivative_amount': 4, 'pretrain_alpha_iter': 40,
            'pretrain_global_rigidity_iter': 5,
            'loss_cfg': {
                'reconstruction_loss': {'rgb_loss_weight': 5000,
                                        'gradient_loss_weight': 1000,
                                        'alpha_loss_weight': 2000},
                'sparsity_loss': {'sparsity_loss_weight': 1000},
                'rigidity_loss': {'rigidity_loss_weight': 1,
                                  'global_rigidity_fg_loss_weight': 5,
                                  'global_rigidity_bg_loss_weight': 50},
                'flow_loss': {'flow_loss_weight': 5,
                              'alpha_flow_loss_weight': 49}},
        }
        tr = AtlasTrainer(nets=nets, data=data, train_opt=opt,
                          larger_dim=max(h, w), num_frames=f)
        params = tr.init_params(jax.random.PRNGKey(0))
        for name in ('FG_UV_Mapping', 'BG_UV_Mapping'):
            params, _ = tr.pretrain_mapping(params, name,
                                            jax.random.PRNGKey(1),
                                            iters=3, batch=512)
        opt_state = tr.init_opt_state(params)
        params, opt_state, _ = tr.run_steps(params, opt_state,
                                            jax.random.PRNGKey(2), 0, 250)
        return evaluate_model(nets, params, video, w, h, f,
                              tr.norm_s, tr.norm_t)

    # ground-truth flow of the rolling motion
    gt_f = np.zeros((f, h, w, 2), np.float32)
    gt_f[:-1, ..., 0] = shift
    gt_b = np.zeros_like(gt_f)
    gt_b[1:, ..., 0] = -shift
    ones = np.ones((f, h, w), np.float32)
    fm = ones.copy(); fm[-1] = 0                              # noqa: E702
    fmr = ones.copy(); fmr[0] = 0                             # noqa: E702
    psnr_gt = fit(gt_f, gt_b, fm, fmr)

    # pyramid-LK flow + consistency masks (the production fallback path)
    lk_f = np.zeros_like(gt_f)
    lk_b = np.zeros_like(gt_f)
    mf = np.zeros((f, h, w), np.float32)
    mb = np.zeros((f, h, w), np.float32)
    for i in range(f - 1):
        fwd = _run_flow(video[i], video[i + 1])
        bwd = _run_flow(video[i + 1], video[i])
        lk_f[i] = fwd
        lk_b[i + 1] = bwd
        cf, cb = get_consistency_mask(fwd, bwd)
        mf[i] = cf
        mb[i + 1] = cb
    psnr_lk = fit(lk_f, lk_b, mf, mb)

    assert psnr_lk > psnr_gt - 1.5, (psnr_gt, psnr_lk)


# ---------------------------------------------------------------------------
# Non-rigid (beyond-affine) deformation bounds. Real footage bends and
# parallaxes; every bound above is affine. The construction keeps ground
# truth EXACT: img1(q) = img0(q - d(q)) by bilinear inverse warp, so the
# img1->img0 flow is -d(q) with no small-displacement approximation.
# ---------------------------------------------------------------------------

def _sin_field(h, w, amp, lam):
    """Smooth sinusoidal displacement field (max |grad| = 2*pi*amp/lam)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = amp * np.sin(2 * np.pi * ys / lam + 0.7)
    dy = amp * np.cos(2 * np.pi * xs / lam + 0.3)
    return np.stack([dx, dy], -1)


def _warp_by_field(img, d):
    """img1(q) = img0(q - d(q)): bilinear inverse warp by a dense field."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = np.clip(xs - d[..., 0], 0, w - 1)
    sy = np.clip(ys - d[..., 1], 0, h - 1)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


def test_flow_nonrigid_sinusoidal():
    """2.5 px-amplitude sinusoidal bending: median EPE < 0.75 px — the
    fallback flow must not rely on the motion being a single global
    model."""
    h, w = 96, 128
    img0 = _texture(h, w, seed=11)
    d = _sin_field(h, w, amp=2.5, lam=48.0)
    img1 = _warp_by_field(img0, d)
    flow = _run_flow(img1, img0)        # exact GT: -d
    epe = _epe(flow, -d)
    assert epe < 0.75, f'non-rigid EPE {epe}'


def test_matching_flow_nonrigid_large_displacement():
    """20 px translation + 3 px sinusoidal bending: the global-matching
    tier must land median EPE < 1.0 px where the same field is far beyond
    the LK pyramid's capture range — the regime the reference runs GMFlow
    for, now with non-rigid structure on top."""
    from videoswap_tpu.preprocess.matching_flow import global_matching_flow
    h, w = 96, 128
    img0 = _texture(h, w, seed=12)
    d = _sin_field(h, w, amp=3.0, lam=48.0)
    d[..., 0] += 20.0
    img1 = _warp_by_field(img0, d)
    flow = np.asarray(global_matching_flow(img1, img0))   # exact GT: -d
    epe = _epe(flow, -d)
    assert epe < 1.0, f'matching-flow non-rigid EPE {epe}'


def test_tracker_nonrigid():
    """Progressive sinusoidal deformation (0 -> 3 px): tracked points
    within 2 px of the exact warped positions. GT per frame solves
    q - d_i(q) = p0 by fixed-point iteration (contraction: |grad d| < 1)."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    h, w = 80, 96
    base = _texture(h, w, seed=13)
    amps = [0.0, 1.0, 2.0, 3.0]
    fields = [_sin_field(h, w, amp=a, lam=40.0) for a in amps]
    frames = [_warp_by_field(base, d) for d in fields]
    pts = np.asarray([[30.0, 25.0], [60.0, 50.0], [25.0, 55.0]])
    tracks = DIFTTracker(_PatchFeaturizer(),
                         locality_sigma=0.12).track(frames, 0, pts, 't')

    def _field_at(a, lam, q):
        dx = a * np.sin(2 * np.pi * q[:, 1] / lam + 0.7)
        dy = a * np.cos(2 * np.pi * q[:, 0] / lam + 0.3)
        return np.stack([dx, dy], -1)

    for fi, a in enumerate(amps):
        q = pts.copy()
        for _ in range(30):
            q = pts + _field_at(a, 40.0, q)
        err = np.hypot(*(tracks[fi] - q).T).max()
        assert err <= 2.0, f'frame {fi}: non-rigid err {err}'
