"""GMFlow-class global-matching flow (preprocess/matching_flow.py).

The reference's flow tier is a UniMatch/GMFlow checkpoint
(/root/reference/scripts/extract_flow.py:31-133). The native rebuild of
its algorithm (global correlation softmax matching + propagation + local
refinement) must beat the pure-LK tier exactly where a learned matcher
beats a local method: large displacement. These tests quantify that on
synthetic motions with known ground truth, including the rotation case
where matching alone is WEAKER than LK (NCC patches are not rotation-
invariant) and the photometric fusion must recover LK's accuracy.
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from videoswap_tpu.preprocess.flow import (  # noqa: E402
    compute_bidirectional_flow, pyramid_flow)
from videoswap_tpu.preprocess.matching_flow import (  # noqa: E402
    global_matching_flow, patch_features)

H, W = 96, 128


def _textured_base(seed=0, scale=2):
    """Structured (non-self-similar) texture: smoothed noise + gradient +
    blob pattern, so photometric selection has real evidence."""
    rs = np.random.RandomState(seed)
    base = rs.rand(H * scale, W * scale, 3).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, 2, 0) + np.roll(base, 2, 1)) / 5
    ys, xs = np.mgrid[0:H * scale, 0:W * scale].astype(np.float32)
    base[..., 0] += 0.3 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
    base[..., 1] += xs / (W * scale) * 0.4
    base[..., 2] += ys / (H * scale) * 0.4
    return np.clip(base, 0, 1.5)


def _crop(base, dy, dx):
    return base[H // 2 + dy:H // 2 + dy + H, W // 2 + dx:W // 2 + dx + W]


def _bilinear(im, x, y):
    x = np.clip(x, 0, W - 1)
    y = np.clip(y, 0, H - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (im[y0, x0] * (1 - fx) * (1 - fy) + im[y0, x1] * fx * (1 - fy)
            + im[y1, x0] * (1 - fx) * fy + im[y1, x1] * fx * fy)


def test_patch_features_shape_and_invariance():
    img = jnp.asarray(_crop(_textured_base(), 0, 0))
    f = patch_features(img, stride=8, patch=11)
    assert f.shape == (H // 8, W // 8, 3 * 11 * 11)
    norms = np.linalg.norm(np.asarray(f), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # NCC descriptors: invariant to brightness/contrast changes
    f2 = patch_features(img * 1.3 + 0.1, stride=8, patch=11)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=1e-4)


def test_large_translation_beats_lk():
    """40 px displacement — beyond the LK pyramid's capture range, the
    exact regime the reference runs GMFlow for."""
    base = _textured_base()
    img0, img1 = _crop(base, 0, 0), _crop(base, 16, 40)
    gt = np.array([-40.0, -16.0])          # img0 content moved by -40,-16

    flow = np.asarray(global_matching_flow(img0, img1))
    lk = np.asarray(pyramid_flow(jnp.asarray(img0), jnp.asarray(img1)))
    inner = (slice(20, -20), slice(48, -48))
    epe = np.linalg.norm(flow[inner] - gt, axis=-1)
    epe_lk = np.linalg.norm(lk[inner] - gt, axis=-1)
    assert np.median(epe) < 0.5, f'matching EPE median {np.median(epe)}'
    assert np.median(epe_lk) > 10, 'LK unexpectedly solved 40 px — ' \
        'the matching tier is no longer load-bearing in this test'
    assert np.mean(epe < 1.0) > 0.8, 'fewer than 80% of inner pixels ' \
        f'within 1 px ({np.mean(epe < 1.0):.2f})'


def test_rotation_fusion_recovers_lk_accuracy():
    """20-degree rotation: NCC matching alone fails (not rotation-
    invariant); the photometric fusion must fall back to LK per pixel."""
    base = _textured_base(seed=1)
    img0 = _crop(base, 0, 0)
    ang = np.deg2rad(20)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cx, cy = W / 2, H / 2
    sx = np.cos(ang) * (xs - cx) - np.sin(ang) * (ys - cy) + cx
    sy = np.sin(ang) * (xs - cx) + np.cos(ang) * (ys - cy) + cy
    img1 = _bilinear(img0, sx, sy)
    isx = np.cos(ang) * (xs - cx) + np.sin(ang) * (ys - cy) + cx
    isy = -np.sin(ang) * (xs - cx) + np.cos(ang) * (ys - cy) + cy
    gt = np.stack([isx - xs, isy - ys], -1)

    flow = np.asarray(global_matching_flow(img0, img1))
    unfused = np.asarray(global_matching_flow(img0, img1, fuse_lk=False))
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    valid[:12] = valid[-12:] = False
    valid[:, :12] = valid[:, -12:] = False
    epe = np.linalg.norm((flow - gt)[valid], axis=-1)
    epe_un = np.linalg.norm((unfused - gt)[valid], axis=-1)
    assert np.median(epe) < 0.5, f'fused EPE median {np.median(epe)}'
    assert np.median(epe) < np.median(epe_un), \
        'fusion did not improve on raw matching under rotation'


def test_confidence_zeroes_on_occlusion():
    """Content present only in img0 (occluded in img1) must get low
    matching confidence via the forward-backward cycle check."""
    base = _textured_base(seed=2)
    img0 = _crop(base, 0, 0).copy()
    img1 = img0.copy()
    img1[32:64, 48:80] = 0.5               # blank out a block in img1
    _, conf = global_matching_flow(img0, img1, return_confidence=True)
    grid = conf[(32 + 8) // 8:(64 - 8) // 8, (48 + 8) // 8:(80 - 8) // 8]
    border = np.concatenate([conf[0], conf[-1]])
    assert grid.mean() < 0.3 * border.mean() + 0.05, (
        f'occluded conf {grid.mean():.3f} vs border {border.mean():.3f}')


def _bandlimited_base(seed=3, scale=2):
    """Band-limited distinctive texture: random low-res octaves bicubic-
    upsampled — smooth at the 16 px feature stride yet locally unique,
    the regime deep features (DIFT: receptive field >> stride) live in."""
    rs = np.random.RandomState(seed)
    hh, ww = H * scale, W * scale
    import jax
    out = np.zeros((hh, ww, 3), np.float32)
    for cell, amp in [(16, 1.0), (32, 0.7)]:
        g = rs.rand(hh // cell + 2, ww // cell + 2, 3).astype(np.float32)
        big = np.asarray(jax.image.resize(
            jnp.asarray(g), ((hh // cell + 2) * cell,
                             (ww // cell + 2) * cell, 3), 'bicubic'))
        out += amp * big[cell // 2:cell // 2 + hh, cell // 2:cell // 2 + ww]
    return out


def test_external_feature_path():
    """feat0/feat1 override (the DIFT hook): coarse stride-16 feature maps
    are interpolated onto the stride-8 match grid (cycle tolerance relaxed
    to the native stride) and resolve a HALF-CELL-offset displacement —
    the case native-grid matching cannot express (every img1 descriptor
    then sits between img0 grid centers). The stand-in must be band-
    limited at the feature stride like real DIFT features; descriptors
    whose receptive field ~= stride alias and are unmatchable at half-cell
    offsets by any grid method (measured: EPE 32 on the aliased 9 px-patch
    stand-in, 0.07 on this one)."""
    base = _bandlimited_base(seed=3)
    img0, img1 = _crop(base, 0, 0), _crop(base, 8, 24)
    f0 = np.asarray(patch_features(jnp.asarray(img0), stride=16, patch=17))
    f1 = np.asarray(patch_features(jnp.asarray(img1), stride=16, patch=17))
    flow = np.asarray(global_matching_flow(img0, img1, feat0=f0, feat1=f1))
    gt = np.array([-24.0, -8.0])
    inner = (slice(16, -16), slice(32, -32))
    epe = np.linalg.norm(flow[inner] - gt, axis=-1)
    assert np.median(epe) < 1.0, f'external-feature EPE {np.median(epe)}'


def test_bidirectional_matching_consistency():
    """compute_bidirectional_flow(method='matching'): fwd and bwd must be
    inverse fields on a pure translation."""
    base = _textured_base(seed=4)
    img0, img1 = _crop(base, 0, 0), _crop(base, 0, 32)
    both = compute_bidirectional_flow(img0, img1, method='matching')
    assert both.shape == (2, H, W, 2)
    inner = (slice(16, -16), slice(40, -40))
    np.testing.assert_allclose(
        np.median(both[0][inner], axis=(0, 1)), [-32, 0], atol=0.5)
    np.testing.assert_allclose(
        np.median(both[1][inner], axis=(0, 1)), [32, 0], atol=0.5)


def test_two_layer_motion():
    """Foreground block and background move differently (the layered-
    motion case the atlas consumes flow for): the per-pixel photometric
    selection over {matched, LK, top-2 phase-correlation} candidates must
    recover BOTH motions — a single global estimate cannot."""
    base = _textured_base(seed=6)
    fg_tex = _textured_base(seed=7)
    bg0, bg1 = _crop(base, 0, 0).copy(), _crop(base, 2, 6).copy()
    # foreground block moves (-18, 8) against the background's (-6, -2)
    fy, fx, bh, bw = 30, 40, 28, 36
    patch = fg_tex[:bh, :bw]
    bg0[fy:fy + bh, fx:fx + bw] = patch
    bg1[fy + 8:fy + 8 + bh, fx - 18:fx - 18 + bw] = patch
    flow = np.asarray(global_matching_flow(bg0, bg1))
    gt_bg = np.array([-6.0, -2.0])
    gt_fg = np.array([-18.0, 8.0])
    # background ring well away from the block and the borders
    ring = np.ones((H, W), bool)
    ring[:12] = ring[-12:] = False
    ring[:, :12] = ring[:, -12:] = False
    ring[fy - 10:fy + bh + 18, fx - 28:fx + bw + 10] = False
    epe_bg = np.linalg.norm(flow[ring] - gt_bg, axis=-1)
    # foreground block interior
    fg = flow[fy + 8:fy + bh - 8, fx + 8:fx + bw - 8]
    epe_fg = np.linalg.norm(fg - gt_fg, axis=-1)
    assert np.median(epe_bg) < 0.5, f'bg EPE {np.median(epe_bg)}'
    assert np.median(epe_fg) < 1.0, f'fg EPE {np.median(epe_fg)}'


def test_nondivisible_shapes_pad():
    base = _textured_base(seed=5)
    img0 = _crop(base, 0, 0)[:93, :121]
    img1 = _crop(base, 4, 12)[:93, :121]
    flow = np.asarray(global_matching_flow(img0, img1))
    assert flow.shape == (93, 121, 2)
    inner = (slice(12, -12), slice(20, -20))
    np.testing.assert_allclose(
        np.median(flow[inner], axis=(0, 1)), [-12, -4], atol=0.5)
