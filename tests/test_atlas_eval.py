"""Atlas evaluation parity: adaptive mapping areas, high-res textures,
texture-edit re-rendering and per-pixel loss videos
(reference videoswap/atlas/evaluate.py:24-199, 202-591)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.atlas import IMLP
from videoswap_tpu.atlas.evaluate import (apply_edit_pattern,
                                          compute_loss_videos,
                                          evaluate_model,
                                          get_high_res_texture,
                                          get_mapping_area,
                                          render_edited_video,
                                          sample_texture)

F, H, W = 3, 16, 16


def norm_s(v):
    return v / (16 / 2.0) - 1.0


def norm_t(v):
    return v / (F / 2.0) - 1.0


@pytest.fixture(scope='module')
def setup():
    nets = {
        'FG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=16,
                              mlp_layers=2),
        'BG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=16,
                              mlp_layers=2),
        'F_Alpha': IMLP(input_dim=3, output_dim=1, hidden_dim=16,
                        mlp_layers=2, pe_type='encoding', pe_dim=2),
        'F_Atlas': IMLP(input_dim=2, output_dim=3, hidden_dim=16,
                        mlp_layers=2, pe_type='hash_encoding',
                        hash_levels=4, log2_hashmap_size=10),
    }
    rng = jax.random.PRNGKey(0)
    params = {}
    for k, (name, net) in zip(jax.random.split(rng, len(nets)),
                              nets.items()):
        params[name] = jax.jit(net.init)(k, jnp.zeros((1, net.input_dim)))
    rs = np.random.RandomState(1)
    data = {
        'video': rs.rand(F, H, W, 3).astype(np.float32),
        'mask': (rs.rand(F, H, W) > 0.5).astype(np.float32),
        'flows': rs.randn(F, H, W, 2).astype(np.float32),
        'flow_masks': np.ones((F, H, W), np.float32),
    }
    return nets, params, data


def test_mapping_area_bounds_used_uvs(setup):
    nets, params, data = setup
    box = get_mapping_area(nets, params, data['mask'] > -1, 16, F,
                           (-0.5, -0.5), norm_s, norm_t,
                           mapping='BG_UV_Mapping', invert_alpha=True)
    assert -1.0 <= box['minx'] <= box['maxx'] <= 1.0
    assert -1.0 <= box['miny'] <= box['maxy'] <= 1.0
    assert box['edge'] == pytest.approx(
        max(box['maxx'] - box['minx'], box['maxy'] - box['miny']))

    # manual recomputation over all pixels
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    uvs, oks = [], []
    for f in range(F):
        xyt = np.stack([norm_s(xs.ravel()), norm_s(ys.ravel()),
                        np.full(H * W, norm_t(f))], -1).astype(np.float32)
        uv = np.asarray(nets['BG_UV_Mapping'].apply(
            params['BG_UV_Mapping'], jnp.asarray(xyt))) * 0.5 - 0.5
        raw = np.asarray(nets['F_Alpha'].apply(
            params['F_Alpha'], jnp.asarray(xyt)))[:, 0]
        uvs.append(uv)
        oks.append(-raw > -0.5)
    uv = np.concatenate(uvs)[np.concatenate(oks)]
    np.testing.assert_allclose(
        [box['minx'], box['miny']],
        np.maximum(uv.min(0), -1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        [box['maxx'], box['maxy']],
        np.minimum(uv.max(0), 1), rtol=1e-5, atol=1e-6)


def test_high_res_texture_matches_direct_eval(setup):
    nets, params, _ = setup
    tex = get_high_res_texture(nets, params, 33, 0.0, 1.0, 0.0, 1.0)
    assert tex.shape == (33, 33, 3)
    # grid point (row 16, col 8) is uv = (8/32, 16/32)
    direct = (np.asarray(nets['F_Atlas'].apply(
        params['F_Atlas'], jnp.asarray([[8 / 32, 16 / 32]],
                                       jnp.float32))) + 1) * 0.5
    np.testing.assert_allclose(tex[16, 8], direct[0], rtol=1e-5, atol=1e-6)


def test_sample_texture_bilinear_and_relevance():
    tex = np.zeros((8, 8, 3), np.float32)
    tex[2, 3] = 1.0
    box = dict(minx=0.0, miny=0.0, maxx=1.0, maxy=1.0, edge=1.0)
    # pixel coords scale by res/edge = 8: u=3/8 -> px=3, v=2/8 -> py=2
    c, rel, px, py = sample_texture(
        tex, box, np.asarray([3 / 8, 3.5 / 8, 0.95]),
        np.asarray([2 / 8, 2 / 8, 0.5]))
    assert rel[0] and rel[1] and not rel[2]      # ceil(0.95*8)=8 off-edge
    np.testing.assert_allclose(c[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(c[1], [0.5, 0.5, 0.5], atol=1e-6)


def test_texture_edit_changes_only_fg_pixels(setup):
    """The texture-edit workflow: editing the FG texture must change the
    re-rendered video only where FG alpha is non-negligible."""
    nets, params, _ = setup
    box = dict(minx=0.0, miny=0.0, maxx=1.0, maxy=1.0, edge=1.0)
    tex = get_high_res_texture(nets, params, 64, 0, 1, 0, 1)
    base = render_edited_video(nets, params, W, H, F, norm_s, norm_t,
                               tex_fg=tex, box_fg=box, tex_bg=tex,
                               box_bg=box)
    edited_tex = tex.copy()
    edited_tex[:, :, 0] = 1.0                  # paint the FG texture red
    edited_tex[:, :, 1:] = 0.0
    edited = render_edited_video(nets, params, W, H, F, norm_s, norm_t,
                                 tex_fg=edited_tex, box_fg=box, tex_bg=tex,
                                 box_bg=box)
    diff = np.abs(edited['edit'] - base['edit']).max(-1)
    # the change at any pixel is alpha * |delta texture| <= alpha * 1:
    # editing the FG texture cannot leak past the alpha matte
    from videoswap_tpu.atlas.evaluate import reconstruct_video
    rec = reconstruct_video(nets, params, W, H, F, norm_s, norm_t)
    alpha = rec['alpha'][..., 0]
    assert np.all(diff <= alpha + 1e-5)
    assert diff.max() > 1e-3    # the edit is actually visible somewhere


def test_apply_edit_pattern_changes_texture():
    tex = np.full((64, 64, 3), 0.5, np.float32)
    out = apply_edit_pattern(tex)
    assert out.shape == tex.shape
    assert np.abs(out - tex).max() > 0.1
    assert np.all(tex == 0.5)           # input untouched


def test_loss_videos_shapes_and_last_frame(setup):
    nets, params, data = setup
    lv = compute_loss_videos(nets, params, data, W, H, F, norm_s, norm_t,
                             16, chunk=256)
    for k in ('rigidity_fg', 'rigidity_bg', 'flow_fg', 'flow_bg',
              'flow_alpha', 'rgb_error'):
        assert lv[k].shape == (F, H, W), k
        assert np.isfinite(lv[k]).all(), k
    assert lv['rgb_residual'].shape == (F, H, W, 3)
    # no forward flow out of the last frame (reference :327-329)
    assert lv['flow_fg'][-1].max() == 0 and lv['flow_alpha'][-1].max() == 0
    assert lv['rigidity_fg'].min() >= 2 * np.sqrt(2) * 0.001 / 2  # jtj floor


def test_full_evaluation_artifact_set(setup, tmp_path):
    nets, params, data = setup
    val = evaluate_model(nets, params, data['video'], W, H, F,
                         norm_s, norm_t, save_dir=str(tmp_path),
                         data=data, full=True, texture_res=64)
    assert np.isfinite(val)
    expect = ['reconstruction', 'alpha', 'edit', 'edited_fg', 'edited_bg',
              'checkerboard_fg', 'checkerboard_bg', 'uv_fg', 'uv_bg',
              'uv_fg_masked', 'residuals', 'alpha_vs_gtmask',
              'global_info']
    for stem in expect:
        assert (os.path.exists(tmp_path / f'{stem}.mp4')
                or os.path.exists(tmp_path / f'{stem}.gif')), stem
    for stem in ('texture_orig1', 'texture_edit1', 'texture_orig2',
                 'texture_edit2'):
        assert os.path.exists(tmp_path / f'{stem}.png'), stem
