"""Long-video extension: sliding-window temporal attention.

The reference plumbs a `long_video_config` kwarg into every motion module
but never consumes it (reference motion_module.py:60,73,106,131 — a dead
extension point; videos are hard-capped at temporal_position_encoding_
max_len=24 frames). Here the hook is live: frames beyond the window are
attended in overlapping windows of `window` frames with PE[0:window]
(pretrained motion weights stay in-distribution), outputs averaged over
overlaps. Static indices — jit/GSPMD friendly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models.motion_module import (TemporalTransformerBlock,
                                                window_index)


def test_window_index_covers_all_frames():
    idx = window_index(32, 16, 8)
    assert idx.shape == (3, 16)
    covered = np.zeros(32, bool)
    covered[idx.reshape(-1)] = True
    assert covered.all()
    # final window flushes to the end even when stride doesn't divide
    idx = window_index(30, 16, 8)
    assert idx[-1, -1] == 29
    covered = np.zeros(30, bool)
    covered[idx.reshape(-1)] = True
    assert covered.all()


def _block_and_params(f, dim=16, heads=4, window=None, stride=None, seed=0):
    m = TemporalTransformerBlock(dim=dim, heads=heads, max_len=24,
                                 window=window, stride=stride)
    x = jax.random.normal(jax.random.PRNGKey(seed), (3, f, dim))
    params = TemporalTransformerBlock(
        dim=dim, heads=heads, max_len=24).init(jax.random.PRNGKey(1), x)
    return m, params, x


def test_nonoverlapping_windows_equal_chunked_full_attention():
    """With stride == window the schedule is block-diagonal: the windowed
    module must equal running the plain (full-attention) module on each
    chunk independently — LN/FFN are per-frame so they commute with
    chunking. This pins the gather/scatter/average math exactly."""
    f, w = 12, 6
    m, params, x = _block_and_params(f, window=w, stride=w)
    got = m.apply(params, x)

    full = TemporalTransformerBlock(dim=16, heads=4, max_len=24)
    expected = jnp.concatenate(
        [full.apply(params, x[:, s:s + w]) for s in range(0, f, w)], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_window_covering_whole_clip_is_full_attention():
    """window >= f must take the plain full-attention path bit-for-bit."""
    f = 8
    m, params, x = _block_and_params(f, window=8, stride=4)
    full = TemporalTransformerBlock(dim=16, heads=4, max_len=24)
    np.testing.assert_array_equal(np.asarray(m.apply(params, x)),
                                  np.asarray(full.apply(params, x)))


def test_overlapping_windows_average():
    """f=9, window=6, stride=3 → windows [0:6], [3:9]; frames 3-5 are the
    average of both windows' attention outputs, per attention sublayer.
    Restated literally with a single-sublayer block (FFN/LN identical)."""
    f, w, s = 9, 6, 3
    dim, heads = 16, 4
    x = jax.random.normal(jax.random.PRNGKey(2), (2, f, dim))
    mk = lambda **kw: TemporalTransformerBlock(
        dim=dim, heads=heads, max_len=24, num_attention_blocks=1, **kw)
    params = mk().init(jax.random.PRNGKey(1), x)
    got = mk(window=w, stride=s).apply(params, x)

    # literal restatement: LN -> per-window (PE + attention) -> averaged
    # scatter -> residual -> LN -> FFN -> residual, via module internals
    from videoswap_tpu.models.layers import Attention, FeedForward
    import flax.linen as nn
    from videoswap_tpu.models.motion_module import \
        sinusoidal_position_table
    p = params['params']
    ln = nn.LayerNorm().apply({'params': p['norms_0']}, x)
    pe = jnp.asarray(sinusoidal_position_table(24, dim))[:w]
    attn = Attention(query_dim=dim, heads=heads, dim_head=dim // heads)
    outs, counts = np.zeros((2, f, dim)), np.zeros(f)
    for s0 in (0, 3):
        a = attn.apply({'params': p['attention_blocks_0']},
                       ln[:, s0:s0 + w] + pe[None], use_flash=False)
        outs[:, s0:s0 + w] += np.asarray(a)
        counts[s0:s0 + w] += 1
    h = jnp.asarray(outs / counts[None, :, None]) + x
    ff_in = nn.LayerNorm().apply({'params': p['ff_norm']}, h)
    expected = FeedForward(dim).apply({'params': p['ff']}, ff_in) + h
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_too_long_without_window_raises():
    f = 32
    m, params, x = _block_and_params(8)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, f, 16))
    with pytest.raises(AssertionError, match='long_video_cfg'):
        TemporalTransformerBlock(dim=16, heads=4, max_len=24).apply(
            params, x32)


@pytest.fixture(scope='module')
def tiny_long_unet():
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    cfg = UNet3DConfig(block_out_channels=(8, 8, 16, 16),
                       attention_head_dim=2, cross_attention_dim=16,
                       norm_num_groups=4, motion_heads=2,
                       motion_window=8, motion_window_stride=4)
    model = AnimateDiffUNet3DModel(cfg=cfg)
    sample = jnp.zeros((1, 32, 8, 8, 4))
    t = jnp.array([500])
    text = jnp.zeros((1, 77, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, t, text)
    return model, params


def test_unet_long_video_forward(tiny_long_unet):
    """32-frame forward through the full 3D U-Net with an 8-frame motion
    window — beyond the reference's 24-frame hard cap."""
    model, params = tiny_long_unet
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8, 4))
    out = jax.jit(model.apply)(params, x, jnp.array([500]),
                               jnp.zeros((1, 77, 16)))
    assert out.shape == (1, 32, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_long_video_params_match_short(tiny_long_unet):
    """The window changes no parameters: a short-video U-Net's params load
    into the long-video one unchanged (same tree), so pretrained motion
    weights work for long videos out of the box."""
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    model, params = tiny_long_unet
    cfg_short = UNet3DConfig(block_out_channels=(8, 8, 16, 16),
                             attention_head_dim=2, cross_attention_dim=16,
                             norm_num_groups=4, motion_heads=2)
    short = AnimateDiffUNet3DModel(cfg=cfg_short)
    p_short = jax.jit(short.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 4, 8, 8, 4)),
                                  jnp.array([500]), jnp.zeros((1, 77, 16)))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p_short))


def test_builders_long_video_cfg(tmp_path):
    from videoswap_tpu.builders import unet_config_from_opt
    inf = tmp_path / 'inference.yml'
    inf.write_text(
        'unet_additional_kwargs:\n'
        '  use_motion_module: true\n'
        '  motion_module_resolutions: [1, 2, 4, 8]\n'
        '  motion_module_kwargs:\n'
        '    num_attention_heads: 8\n'
        '    temporal_position_encoding_max_len: 24\n'
        '    long_video_config:\n'
        '      window: 16\n'
        '      stride: 8\n')
    cfg = unet_config_from_opt({'inference_config_path': str(inf)},
                               str(tmp_path), None)
    assert cfg.motion_window == 16 and cfg.motion_window_stride == 8
    assert cfg.motion_max_len == 24


def test_gapped_stride_rejected():
    with pytest.raises(AssertionError, match='no\\s+attention window'):
        window_index(10, 4, 6)
