"""The fused temporal-transformer kernel == the layer-wise flax module.

Same param tree, identical math: the layer-wise module (the CPU/init path)
is the ground truth; the kernel's XLA reference and the Pallas kernel in
interpret mode must match it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models.motion_module import VanillaTemporalModule
from videoswap_tpu.ops.fused_temporal import (_forward, _pe_rows,
                                              _xla_reference,
                                              flatten_tt_params)


def _per_frame_gn(x, tt_params, groups):
    """Reference per-frame GroupNorm using the module's norm params."""
    import flax.linen as nn
    b, f, hh, ww, c = x.shape
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    p = {'params': {'scale': tt_params['norm']['scale'],
                    'bias': tt_params['norm']['bias']}}
    return gn.apply(p, x.reshape(b * f, hh, ww, c)).reshape(x.shape)


@pytest.mark.parametrize('f,c,heads,groups', [
    (4, 32, 4, 8),
    (2, 32, 4, 8),
    (8, 64, 8, 8),
    # f=24 (the temporal_position_encoding_max_len): rpt=120 does not
    # divide 512, exercising the block_rows-multiple-of-rpt fix (tail
    # rows were silently unattended before)
    (24, 48, 4, 8),
])
def test_fused_temporal_matches_module(f, c, heads, groups):
    b, hw = 2, 4
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               max_len=24, norm_groups=groups)
    rs = np.random.RandomState(f + c)
    x = jnp.asarray(rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5)
    params = mm.init(jax.random.PRNGKey(0), x)
    # perturb proj_out away from its zero init so the body is exercised
    params = jax.tree.map(
        lambda p: p + 0.01 * np.float32(1.0), params)
    ref = mm.apply(params, x)          # layer-wise path (CPU)

    tt = params['params']['temporal_transformer']
    flat = flatten_tt_params(tt, 1)
    rpt = max(1, 128 // f) * f
    pe_rows = jnp.asarray(_pe_rows(f, c, rpt, 24), jnp.float32)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(b * hw * hw * f, c)
    g2 = _per_frame_gn(x, tt, groups).transpose(0, 2, 3, 1, 4).reshape(
        b * hw * hw * f, c)

    out_ref = _xla_reference(g2, x2, pe_rows, flat, heads, f, 1)
    out_ref = out_ref.reshape(b, hw, hw, f, c).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    out_k = _forward(g2, x2, pe_rows, flat, heads=heads, f=f, n_blocks=1,
                     interpret=True)
    out_k = out_k.reshape(b, hw, hw, f, c).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_temporal_grads_flow():
    """Custom VJP produces grads matching the layer-wise module's."""
    f, c, heads, groups = 4, 32, 4, 8
    b, hw = 1, 4
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               norm_groups=groups)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5)
    params = mm.init(jax.random.PRNGKey(0), x)

    from videoswap_tpu.ops.fused_temporal import fused_temporal_transformer
    tt = params['params']['temporal_transformer']
    rpt = max(1, 128 // f) * f
    pe_rows = jnp.asarray(_pe_rows(f, c, rpt, 24), jnp.float32)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(-1, c)

    def loss_fused(tt_params):
        flat = flatten_tt_params(tt_params, 1)
        g2 = _per_frame_gn(x, tt_params, groups).transpose(
            0, 2, 3, 1, 4).reshape(-1, c)
        return (fused_temporal_transformer(
            g2, x2, pe_rows, flat, heads, f, 1) ** 2).sum()

    def loss_module(params):
        return (mm.apply(params, x) ** 2).sum()

    g_f = jax.grad(loss_fused)(tt)
    g_m = jax.grad(loss_module)(params)['params']['temporal_transformer']
    for path, a in jax.tree_util.tree_leaves_with_path(g_f):
        b_ = g_m
        for k in path:
            b_ = b_[k.key]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-4,
            err_msg=f'grad mismatch at {jax.tree_util.keystr(path)}')


def test_attn_only_plus_ffn_tail_matches_full():
    """include_ffn=False kernel + ffn_tail == the full fused reference
    (the C=640 routing where FFN weights don't fit VMEM)."""
    from videoswap_tpu.ops.fused_temporal import ffn_tail
    f, c, heads, groups = 4, 32, 4, 8
    b, hw = 2, 4
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               norm_groups=groups)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5)
    params = jax.tree.map(lambda p: p + np.float32(0.01),
                          mm.init(jax.random.PRNGKey(0), x))
    ref = mm.apply(params, x)

    tt = params['params']['temporal_transformer']
    rpt = max(1, 128 // f) * f
    pe_rows = jnp.asarray(_pe_rows(f, c, rpt, 24), jnp.float32)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(-1, c)
    g2 = _per_frame_gn(x, tt, groups).transpose(0, 2, 3, 1, 4).reshape(-1, c)

    flat = flatten_tt_params(tt, 1, include_ffn=False)
    h2 = _forward(g2, x2, pe_rows, flat, heads=heads, f=f, n_blocks=1,
                  include_ffn=False, interpret=True)
    out = ffn_tail(h2, x2, tt, jnp.float32)
    out = out.reshape(b, hw, hw, f, c).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('f,c,heads,groups,include_ffn', [
    (4, 32, 4, 8, True),
    (8, 64, 8, 8, True),
    (4, 32, 4, 8, False),
])
def test_frame_major_4d_matches_rows(f, c, heads, groups, include_ffn):
    """The frame-major (B, F, HW, C) entry (in-VMEM relayout, no host
    transposes) == the row-layout kernel and XLA reference."""
    from videoswap_tpu.ops.fused_temporal import _forward_4d
    b, hw = 2, 4
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               max_len=24, norm_groups=groups)
    rs = np.random.RandomState(f * c)
    x = jnp.asarray(rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5)
    params = jax.tree.map(lambda p: p + np.float32(0.01),
                          mm.init(jax.random.PRNGKey(0), x))
    tt = params['params']['temporal_transformer']
    flat = flatten_tt_params(tt, 1, include_ffn=include_ffn)
    rpt = max(1, 128 // f) * f
    pe_rows = jnp.asarray(_pe_rows(f, c, rpt, 24), jnp.float32)
    gn = _per_frame_gn(x, tt, groups)
    g2 = gn.transpose(0, 2, 3, 1, 4).reshape(-1, c)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(-1, c)
    ref2 = _xla_reference(g2, x2, pe_rows, flat, heads, f, 1, include_ffn)
    ref = ref2.reshape(b, hw, hw, f, c).transpose(0, 3, 1, 2, 4)

    out4 = _forward_4d(gn.reshape(b, f, hw * hw, c),
                       x.reshape(b, f, hw * hw, c), pe_rows, flat,
                       heads=heads, f=f, n_blocks=1,
                       include_ffn=include_ffn, interpret=True)
    out = out4.reshape(b, f, hw, hw, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_module_fused_routing_uses_frame_major(monkeypatch):
    """TemporalTransformer3DModel on the 'tpu' branch (forced) routes
    through fused_temporal_transformer_bfhw and matches the layer-wise
    path."""
    import videoswap_tpu.ops.fused_temporal as ft
    f, c, heads, groups = 4, 32, 4, 8
    b, hw = 1, 4
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               norm_groups=groups)
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5)
    params = jax.tree.map(lambda p: p + np.float32(0.01),
                          mm.init(jax.random.PRNGKey(0), x))
    ref = mm.apply(params, x)

    calls = []
    real = ft.fused_temporal_transformer_bfhw

    def spy(g4, x4, pe, flat, heads_, f_, n_, inc=True):
        calls.append(g4.shape)
        # interpret-mode pallas on CPU: exercise the real 4D kernel
        return ft._forward_4d(g4, x4, jnp.asarray(pe, x4.dtype), list(flat),
                              heads=heads_, f=f_, n_blocks=n_,
                              include_ffn=inc, interpret=True)

    monkeypatch.setenv('FT_4D', '1')
    monkeypatch.setattr(ft, 'fused_temporal_transformer_bfhw', spy)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    out = mm.apply(params, x)
    assert calls and calls[0] == (b, f, hw * hw, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
