"""U-Net structure/behavior tests.

All forward passes are computed ONCE inside a single jitted function
(module-scoped fixture) — eager per-op dispatch of the ~500-module model is
prohibitively slow on the 1-core CI host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
from videoswap_tpu.p2p import AttnCtrl

TINY = UNet3DConfig(block_out_channels=(32, 64, 64, 64),
                    attention_head_dim=4, cross_attention_dim=32,
                    norm_num_groups=8, motion_heads=4)


@pytest.fixture(scope='module')
def outs():
    model = AnimateDiffUNet3DModel(cfg=TINY)
    model_r = AnimateDiffUNet3DModel(cfg=TINY, gradient_checkpointing=True)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32, 32, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(sample),
                        jnp.array([0]), jnp.zeros_like(text))
    ch = TINY.block_out_channels
    residuals = [
        jnp.ones((1, 2, 32 // (2 ** i), 32 // (2 ** i), ch[i])) * 0.1
        for i in range(4)
    ]
    # max_tokens raised: at this 32x32 latent the level-0 sites sit exactly
    # ON the strict 32^2 production threshold; this test wants ALL 16 sites
    ctrl = AttnCtrl(mode='store', max_tokens=4096,
                    store_filter=lambda site, q: site.kind == 'cross')

    @jax.jit
    def run_all(params, sample, text):
        text4 = jnp.broadcast_to(text[:, None], (1, 16, 7, 32))
        o_t10 = model.apply(params, sample, jnp.array([10]), text)
        o_t900 = model.apply(params, sample, jnp.array([900]), text)
        o_res = model.apply(params, sample, jnp.array([10]), text,
                            adapter_residuals=residuals)
        o_4d = model.apply(params, sample, jnp.array([10]), text4)
        o_remat = model_r.apply(params, sample, jnp.array([10]), text)
        o_store, vars_ = model.apply(params, sample, jnp.array([10]), text,
                                     ctrl=ctrl, mutable=['attn_store'])
        return dict(t10=o_t10, t900=o_t900, res=o_res, text4=o_4d,
                    remat=o_remat, store_out=o_store,
                    store=vars_['attn_store'])

    return jax.device_get(run_all(params, sample, text)), sample


def test_forward_shape(outs):
    o, sample = outs
    assert o['t10'].shape == sample.shape
    assert np.isfinite(o['t10']).all()


def test_timestep_changes_output(outs):
    o, _ = outs
    assert np.abs(o['t10'] - o['t900']).max() > 1e-6


def test_adapter_residual_injection(outs):
    o, _ = outs
    assert np.abs(o['t10'] - o['res']).max() > 1e-6


def test_edlora_layerwise_text_matches_3d(outs):
    """(B, 16, 77, C) text with identical layers == the 3-D path."""
    o, _ = outs
    np.testing.assert_allclose(o['text4'], o['t10'], atol=1e-5)


def test_gradient_checkpointing_matches(outs):
    o, _ = outs
    np.testing.assert_allclose(o['remat'], o['t10'], atol=1e-5)


def test_attention_store_capture(outs):
    o, _ = outs
    # walk: down blocks 0..2 x2 layers = 6 cross sites, mid 1, up 9 -> 16
    leaves = jax.tree_util.tree_leaves(o['store'])
    assert len(leaves) == 16
    for p in leaves:
        assert p.shape[-1] == 7  # key length = text tokens
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
    # store mode must not perturb the output
    np.testing.assert_allclose(o['store_out'], o['t10'], atol=1e-5)


def test_cfg_prefix_dedup_matches_duplicated():
    """cfg_prefix_dedup (run the shared CFG prefix once, double at the first
    cross-attention) is exact: same outputs as the duplicated [lat; lat]
    batch. Adapter residuals enter duplicated, like the pipeline's CFG path
    (reference pipeline_videoswap.py:544-550)."""
    model = AnimateDiffUNet3DModel(cfg=TINY)
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 32, 32, 4))
    text2 = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(lat),
                        jnp.array([0]), jnp.zeros((1, 7, 32)))
    ch = TINY.block_out_channels
    res2 = [
        jax.random.normal(jax.random.PRNGKey(10 + i),
                          (1, 2, 32 // 2 ** i, 32 // 2 ** i, ch[i])) * 0.1
        for i in range(4)
    ]
    res2 = [jnp.concatenate([r, r], axis=0) for r in res2]

    @jax.jit
    def run(params, lat, text2):
        dup = model.apply(params, jnp.concatenate([lat, lat], 0),
                          jnp.array([500]), text2, adapter_residuals=res2)
        ded = model.apply(params, lat, jnp.array([500]), text2,
                          adapter_residuals=res2, cfg_prefix_dedup=True)
        return dup, ded

    dup, ded = jax.device_get(run(params, lat, text2))
    assert ded.shape == dup.shape == (2, 2, 32, 32, 4)
    np.testing.assert_allclose(ded, dup, rtol=2e-5, atol=2e-5)
