"""Native UniMatch (GMFlow scale2-regrefine6): converter key set, forward
parity vs the literal torch restatement on random weights, and the
extract_flow wrapper protocol. Reference config:
/root/reference/scripts/extract_flow.py:18-53."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videoswap_tpu.preprocess.unimatch import (UniMatchFlow, UniMatchWrapper,
                                               convert_unimatch,
                                               expected_checkpoint_keys,
                                               grid_sample, resize_ac)


@pytest.fixture(scope='module')
def torch_model():
    from tests.fixtures.torch_unimatch import TorchUniMatch
    torch.manual_seed(0)
    return TorchUniMatch(num_reg_refine=2).eval()


@pytest.fixture(scope='module')
def flax_pair(torch_model):
    model = UniMatchFlow(num_reg_refine=2)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 64, 64, 3)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = convert_unimatch(dict(torch_model.state_dict()),
                              template['params'])
    return model, {'params': params}


def test_checkpoint_key_fixture(torch_model):
    """The torch restatement's state dict IS the checkpoint-shaped key
    set; the converter's expectation must match it exactly (both
    directions — no missing, no extra)."""
    torch_keys = sorted(torch_model.state_dict().keys())
    assert sorted(expected_checkpoint_keys()) == torch_keys
    # spot-check the load-bearing names of the real checkpoint layout
    for k in ('backbone.trident_conv.weight',
              'backbone.layer2.0.downsample.0.weight',
              'transformer.layers.5.cross_attn_ffn.mlp.0.weight',
              'feature_flow_attn.k_proj.bias',
              'refine.gru.convq2.weight',
              'refine.flow_head.conv2.bias',
              'refine.mask.2.weight',
              'refine_proj.weight'):
        assert k in torch_keys, k


def test_converter_accepts_wrapped_checkpoint(torch_model, flax_pair):
    """Real checkpoints ship as {'model': sd} with possible 'module.'
    prefixes — both layouts must convert to the identical tree."""
    model, variables = flax_pair
    sd = {f'module.{k}': v for k, v in torch_model.state_dict().items()}
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 64, 64, 3)))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params2 = convert_unimatch({'model': sd}, template['params'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables['params'], params2)


def test_forward_parity(torch_model, flax_pair):
    """Full-graph forward parity on random weights: backbone, swin
    transformer (incl. shifted windows + masks), global/local correlation
    softmax, flow propagation, 2 GRU refinements, convex upsampling."""
    model, variables = flax_pair
    rs = np.random.RandomState(3)
    img0 = rs.rand(1, 64, 96, 3).astype(np.float32) * 255
    img1 = np.clip(img0 + rs.randn(1, 64, 96, 3).astype(np.float32) * 20,
                   0, 255)

    out_j = jax.jit(model.apply)(variables, jnp.asarray(img0),
                                 jnp.asarray(img1))
    with torch.no_grad():
        out_t = torch_model(
            torch.from_numpy(img0.transpose(0, 3, 1, 2)),
            torch.from_numpy(img1.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.shape == out_t.shape == (2, 64, 96, 2)
    scale = max(1.0, np.abs(out_t).max())
    np.testing.assert_allclose(np.asarray(out_j), out_t,
                               atol=2e-3 * scale, rtol=1e-3)


def test_grid_sample_matches_torch():
    import torch.nn.functional as F
    rs = np.random.RandomState(0)
    img = rs.rand(2, 10, 12, 3).astype(np.float32)
    x = rs.rand(2, 5, 7).astype(np.float32) * 14 - 1   # incl. out-of-bounds
    y = rs.rand(2, 5, 7).astype(np.float32) * 12 - 1
    out = grid_sample(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
    gx = 2 * torch.from_numpy(x) / (12 - 1) - 1
    gy = 2 * torch.from_numpy(y) / (10 - 1) - 1
    ref = F.grid_sample(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                        torch.stack([gx, gy], dim=-1), mode='bilinear',
                        padding_mode='zeros', align_corners=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_resize_ac_matches_torch():
    import torch.nn.functional as F
    rs = np.random.RandomState(1)
    img = rs.rand(2, 9, 13, 4).astype(np.float32)
    out = resize_ac(jnp.asarray(img), 17, 21)
    ref = F.interpolate(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                        size=(17, 21), mode='bilinear', align_corners=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_wrapper_protocol(flax_pair):
    """compute_flow mirrors the reference wrapper: odd sizes resize to a
    multiple of 32 and back with component rescaling; output is
    (2, H, W, 2) (forward, backward)."""
    _, variables = flax_pair
    wrapper = UniMatchWrapper(variables['params'], num_reg_refine=2)
    rs = np.random.RandomState(5)
    img0 = (rs.rand(50, 70, 3) * 255).astype(np.float32)
    img1 = (rs.rand(50, 70, 3) * 255).astype(np.float32)
    flow = wrapper.compute_flow(img0, img1)
    assert flow.shape == (2, 50, 70, 2)
    assert np.isfinite(flow).all()
    # identical frames at [0,1] scale (accepted too): near-zero flow is
    # NOT guaranteed on random weights, but shape/finiteness must hold
    same = wrapper.compute_flow(img0 / 255.0, img0 / 255.0)
    assert same.shape == (2, 50, 70, 2) and np.isfinite(same).all()
