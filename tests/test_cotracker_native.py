"""Native CoTracker v1: converter key set, core forward parity vs the
literal torch restatement on random weights, and the predictor protocol.
Reference usage: /root/reference/extract_semantic_point.py:86-108."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videoswap_tpu.preprocess.cotracker_native import (
    LATENT_DIM, WINDOW, CoTrackerCore, NativeCoTrackerPredictor,
    convert_cotracker, expected_checkpoint_keys)


@pytest.fixture(scope='module')
def torch_model():
    from tests.fixtures.torch_cotracker import TorchCoTrackerCore
    torch.manual_seed(0)
    return TorchCoTrackerCore(iters=2).eval()


def _template():
    from videoswap_tpu.preprocess.cotracker_native import _template_shapes
    model = CoTrackerCore(iters=2)
    shapes = _template_shapes(model)
    return model, jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                               shapes)


@pytest.fixture(scope='module')
def flax_pair(torch_model):
    model, template = _template()
    params = convert_cotracker(dict(torch_model.state_dict()),
                               template['params'])
    return model, {'params': params}


def test_checkpoint_key_fixture(torch_model):
    torch_keys = sorted(torch_model.state_dict().keys())
    assert sorted(expected_checkpoint_keys()) == torch_keys
    for k in ('fnet.layer4.0.downsample.0.weight', 'fnet.conv3.bias',
              'updateformer.input_transform.weight',
              'updateformer.time_blocks.5.attn.qkv.bias',
              'updateformer.space_blocks.0.mlp.fc2.weight',
              'updateformer.flow_head.weight',
              'norm.weight', 'ffeat_updater.0.weight',
              'vis_predictor.0.bias'):
        assert k in torch_keys, k


def test_encoder_parity(torch_model, flax_pair):
    model, variables = flax_pair
    rs = np.random.RandomState(1)
    frames = rs.rand(2, 48, 64, 3).astype(np.float32) * 2 - 1
    out_j = model.apply(variables, jnp.asarray(frames),
                        method=CoTrackerCore.encode)
    with torch.no_grad():
        out_t = torch_model.fnet(
            torch.from_numpy(frames.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_core_iteration_parity(torch_model, flax_pair):
    """Full window refinement: correlation pyramid sampling, 456-dim
    input assembly, time/space transformer, feature/vis heads — 2
    iterations on random weights."""
    model, variables = flax_pair
    rs = np.random.RandomState(2)
    # levels are /8 pooled: keep the coarsest level >= 2x2 (torch's
    # align-corners normalizer divides by H-1; degenerate only at toy
    # sizes the real 96x128 fmaps never reach)
    s, hh, ww, n = WINDOW, 24, 32, 3
    fmaps = rs.randn(s, hh, ww, LATENT_DIM).astype(np.float32)
    coords = (rs.rand(s, n, 2) * [ww * 4 - 8, hh * 4 - 8] + 4).astype(
        np.float32)
    feat = rs.randn(n, LATENT_DIM).astype(np.float32)
    vis = np.full((s, n), 10.0, np.float32)
    mask = np.ones((s, n), np.float32)

    coords_j, vis_j, feats_j = jax.jit(model.apply)(
        variables, jnp.asarray(fmaps), jnp.asarray(coords),
        jnp.asarray(feat), jnp.asarray(vis), jnp.asarray(mask))
    with torch.no_grad():
        coords_t, vis_t, feats_t = torch_model.forward_iteration(
            torch.from_numpy(fmaps.transpose(0, 3, 1, 2)),
            torch.from_numpy(coords), torch.from_numpy(feat),
            torch.from_numpy(vis), torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(coords_j), coords_t.numpy(),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(vis_j), vis_t.numpy(),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                               atol=5e-3, rtol=1e-3)


def test_converter_accepts_wrapped(torch_model):
    model, template = _template()
    sd = {f'module.{k}': v for k, v in torch_model.state_dict().items()}
    p1 = convert_cotracker({'model': sd}, template['params'])
    p2 = convert_cotracker(dict(torch_model.state_dict()),
                           template['params'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p1, p2)


def test_predictor_protocol(flax_pair):
    """CoTrackerPredictor-shaped call on random weights: torch-layout
    video (1, T, 3, H, W) 0..255, queries (1, N, 3) [t, x, y], backward
    tracking fills frames before the query; outputs finite and
    shape-correct."""
    _, variables = flax_pair
    pred = NativeCoTrackerPredictor(variables)
    pred.model = CoTrackerCore(iters=2)
    pred._enc = jax.jit(lambda p, f: pred.model.apply(
        p, f, method=CoTrackerCore.encode))
    pred._iter = jax.jit(lambda p, *a: pred.model.apply(p, *a))
    rs = np.random.RandomState(3)
    t, h, w = 12, 64, 96
    video = (rs.rand(1, t, 3, h, w) * 255).astype(np.float32)
    queries = np.array([[[4.0, 20.0, 30.0], [4.0, 60.0, 40.0]]],
                       np.float32)
    tracks, vis = pred(video, queries, backward_tracking=True)
    assert tracks.shape == (1, t, 2, 2)
    assert vis.shape == (1, t, 2)
    assert np.isfinite(tracks).all() and np.isfinite(vis).all()
    # frames >= query frame were written by the forward pass; earlier
    # frames by the backward pass — none may remain at the 0 init
    assert (np.abs(tracks).sum(-1) > 0).all()
    assert ((vis >= 0) & (vis <= 1)).all()
