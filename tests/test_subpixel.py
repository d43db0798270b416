"""Subpixel upsample-conv: exact parity with the reference's
nearest-2x-then-conv3x3 semantics (reference resnet.py:21-69)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.ops.subpixel import (naive_upsample_conv,
                                        subpixel_upsample_conv)


def _naive(x, kernel, bias):
    """Literal restatement: nearest 2x upsample, then 3x3 conv, pad 1."""
    x = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = np.zeros((n, h, w, cout), np.float32)
    for k in range(3):
        for l in range(3):
            y += xp[:, k:k + h, l:l + w] @ kernel[k, l]
    return y + bias


@pytest.mark.parametrize('shape,cout', [((2, 6, 5, 8), 8), ((1, 4, 4, 3), 7)])
def test_subpixel_matches_naive_fp32(shape, cout):
    rs = np.random.RandomState(0)
    x = rs.randn(*shape).astype(np.float32)
    kernel = (rs.randn(3, 3, shape[-1], cout) * 0.2).astype(np.float32)
    bias = rs.randn(cout).astype(np.float32)

    got = np.asarray(subpixel_upsample_conv(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), jnp.float32))
    want = _naive(x, kernel, bias)
    assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], cout)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # the in-repo naive path agrees too
    got2 = np.asarray(naive_upsample_conv(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), jnp.float32,
        (2 * shape[1], 2 * shape[2])))
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-4)


def test_subpixel_bf16_close_to_naive():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 8, 8, 16).astype(np.float32)
    kernel = (rs.randn(3, 3, 16, 16) * 0.1).astype(np.float32)
    bias = rs.randn(16).astype(np.float32)
    a = np.asarray(subpixel_upsample_conv(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
        jnp.bfloat16)).astype(np.float32)
    b = _naive(x, kernel, bias)
    # bf16 tap-sum rounding only: stays within bf16 noise of the fp32 ref
    np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15)


def test_upsample3d_subpixel_equals_naive_env(monkeypatch):
    """The module picks subpixel for clean 2x; VS_NO_SUBPIXEL forces the
    repeat+conv path; both must agree (fp32)."""
    from videoswap_tpu.models.resnet3d import Upsample3D

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 3, 6, 6, 8), jnp.float32)
    mod = Upsample3D(8, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    fast = mod.apply(params, x)

    monkeypatch.setenv('VS_NO_SUBPIXEL', '1')
    slow = mod.apply(params, x)
    assert fast.shape == slow.shape == (1, 3, 12, 12, 8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-4, atol=2e-4)


def test_upsample3d_ragged_output_size():
    """Ragged targets (reference's ceil-repeat + crop, resnet.py:38-56)
    take the fallback and honor the requested size."""
    from videoswap_tpu.models.resnet3d import Upsample3D

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 2, 5, 5, 4), jnp.float32)
    mod = Upsample3D(4, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x, (9, 9))
    assert y.shape == (1, 2, 9, 9, 4)


def test_vae_decoder_param_paths_unchanged():
    """The subpixel rewrite must keep the nn.Conv kernel/bias pytree paths
    the weight converter generates torch keys from."""
    from videoswap_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_groups=4,
                        dtype=jnp.float32)
    params = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 32, 32, 3))),
        jax.random.PRNGKey(0))['params']
    for i in range(3):
        leaf = params['decoder'][f'up_blocks_{i}_upsamplers_0_conv']
        assert leaf['kernel'].shape == (3, 3, 8, 8)
        assert leaf['bias'].shape == (8,)


def test_unet_upsampler_param_paths_unchanged():
    from videoswap_tpu.models.resnet3d import Upsample3D

    mod = Upsample3D(8, dtype=jnp.float32)
    params = jax.eval_shape(
        lambda k: mod.init(k, jnp.zeros((1, 2, 4, 4, 8))),
        jax.random.PRNGKey(0))['params']
    leaf = params['conv']['conv2d']
    assert leaf['kernel'].shape == (3, 3, 8, 8)
    assert leaf['bias'].shape == (8,)
