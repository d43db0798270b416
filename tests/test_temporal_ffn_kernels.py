"""Parity tests for the fused temporal-attention and GEGLU-FFN Pallas
kernels (interpret mode on CPU; the real-chip ablations live in CLAUDE.md).

NOTE: interpret mode does not check TPU block-tiling rules — the kernels
are additionally validated on the real chip (CFG-step benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.ops import geglu_ffn as gmod
from videoswap_tpu.ops import temporal_attention as tmod


@pytest.mark.parametrize('el,f,h,c', [
    (64, 16, 8, 320),      # SD level-0 shape (tiny L)
    (32, 16, 8, 640),
    (16, 2, 8, 320),       # smoke frame count
    (40, 8, 8, 320),
    (10, 16, 8, 320),      # L*F not a block multiple -> padding path
])
def test_temporal_attention_kernel_parity(el, f, h, c):
    rs = np.random.RandomState(el + f)
    q = jnp.asarray(rs.randn(el * f, c).astype(np.float32))
    k = jnp.asarray(rs.randn(el * f, c).astype(np.float32))
    v = jnp.asarray(rs.randn(el * f, c).astype(np.float32))
    ref = tmod._xla_reference(q, k, v, h, f)
    out = tmod._forward(q, k, v, h, f, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_temporal_attention_vjp_matches_xla():
    el, f, h, c = 8, 4, 4, 32
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(el * f, c).astype(np.float32))
    k = jnp.asarray(rs.randn(el * f, c).astype(np.float32))
    v = jnp.asarray(rs.randn(el * f, c).astype(np.float32))

    def loss_kernel(q, k, v):
        return (tmod.temporal_attention(q, k, v, h, f) ** 2).sum()

    def loss_ref(q, k, v):
        return (tmod._xla_reference(q, k, v, h, f) ** 2).sum()

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_small_seq_attention_routing_matches():
    """dot_product_attention at F<=32 == explicit per-location softmax."""
    from videoswap_tpu.ops.attention import dot_product_attention
    el, f, h, c = 12, 16, 4, 64
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(el, f, c).astype(np.float32))
    k = jnp.asarray(rs.randn(el, f, c).astype(np.float32))
    v = jnp.asarray(rs.randn(el, f, c).astype(np.float32))
    out = dot_product_attention(q, k, v, h)
    ref = tmod._xla_reference(q.reshape(-1, c), k.reshape(-1, c),
                              v.reshape(-1, c), h, f).reshape(el, f, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('n,c', [(600, 320), (130, 640)])
def test_geglu_ffn_kernel_parity(n, c):
    rs = np.random.RandomState(n)
    x = jnp.asarray(rs.randn(n, c).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rs.randn(c, 8 * c).astype(np.float32) * 0.02)
    b1 = jnp.asarray(rs.randn(8 * c).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rs.randn(4 * c, c).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rs.randn(c).astype(np.float32) * 0.01)
    ref = gmod._xla_reference(x, w1, b1, w2, b2)
    out = gmod._forward(x, w1, b1, w2, b2, interpret=True)
    # erf polynomial: |err| <= 1.5e-7 on erf -> ~1e-6 relative on outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_geglu_ffn_vjp_matches_xla():
    n, c = 64, 32
    rs = np.random.RandomState(2)
    args = [jnp.asarray(a.astype(np.float32)) for a in (
        rs.randn(n, c) * 0.5, rs.randn(c, 8 * c) * 0.05,
        rs.randn(8 * c) * 0.01, rs.randn(4 * c, c) * 0.05,
        rs.randn(c) * 0.01)]

    g_k = jax.grad(lambda *a: (gmod.geglu_ffn(*a) ** 2).sum(),
                   argnums=tuple(range(5)))(*args)
    g_r = jax.grad(lambda *a: (gmod._xla_reference(*a) ** 2).sum(),
                   argnums=tuple(range(5)))(*args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_feedforward_module_unchanged_params():
    """FeedForward keeps the diffusers param tree (net_0_proj/net_2) and
    matches a literal GEGLU statement."""
    import flax.linen as nn
    from videoswap_tpu.models.layers import FeedForward
    ff = FeedForward(24)
    x = jnp.asarray(np.random.RandomState(3).randn(5, 7, 24)
                    .astype(np.float32))
    params = ff.init(jax.random.PRNGKey(0), x)
    assert set(params['params']) == {'net_0_proj', 'net_2'}
    assert params['params']['net_0_proj']['kernel'].shape == (24, 192)
    out = ff.apply(params, x)
    w1 = params['params']['net_0_proj']['kernel']
    b1 = params['params']['net_0_proj']['bias']
    w2 = params['params']['net_2']['kernel']
    b2 = params['params']['net_2']['bias']
    h = x @ w1 + b1
    a, gate = jnp.split(h, 2, axis=-1)
    ref = a * nn.gelu(gate, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gelu_fast_accuracy():
    """gelu_fast (divide/exp-free Horner erf) vs jax.nn.gelu exact:
    |err| <= 5e-5 in fp32 over the full saturation range."""
    x = jnp.asarray(np.linspace(-12, 12, 200001).astype(np.float32))
    ref = jax.nn.gelu(x, approximate=False)
    out = gmod.gelu_fast(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # and the A-S gelu_exact stays within its documented bound too
    out2 = gmod.gelu_exact(x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-6)


def test_geglu_ffn_bf16_grads():
    """bf16 training path: gelu_fast and the VJP must be dtype-preserving
    (a float32 Horner seed once promoted the fallback output to fp32 and
    broke the custom-VJP cotangent contract at 512^2 training shapes)."""
    n, c = 64, 32
    rs = np.random.RandomState(4)
    args = [jnp.asarray(a.astype(np.float32), jnp.bfloat16) for a in (
        rs.randn(n, c) * 0.5, rs.randn(c, 8 * c) * 0.05,
        rs.randn(8 * c) * 0.01, rs.randn(4 * c, c) * 0.05,
        rs.randn(c) * 0.01)]
    out = gmod.geglu_ffn(*args)
    assert out.dtype == jnp.bfloat16
    assert gmod.gelu_fast(args[0]).dtype == jnp.bfloat16

    g = jax.grad(lambda *a: (gmod.geglu_ffn(*a).astype(jnp.float32) ** 2)
                 .sum(), argnums=tuple(range(5)))(*args)
    for a, arg in zip(g, args):
        assert a.dtype == arg.dtype
        assert np.isfinite(np.asarray(a, np.float32)).all()

    # fp32-bias call pattern (ffn_tail's): output still follows x2
    args_fb = list(args)
    args_fb[2] = args[2].astype(jnp.float32)
    args_fb[4] = args[4].astype(jnp.float32)
    out2 = gmod.geglu_ffn(*args_fb)
    assert out2.dtype == jnp.bfloat16
    jax.grad(lambda *a: (gmod.geglu_ffn(*a).astype(jnp.float32) ** 2).sum(),
             argnums=(0,))(*args_fb)
