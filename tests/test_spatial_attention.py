"""Parity tests for the fused spatial self-attention kernel
(ops/spatial_attention.py) — the xformers-class kernel for >=32^2-token
sites (reference attention_register.py:66 routes those to xformers).

Interpret-mode Pallas == plain-XLA softmax attention, plus VJP parity.
Tiling legality is validated on the real chip (scripts/bench_spatial_attn.py
--kernel); interpret mode does not check TPU block-tiling rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.ops import spatial_attention as sa


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize('b,s,heads,d', [
    (2, 256, 8, 40),    # SD level-0 head shape (tiny seq)
    (1, 512, 4, 64),    # aligned head_dim
    (2, 256, 2, 24),    # odd small head_dim
])
def test_interpret_matches_xla(dtype, b, s, heads, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (b, s, heads * d), dtype) for kk in ks)
    assert sa.supported(q, k, heads)
    out = sa._forward(q, k, v, heads, interpret=True)
    ref = sa._xla_reference(q, k, v, heads)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_public_entry_off_tpu_is_xla():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (1, 256, 320), jnp.float32) for kk in ks)
    out = sa.spatial_self_attention(q, k, v, 8)
    ref = sa._xla_reference(q, k, v, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vjp_matches_xla_grads():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (_rand(kk, (1, 256, 96), jnp.float32) for kk in ks)

    def loss_kernel(q, k, v):
        return jnp.sum(sa.spatial_self_attention(q, k, v, 4) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sa._xla_reference(q, k, v, 4) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gating():
    q = jnp.zeros((1, 256, 320))
    assert sa.supported(q, q, 8)
    assert not sa.supported(q, jnp.zeros((1, 77, 320)), 8)   # cross-attn
    assert not sa.supported(jnp.zeros((1, 100, 320)), jnp.zeros((1, 100, 320)),
                            8)                               # ragged seq
    # head_dim > 128 unsupported
    assert not sa.supported(jnp.zeros((1, 256, 512)), jnp.zeros((1, 256, 512)),
                            2)
