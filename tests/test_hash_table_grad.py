"""Pallas hash-grid table-gradient kernel vs XLA scatter, and the
hash_encode custom VJP vs plain autodiff.

The kernel runs in interpret mode here (CPU backend); block-tiling rules
are validated on the real chip by scripts/bench_hash_grad.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.atlas.imlp import hash_encode
from videoswap_tpu.ops.hash_table_grad import (hash_table_grad,
                                               hash_table_grad_xla)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize('num_entries', [289, 2048, 82944, 2 ** 19])
def test_kernel_matches_scatter(rng, num_entries):
    r = 4096
    idx = jnp.asarray(rng.randint(0, num_entries, size=r), jnp.int32)
    val = jnp.asarray(rng.randn(2, r), jnp.float32)
    ref = hash_table_grad_xla(idx, val, num_entries)
    out = hash_table_grad(idx, val, num_entries, interpret=True)
    assert out.shape == (num_entries, 2)
    # bf16x2 split: per-row relative error ~2^-17; colliding rows of O(1)
    # magnitude accumulate to a few e-5 absolute where the sum cancels
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=5e-5)


def test_kernel_fp32_path_and_row_padding(rng):
    # R not a multiple of the row block, fp32 (non-split) matmul path
    r = 1000
    idx = jnp.asarray(rng.randint(0, 2048, size=r), jnp.int32)
    val = jnp.asarray(rng.randn(2, r), jnp.float32)
    ref = hash_table_grad_xla(idx, val, 2048)
    out = hash_table_grad(idx, val, 2048, bf16x2=False, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_kernel_drops_negative_rows(rng):
    idx = jnp.asarray([0, -1, 5, -1, 5], jnp.int32)
    val = jnp.ones((2, 5), jnp.float32)
    out = hash_table_grad(idx, val, 512, interpret=True)
    assert float(out[0, 0]) == 1.0 and float(out[5, 1]) == 2.0
    assert float(jnp.abs(out).sum()) == 6.0


def test_kernel_single_feature(rng):
    idx = jnp.asarray(rng.randint(0, 300, size=512), jnp.int32)
    val = jnp.asarray(rng.randn(1, 512), jnp.float32)
    ref = hash_table_grad_xla(idx, val, 300)
    out = hash_table_grad(idx, val, 300, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=5e-5)


def test_custom_vjp_matches_autodiff(rng):
    """Full hash_encode grads (d_x analytic + d_table scatter fallback on
    CPU) against plain autodiff of the same implementation."""
    n, levels, t, f = 257, 6, 2048, 2
    x = jnp.asarray(rng.uniform(-1.0, 1.0, size=(n, 2)), jnp.float32)
    table = jnp.asarray(rng.randn(levels, t, f) * 1e-2, jnp.float32)
    cot = jnp.asarray(rng.randn(n, levels * f), jnp.float32)

    def loss(x, table, custom):
        out = hash_encode(x, table, base_resolution=4,
                          per_level_scale=1.61, custom_vjp=custom)
        return jnp.vdot(out, cot)

    gx, gt = jax.grad(loss, argnums=(0, 1))(x, table, True)
    rx, rt = jax.grad(loss, argnums=(0, 1))(x, table, False)
    np.testing.assert_allclose(gx, rx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gt, rt, rtol=1e-5, atol=1e-6)


def test_custom_vjp_primal_identical(rng):
    x = jnp.asarray(rng.uniform(-1.0, 1.0, size=(64, 2)), jnp.float32)
    table = jnp.asarray(rng.randn(4, 1024, 2) * 1e-2, jnp.float32)
    a = hash_encode(x, table, base_resolution=4, per_level_scale=1.5)
    b = hash_encode(x, table, base_resolution=4, per_level_scale=1.5,
                    custom_vjp=False)
    np.testing.assert_array_equal(a, b)
