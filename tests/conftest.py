"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (standard JAX substitute for a
"fake backend" in multi-device tests — see SURVEY.md §4).
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'float32')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return jax.random.PRNGKey(0)
