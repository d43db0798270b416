"""Test harness: run everything on a virtual 8-device CPU mesh.

The image's sitecustomize registers the axon TPU backend and forces
`jax_platforms="axon,cpu"` in every process — env vars alone do NOT give a
CPU run (tests would silently compile through the remote TPU tunnel, ~100x
slower). We must override jax.config AFTER importing jax, before any backend
is touched, plus set the virtual device count (the standard JAX substitute
for a "fake backend" in multi-device tests — see SURVEY.md §4).
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'float32')
# persistent compile cache keeps repeated CI runs fast on the 1-core host
os.makedirs('/root/.cache/jax_test_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import pytest  # noqa: E402

assert jax.devices()[0].platform == 'cpu'
assert jax.device_count() == 8, 'expected 8 virtual CPU devices'

# Smoke tier: `pytest -m smoke` runs a fast high-signal subset (<~5 min
# cold on this 1-core host) so the full ~50-min cold suite isn't the only
# signal. Whole modules are tiered here rather than per-test marks.
SMOKE_MODULES = {
    'test_registry.py', 'test_schedulers.py', 'test_adapter.py',
    'test_metrics.py', 'test_p2p.py', 'test_p2p_golden.py',
    'test_hash_table_grad.py', 'test_subpixel.py', 'test_converters.py',
    'test_attention.py', 'test_edlora.py', 'test_preprocess_hardening.py',
    'test_pose.py',
    # the flagship inference coupling (ED-LoRA merge + controlled
    # cross-attention + blending); ~1:45 warm-cache of the tier's budget
    'test_edlora_blend_e2e.py',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SMOKE_MODULES \
                and 'slow' not in item.keywords:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope='session')
def rng():
    return jax.random.PRNGKey(0)
