"""Microbench: AnimateDiff motion module / fused temporal kernel at SD
CFG bench shapes (512^2 x 16 frames). Device-side lax.scan loops per
CLAUDE.md methodology. Usage:
    python scripts/bench_motion.py [module|kernel] [level ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

F = 16
LEVELS = {0: (64, 320, 8), 1: (32, 640, 8), 2: (16, 1280, 8)}


def timed_scan(fn, args, iters=8):
    def body(carry, _):
        return fn(*carry), None

    @functools.partial(jax.jit, static_argnums=1)
    def loop(carry, n):
        out, _ = jax.lax.scan(body, carry, None, length=n)
        return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)

    def run(n):
        r = loop(args, n)
        jax.tree.map(float, r)
        t0 = time.time()
        r = loop(args, n)
        jax.tree.map(float, r)
        return time.time() - t0

    t1, tn = run(1), run(iters)
    return (tn - t1) / (iters - 1) * 1e3


def bench_module(level: int):
    from videoswap_tpu.models.motion_module import VanillaTemporalModule
    hw, c, heads = LEVELS[level]
    model = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                                  dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2 * F // F, F, hw, hw, c) * 0.3, jnp.bfloat16)
    x = jnp.broadcast_to(x, (2, F, hw, hw, c))  # CFG batch
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def step(params, x):
        o = model.apply(params, x)
        return params, o * 0.5 + x * 0.5

    ms = timed_scan(step, (params, x))
    print(f'module L{level}  (hw={hw}, c={c})  {ms:8.2f} ms', flush=True)


def bench_kernel(level: int):
    from videoswap_tpu.ops.fused_temporal import (
        _pe_rows, flatten_tt_params, fused_temporal_transformer)
    from videoswap_tpu.models.motion_module import TemporalTransformer3DModel
    hw, c, heads = LEVELS[level]
    model = TemporalTransformer3DModel(heads=heads, num_layers=1,
                                       dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, F, hw, hw, c) * 0.3, jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    include_ffn = c <= 320 and not os.environ.get('FT_SPLIT')
    flat = [jnp.asarray(p, jnp.bfloat16) if p.ndim == 2
            else jnp.asarray(p, jnp.float32)
            for p in flatten_tt_params(variables['params'], 1,
                                       include_ffn=include_ffn)]
    rpt = max(1, 128 // F) * F
    pe = jnp.asarray(_pe_rows(F, c, rpt, 24), jnp.bfloat16)
    n = 2 * hw * hw * F
    g2 = jnp.asarray(rs.randn(n, c) * 0.3, jnp.bfloat16)
    x2 = jnp.asarray(rs.randn(n, c) * 0.3, jnp.bfloat16)

    def step(g2, x2):
        o = fused_temporal_transformer(g2, x2, pe, flat, heads, F, 1,
                                       include_ffn)
        if not include_ffn:
            from videoswap_tpu.ops.fused_temporal import ffn_tail
            o = ffn_tail(o, x2, variables['params'], jnp.bfloat16)
        return o, x2

    ms = timed_scan(step, (g2, x2))
    print(f'kernel L{level}  (n={n}, c={c}, ffn={include_ffn})  '
          f'{ms:8.2f} ms', flush=True)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else 'module'
    levels = [int(a) for a in sys.argv[2:]] or [0]
    for lv in levels:
        (bench_module if what == 'module' else bench_kernel)(lv)


if __name__ == '__main__':
    main()
