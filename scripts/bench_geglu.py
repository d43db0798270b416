"""GEGLU-kernel ablation at SD level-0 shapes (131072 x 320, bf16).

The full-step profile puts the FFN family at 47 ms/step where the matmul
floor is ~12-15 ms; the c=320 sites measure ~3.2 ms each vs a 1.6 ms FLOP
floor, with ~1.1-1.5 ms of that the deg-10 Horner gelu on the 4x
intermediate (VPU, potentially serialized against the MXU). This sweeps
row-block size and grid dimension semantics, plus an XLA reference.

Methodology (CLAUDE.md): device-side lax.scan loop (one dispatch),
time(n) - time(1) deltas, runtime-fed inputs so nothing constant-folds.
"""

from __future__ import annotations

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

N = int(os.environ.get('BG_N', 131072))
C = int(os.environ.get('BG_C', 320))
LOOP = 20


def timed(fn, *args):
    """scan the op LOOP times with a data dependency; return ms/op."""
    def once(x):
        return fn(x, *args)

    @jax.jit
    def many(x):
        def body(h, _):
            return once(h), ()
        h, _ = jax.lax.scan(body, x, None, length=LOOP)
        return h

    one = jax.jit(once)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(N, C) * 0.3, jnp.bfloat16)
    float(jnp.sum(one(x)))          # compile + warm
    float(jnp.sum(many(x)))
    t0 = time.time()
    float(jnp.sum(one(x)))
    t1 = time.time()
    float(jnp.sum(many(x)))
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (LOOP - 1) * 1e3


def main():
    from videoswap_tpu.ops import geglu_ffn as gf

    rs = np.random.RandomState(1)
    w1 = jnp.asarray(rs.randn(C, 8 * C) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rs.randn(8 * C) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(4 * C, C) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rs.randn(C) * 0.01, jnp.float32)

    variants = {
        'xla': lambda x: gf._xla_reference(x, w1, b1, w2, b2),
        'default': lambda x: gf._forward(x, w1, b1, w2, b2),
    }
    for blk in (64, 128, 256, 512, 1024):
        variants[f'b{blk}-arb'] = (
            lambda x, b=blk: gf._forward(x, w1, b1, w2, b2, block=b))
        variants[f'b{blk}-par'] = (
            lambda x, b=blk: gf._forward(x, w1, b1, w2, b2, block=b,
                                         semantics='parallel'))
    names = sys.argv[1:] or list(variants)
    for name in names:
        t0 = time.time()
        ms = timed(variants[name])
        print(f'{name:20s} {ms:7.3f} ms  (incl compile {time.time()-t0:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
