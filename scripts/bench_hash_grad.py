"""On-chip validation + bench of the hash-grid table-gradient kernel.

Parity (kernel vs XLA scatter) per level size, then device-loop timings
(lax.scan over the op, per CLAUDE.md: per-dispatch axon overhead ~4-5 ms
poisons naive timings). The e2e atlas step bench is scripts/bench_atlas.py.

Run on the TPU: python scripts/bench_hash_grad.py
"""

import argparse
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

from videoswap_tpu.ops.hash_table_grad import (hash_table_grad,       # noqa
                                               hash_table_grad_xla)


def timed_scan(fn, args, n=20):
    """Time fn(idx, val) via a device-side scan: n dispatch-free
    iterations, the val input perturbed by the carry so XLA cannot hoist
    the loop-invariant op out of the scan (CLAUDE.md: constant inputs
    constant-fold)."""
    idx, val = args

    def scanned(idx, val):
        def body(c, _):
            out = fn(idx, val + c * 1e-20)
            return jnp.sum(out) * 1e-30, None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    def once(idx, val):
        return jnp.sum(fn(idx, val))

    j1 = jax.jit(once)
    js = jax.jit(scanned)
    float(j1(idx, val))
    float(js(idx, val))
    t0 = time.perf_counter(); float(j1(idx, val)); t1 = time.perf_counter()
    t2 = time.perf_counter(); float(js(idx, val)); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=240_000)
    ap.add_argument('--f32', action='store_true',
                    help='also time the non-split fp32 matmul path')
    args = ap.parse_args()
    print('backend:', jax.default_backend(), flush=True)

    rng = np.random.RandomState(0)
    r = args.rows
    for g in (289, 43681, 82944, 157609, 299209, 2 ** 19):
        idx = jnp.asarray(rng.randint(0, g, size=r), jnp.int32)
        val = jnp.asarray(rng.randn(2, r).astype(np.float32) * 0.1)
        ref = jax.jit(lambda i, v: hash_table_grad_xla(i, v, g))(idx, val)
        out = jax.jit(lambda i, v: hash_table_grad(i, v, g))(idx, val)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        t_k = timed_scan(lambda i, v: hash_table_grad(i, v, g), (idx, val))
        t_s = timed_scan(lambda i, v: hash_table_grad_xla(i, v, g),
                         (idx, val))
        extra = ''
        if args.f32:
            t_f = timed_scan(
                lambda i, v: hash_table_grad(i, v, g, bf16x2=False),
                (idx, val))
            extra = f'  f32 {t_f:7.2f} ms'
        print(f'G={g:7d} rows={r}: kernel {t_k:7.2f} ms  '
              f'scatter {t_s:7.2f} ms{extra}  maxerr {err:.2e} '
              f'(ref max {scale:.2e})', flush=True)


if __name__ == '__main__':
    main()
