"""Micro-bench TPU gather formulations for the hash-grid encode.

bench_atlas_parts.py showed hash_encode FORWARD costs ~34 ms for one
10k-point eval (64 gathers of [10k] rows from [2^19, 2] tables). This
isolates the pieces. Pitfalls handled: indices are re-derived from the
scan carry each iteration (loop-invariant gathers get hoisted out of
the scan and measure zero), and tables ride the carry so they are
runtime parameters, not HLO constants (a 268 MB constant broke the axon
remote-compile transport).
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

N = 50
NPTS = 10000
T = 2 ** 19
MASK = T - 1


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.sum() if hasattr(leaf, 'sum') else leaf)
    t0 = time.time()
    out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    s = float(leaf.sum() if hasattr(leaf, 'sum') else leaf)
    dt = (time.time() - t0) / N * 1e3
    print(f'{name:52s} {dt:8.3f} ms/iter   (sink={s:.3e})', flush=True)
    return dt


def scan_n(body):
    def fn(carry):
        return jax.lax.scan(lambda c, _: (body(c), None), carry,
                            None, length=N)[0]
    return fn


def lcg(i):
    """Cheap index scrambler (power-of-2 modulus -> free mask)."""
    return (i * jnp.int32(1664525) + jnp.int32(1013904223)) & MASK


def main():
    rs = np.random.RandomState(0)
    idx0 = jnp.asarray(rs.randint(0, T, size=(NPTS,)).astype(np.int32))
    tbl2 = jnp.asarray(rs.randn(T, 2).astype(np.float32))
    pts = jnp.asarray(rs.rand(NPTS, 2).astype(np.float32))

    # 1. ONE gather [10k] rows from [T,2], fresh indices each iter
    def g1(c):
        i, tb, acc = c
        i = lcg(i)
        return (i, tb, acc + tb[i].sum() * 1e-9)
    timed('1x gather [10k] from [T,2]', scan_n(g1),
          (idx0, tbl2, jnp.float32(0)))

    # 2. 64 gathers [10k] from [T,2], fresh indices each
    def g2(c):
        i, tb, acc = c
        i = lcg(i)
        for k in range(64):
            acc = acc + tb[(i + k) & MASK].sum() * 1e-9
        return (i, tb, acc)
    timed('64x gather [10k] from [T,2]', scan_n(g2),
          (idx0, tbl2, jnp.float32(0)))

    # 3. ONE big gather [640k] from [T,2]
    idx_big = jnp.asarray(rs.randint(0, T, size=(64 * NPTS,))
                          .astype(np.int32))

    def g3(c):
        i, tb, acc = c
        i = lcg(i)
        return (i, tb, acc + tb[i].sum() * 1e-9)
    timed('1x gather [640k] from [T,2]', scan_n(g3),
          (idx_big, tbl2, jnp.float32(0)))

    # 4. integer modulo by a non-power-of-2 (dense-level index math)
    def g4(c):
        i, tb, acc = c
        i = lcg(i)
        m = (i % 17) + (i % 23) * 17
        return (i, tb, acc + m.sum().astype(jnp.float32) * 1e-9)
    timed('2x int modulo %17/%23 on [10k]', scan_n(g4),
          (idx0, tbl2, jnp.float32(0)))

    # 5. float index math instead (floor-div free): x*res, floor, frac
    def g5(c):
        i, tb, acc = c
        i = lcg(i)
        pos = (i.astype(jnp.float32) * 1e-4) * 1452.0
        c0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - c0.astype(jnp.float32)
        return (i, tb, acc + (c0.sum().astype(jnp.float32)
                              + frac.sum()) * 1e-9)
    timed('float floor/frac index math [10k]', scan_n(g5),
          (idx0, tbl2, jnp.float32(0)))

    # 6. one full hash level: uint32 hash + mask + 4 corner gathers + lerp
    def g6(c):
        i, tb, acc = c
        i = lcg(i)
        pos = (i.astype(jnp.float32) * 1e-5) * 1452.0
        c0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - c0.astype(jnp.float32)
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                ux = (c0 + dx).astype(jnp.uint32) * jnp.uint32(1)
                uy = (c0 + dy + 7).astype(jnp.uint32) * jnp.uint32(2654435761)
                ii = ((ux ^ uy) & jnp.uint32(MASK)).astype(jnp.int32)
                w = (jnp.where(dx, frac, 1 - frac)
                     * jnp.where(dy, frac, 1 - frac))
                out = out + tb[ii] * w[:, None]
        return (i, tb, acc + out.sum() * 1e-9)
    timed('1 hash level (hash+4 gathers+lerp) [10k]', scan_n(g6),
          (idx0, tbl2, jnp.float32(0)))

    # 7. the real hash_encode (16 levels), points perturbed per iter
    from videoswap_tpu.atlas.imlp import hash_encode
    tbl16 = jnp.asarray(rs.randn(16, T, 2).astype(np.float32) * 1e-4)

    def g7(c):
        x, tb, acc = c
        x = (x + 1e-5) % 1.0
        out = hash_encode(x, tb)
        return (x, tb, acc + out.sum() * 1e-9)
    timed('hash_encode 16 levels [10k]', scan_n(g7),
          (pts, tbl16, jnp.float32(0)))

    # 8. hash_encode minus the dense-level modulo: force all-hash levels
    def g8(c):
        x, tb, acc = c
        x = (x + 1e-5) % 1.0
        outs = []
        for lv in range(16):
            res = int(np.floor(16 * 1.38 ** lv))
            pos = x * res
            c0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - c0
            out = 0.0
            for dx in (0, 1):
                for dy in (0, 1):
                    ux = (c0[:, 0] + dx).astype(jnp.uint32)
                    uy = ((c0[:, 1] + dy).astype(jnp.uint32)
                          * jnp.uint32(2654435761))
                    ii = ((ux ^ uy) & jnp.uint32(MASK)).astype(jnp.int32)
                    w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                         * jnp.where(dy, frac[:, 1], 1 - frac[:, 1]))
                    out = out + tb[lv][ii] * w[:, None]
            outs.append(out)
        o = jnp.concatenate(outs, axis=-1)
        return (x, tb, acc + o.sum() * 1e-9)
    timed('hash-only 16 levels (no dense modulo) [10k]', scan_n(g8),
          (pts, tbl16, jnp.float32(0)))


if __name__ == '__main__':
    main()
