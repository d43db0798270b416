"""Ablate the atlas train step's cost on the real chip.

The full step measured ~247 ms/iter (bench_atlas.py) while its matmul
FLOPs (~0.7 TFLOP fp32, run at XLA's default bf16 matmul precision)
account for only a few ms — something non-MXU dominates. Candidates:
the multiresolution hash grid's gathers (fwd) and scatter-adds (bwd;
XLA lowers colliding-index scatter to a serial loop on TPU), the data
gathers, or sheer op-count overhead. Each timing below scans N
iterations of one piece inside a single dispatch and fetches a scalar.
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

BATCH = 10000
N = 50


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    s = float(leaf.sum() if hasattr(leaf, 'sum') else leaf)
    dt = (time.time() - t0) / N * 1e3
    print(f'{name:44s} {dt:8.3f} ms/iter   (sink={s:.3e})', flush=True)
    return dt


def scan_n(body, init):
    def fn(carry):
        return jax.lax.scan(lambda c, _: (body(c), None), carry,
                            None, length=N)[0]
    return fn


def main():
    from videoswap_tpu.atlas.imlp import IMLP, hash_encode

    rs = np.random.RandomState(0)
    pts2 = jnp.asarray(rs.rand(BATCH, 2).astype(np.float32))
    pts3 = jnp.asarray(rs.rand(BATCH, 3).astype(np.float32))

    # ---- 1. hash encode forward only --------------------------------------
    table = jnp.asarray(rs.randn(16, 2 ** 19, 2).astype(np.float32) * 1e-4)

    def he_fwd(c):
        x, tb = c
        out = hash_encode(x, tb)
        return (x + out[:, :2] * 1e-9, tb)

    timed('hash_encode fwd', scan_n(he_fwd, None), (pts2, table))

    # ---- 2. hash encode fwd+bwd (scatter into the table) ------------------
    def he_bwd(c):
        x, tb = c
        g = jax.grad(lambda t: hash_encode(x, t).sum())(tb)
        return (x, tb + g * 1e-9)

    timed('hash_encode fwd+bwd (table grad)', scan_n(he_bwd, None),
          (pts2, table))

    # ---- 3. F_Atlas full eval fwd+bwd -------------------------------------
    atlas = IMLP(input_dim=2, output_dim=3, hidden_dim=256,
                 pe_type='hash_encoding', mlp_layers=8, skip_layers=(4, 7))
    ap = jax.jit(atlas.init)(jax.random.PRNGKey(0), pts2)

    def atlas_bwd(c):
        x, p = c
        g = jax.grad(lambda p: atlas.apply(p, x).sum())(p)
        return (x, jax.tree.map(lambda a, b: a + b * 1e-9, p, g))

    timed('F_Atlas (hash+8-layer MLP) fwd+bwd', scan_n(atlas_bwd, None),
          (pts2, ap))

    # ---- 4. FG mapper (6-layer, no PE) fwd+bwd -----------------------------
    fg = IMLP(input_dim=3, output_dim=2, hidden_dim=256, pe_type='none',
              mlp_layers=6)
    fp = jax.jit(fg.init)(jax.random.PRNGKey(1), pts3)

    def fg_bwd(c):
        x, p = c
        g = jax.grad(lambda p: fg.apply(p, x).sum())(p)
        return (x, jax.tree.map(lambda a, b: a + b * 1e-9, p, g))

    timed('FG mapper (6-layer MLP) fwd+bwd', scan_n(fg_bwd, None),
          (pts3, fp))

    # ---- 5. F_Alpha (8-layer, fourier PE) fwd+bwd --------------------------
    fa = IMLP(input_dim=3, output_dim=1, hidden_dim=256, pe_type='encoding',
              pe_dim=5, mlp_layers=8)
    fap = jax.jit(fa.init)(jax.random.PRNGKey(2), pts3)

    def fa_bwd(c):
        x, p = c
        g = jax.grad(lambda p: fa.apply(p, x).sum())(p)
        return (x, jax.tree.map(lambda a, b: a + b * 1e-9, p, g))

    timed('F_Alpha (8-layer MLP + PE) fwd+bwd', scan_n(fa_bwd, None),
          (pts3, fap))

    # ---- 6. data gathers ----------------------------------------------------
    video = jnp.asarray(rs.rand(72, 448, 768, 3).astype(np.float32))

    def gath(c, video):
        k, acc = c
        k1, k2, k3, k = jax.random.split(k, 4)
        x = jax.random.randint(k1, (BATCH,), 0, 768)
        y = jax.random.randint(k2, (BATCH,), 0, 448)
        f = jax.random.randint(k3, (BATCH,), 0, 72)
        v = video[f, y, x]
        return (k, acc + v.sum() * 1e-9)

    # the 393 MB video rides as a jit ARGUMENT: closure-captured constants
    # are inlined into the remote-compile payload and the axon tunnel
    # rejects the request with HTTP 413 (length limit)
    def gath8(c, video):
        for _ in range(8):
            c = gath(c, video)
        return c

    timed('8x data gathers (one shown, x8)',
          lambda c, video: jax.lax.scan(
              lambda cc, _: (gath8(cc, video), None), c,
              None, length=N)[0],
          (jax.random.PRNGKey(0), jnp.float32(0)), video)


if __name__ == '__main__':
    main()
