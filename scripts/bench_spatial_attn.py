"""Microbench: L0 spatial self-attention components at bench shapes.

B=32 (16 frames x CFG), S=4096 (64x64), heads=8, head_dim=40 (C=320).
Decomposes the measured XLA attention time into MXU (QK^T, P.V at d=40
padded to 128-lane contraction), VPU (exp pass), and HBM terms, and times
d=128 equivalents to quantify the padding waste. Device-side lax.scan
loops (one dispatch, time n vs 1) per CLAUDE.md methodology.
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

B, S, H, D = 32, 4096, 8, 40


def timed_scan(fn, args, iters=8):
    """Time fn via a device-side scan: run iters steps in ONE dispatch,
    subtract a 1-step dispatch, divide. fn must map args -> args-like
    (data dependency between iterations)."""

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


def main():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, S, H, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, S, H, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, S, H, D) * 0.3, jnp.bfloat16)

    names = sys.argv[1:] or ['xla_full', 'logits_only', 'pv_only',
                             'exp_only', 'd128_matmul', 'd40_matmul']

    if 'xla_full' in names:
        def xla_full(q, k, v):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32) * D**-0.5
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum('bhqk,bkhd->bqhd', p, v)
            # rotate outputs back into inputs for the scan dependency
            return o, q, k
        print(f'xla_full      {timed_scan(xla_full, (q, k, v)):8.2f} ms',
              flush=True)

    if 'logits_only' in names:
        def logits_only(q, k):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.bfloat16)
            # reduce immediately: dead-code-proof but keeps the matmul
            red = (jnp.sum(logits, axis=-1) * 1e-6).astype(q.dtype)
            return q + red[..., None].transpose(0, 2, 1, 3)[..., :1], k
        print(f'logits_only   {timed_scan(logits_only, (q, k)):8.2f} ms',
              flush=True)

    if 'pv_only' in names:
        p = jnp.asarray(rs.rand(B, H, S, S) / S, jnp.bfloat16)

        def pv_only(p, v):
            o = jnp.einsum('bhqk,bkhd->bqhd', p, v)
            return p + o.mean() * 1e-6, v
        print(f'pv_only       {timed_scan(pv_only, (p, v), iters=4):8.2f} ms',
              flush=True)

    if 'exp_only' in names:
        l0 = jnp.asarray(rs.randn(B, H, S, S // 4), jnp.bfloat16)

        def exp_only(x):
            return (jnp.exp(x.astype(jnp.float32)) * 1e-6).astype(
                jnp.bfloat16),
        # S//4 sized to fit two copies in HBM; scale result by 4
        print(f'exp_only(x4)  {timed_scan(exp_only, (l0,), iters=4) * 4:8.2f}'
              ' ms', flush=True)

    if 'd128_matmul' in names:
        q128 = jnp.asarray(rs.randn(B, S, H, 128) * 0.3, jnp.bfloat16)
        k128 = jnp.asarray(rs.randn(B, S, H, 128) * 0.3, jnp.bfloat16)

        def d128(q, k):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.bfloat16)
            red = (jnp.sum(logits, axis=-1) * 1e-6).astype(q.dtype)
            return q + red[..., None].transpose(0, 2, 1, 3)[..., :1], k
        print(f'd128_matmul   {timed_scan(d128, (q128, k128)):8.2f} ms',
              flush=True)

    if 'xla_maxfree' in names:
        # max-free: one exp, denominator from a second consumer of e,
        # normalize AFTER the value contraction. Tests whether XLA's
        # attention fusion drops a pass when the max-subtract is gone.
        def xla_maxfree(q, k, v):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32) * D**-0.5
            e = jnp.exp(jnp.minimum(logits, 60.0)).astype(v.dtype)
            o = jnp.einsum('bhqk,bkhd->bqhd', e, v,
                           preferred_element_type=jnp.float32)
            denom = jnp.einsum('bhqk->bhq', e.astype(jnp.float32))
            o = o / denom.transpose(0, 2, 1)[..., None]
            return o.astype(q.dtype), q, k
        print(f'xla_maxfree   {timed_scan(xla_maxfree, (q, k, v)):8.2f} ms',
              flush=True)

    if 'kernel' in names:
        from videoswap_tpu.ops.spatial_attention import spatial_self_attention
        qm = q.reshape(B, S, H * D)
        km = k.reshape(B, S, H * D)
        vm = v.reshape(B, S, H * D)

        def kern(q, k, v):
            o = spatial_self_attention(q, k, v, H)
            return o, q, k
        print(f'kernel        {timed_scan(kern, (qm, km, vm)):8.2f} ms',
              flush=True)

    if 'd40_matmul' in names:
        # same as logits_only but f32 accumulate (what the real path needs)
        def d40(q, k):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32)
            red = (jnp.sum(logits, axis=-1) * 1e-6).astype(q.dtype)
            return q + red[..., None].transpose(0, 2, 1, 3)[..., :1], k
        print(f'd40_matmul32  {timed_scan(d40, (q, k)):8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
