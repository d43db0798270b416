"""Piecewise timing of the layer-wise motion-module path at L2
(c=1280, hw=16, f=16, CFG B=2): where do 10.7 ms go when the matmul floor
is ~3.1 ms?  Parts: temporal-attention kernel, qkv+out denses, XLA GEGLU
FFN, LayerNorms, HBM transposes, GroupNorm.  Device-side scan timing per
CLAUDE.md.
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

B, F, HW, C, HEADS = 2, 16, 16, 1280, 8
EL = B * HW * HW          # locations
N = EL * F                # rows
LOOP = 16


def timed_scan(fn, args, iters=LOOP):
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
    dt = jnp.bfloat16
    x2 = jnp.asarray(rs.randn(N, C) * 0.3, dt)
    w = jnp.asarray(rs.randn(C, C) * 0.02, dt)
    which = set(sys.argv[1:]) or {
        'attn', 'dense4', 'ffn', 'ln', 'transpose', 'gn'}

    if 'attn' in which:
        from videoswap_tpu.ops.temporal_attention import temporal_attention

        def attn(q, k, v):
            o = temporal_attention(q, k, v, HEADS, F)
            return o, k, v
        ms = timed_scan(attn, (x2, x2 * 1.01, x2 * 0.99))
        print(f'temporal_attention (x2)    {2 * ms:7.3f} ms', flush=True)

    if 'dense4' in which:
        def dense4(h):
            for _ in range(4):
                h = jax.lax.dot_general(
                    h, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)
            return (h,)
        ms = timed_scan(dense4, (x2,))
        print(f'4x dense CxC (x2 blocks)   {2 * ms:7.3f} ms', flush=True)

    if 'ffn' in which:
        w1 = jnp.asarray(rs.randn(C, 8 * C) * 0.02, dt)
        b1 = jnp.asarray(rs.randn(8 * C) * 0.01, jnp.float32)
        w2 = jnp.asarray(rs.randn(4 * C, C) * 0.02, dt)
        b2 = jnp.asarray(rs.randn(C) * 0.01, jnp.float32)
        from videoswap_tpu.ops.geglu_ffn import _xla_reference

        def ffn(h):
            return (_xla_reference(h, w1, b1, w2, b2),)
        ms = timed_scan(ffn, (x2,))
        print(f'XLA GEGLU FFN              {ms:7.3f} ms', flush=True)

        from videoswap_tpu.ops.geglu_ffn import _forward

        def ffnk(h):
            return (_forward(h, w1, b1, w2, b2),)
        ms = timed_scan(ffnk, (x2,))
        print(f'pallas GEGLU FFN (b256)    {ms:7.3f} ms', flush=True)

    if 'ln' in which:
        g = jnp.ones((C,), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)

        def ln(h):
            h32 = h.astype(jnp.float32)
            mu = h32.mean(-1, keepdims=True)
            zc = h32 - mu
            var = (zc * zc).mean(-1, keepdims=True)
            return ((zc * jax.lax.rsqrt(var + 1e-6) * g + b).astype(dt),)
        ms = timed_scan(ln, (x2,))
        print(f'LayerNorm (x3)             {3 * ms:7.3f} ms', flush=True)

    if 'transpose' in which:
        x5 = jnp.asarray(rs.randn(B, F, HW, HW, C) * 0.3, dt)

        def tr(h):
            y = h.transpose(0, 2, 3, 1, 4).reshape(EL, F, C)
            return (y.reshape(B, HW, HW, F, C).transpose(0, 3, 1, 2, 4),)
        ms = timed_scan(tr, (x5,))
        print(f'to/from (loc,frame) pair   {ms:7.3f} ms', flush=True)

    if 'gn' in which:
        import flax.linen as nn
        gnm = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dt)
        x4 = jnp.asarray(rs.randn(B * F, HW, HW, C) * 0.3, dt)
        p = jax.jit(gnm.init)(jax.random.PRNGKey(0), x4)

        def gn(h):
            return (gnm.apply(p, h),)
        ms = timed_scan(gn, (x4,))
        print(f'GroupNorm (per-frame)      {ms:7.3f} ms', flush=True)


if __name__ == '__main__':
    main()
