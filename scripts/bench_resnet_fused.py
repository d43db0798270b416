"""Fused GroupNorm->SiLU->conv3x3 experiment — NEGATIVE RESULT (round 3).

Hypothesis: a Pallas kernel keeping a whole frame in VMEM (L0: 64x64x320
bf16 = 2.6 MB), applying the GN affine + SiLU in-register and running
the 3x3 conv as 9 shifted [HW, C] x [C, C] MXU dots could beat XLA's
GN+SiLU+conv (resnets/samplers = 82 ms of the 325.6 ms CFG step).

Measured on v5e (this script):
  L0 (32x64x64x320): XLA 1.86 ms (130 TF/s, 66% MFU)  kernel 3.44 ms
  L1 (32x32x32x640): XLA 1.41 ms (171 TF/s, 87% MFU)  kernel 1.79 ms

XLA WINS BOTH levels. The 9-shifted-dots formulation contracts only
K=C(320|640) per dot — too short to hide MXU latency — while XLA's
implicit-GEMM conv pipelines the halo reads and contracts K=9C in one
sweep. The convs are already at 66-87%% MFU, so the whole resnet family
holds at most ~20 ms of theoretical headroom with no kernel-shaped way
in. Routed to XLA; do not revisit without a fundamentally different conv
formulation (e.g. Winograd, which changes numerics).

GN statistics are precomputed in XLA (tiny [N, G] tensors); kernel VMEM
note: whole-frame fp32 intermediates OOM (22.9 MB scoped vs 16) — the
kernel stripes rows, and the timing scan must perturb in bf16 or the
activation silently promotes to f32 and doubles the block.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def gn_stats(x, groups):
    n, h, w, c = x.shape
    xg = x.reshape(n, h * w, groups, c // groups).astype(jnp.float32)
    mu = xg.mean(axis=(1, 3))
    var = xg.var(axis=(1, 3))
    return mu, jax.lax.rsqrt(var + 1e-5)


STRIPE = 16


def _kernel(x_ref, sc_ref, sh_ref, k_ref, b_ref, o_ref):
    # x_ref: [1, H+2, W+2, C] (pre-padded in XLA); process the frame in
    # row stripes so fp32 affine/SiLU temporaries stay ~1 MB (whole-frame
    # fp32 intermediates VMEM-OOM at L0: 22.9 MB scoped vs the 16 limit)
    _, hp, wp, c = x_ref.shape
    h, w = hp - 2, wp - 2
    cout = o_ref.shape[-1]
    sc = sc_ref[0]
    sh = sh_ref[0]
    for r in range(h // STRIPE):
        xs = x_ref[0, pl.ds(r * STRIPE, STRIPE + 2)].astype(jnp.float32)
        y = xs * sc + sh                                   # GN affine
        y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)   # SiLU
        acc = jnp.zeros((STRIPE * w, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = y[dy:dy + STRIPE, dx:dx + w].reshape(STRIPE * w, c)
                acc += jax.lax.dot_general(
                    sl, k_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(r * STRIPE, STRIPE)] = (
            (acc + b_ref[:]).reshape(STRIPE, w, cout).astype(o_ref.dtype))


def fused_gn_silu_conv(x, gamma, beta, kernel, bias, groups=32,
                       interpret=False):
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    mu, inv = gn_stats(x, groups)
    gsize = c // groups
    # per-(sample, channel) scale/shift folding group stats + GN affine:
    # y = (x - mu_g) inv_g gamma + beta = x * sc + sh. The zero padding
    # ring must stay zero AFTER affine+silu (conv pad semantics), so sc/sh
    # apply only to the interior: pad x already-affine-biased? No — apply
    # sc/sh inside and mask the ring via padding x with the value whose
    # affine image is zero: x_pad = -sh/sc gives y=0, silu(0)=0.
    inv_c = jnp.repeat(inv, gsize, axis=1) * gamma[None, :]   # [N, C]
    sh = beta[None, :] - jnp.repeat(mu, gsize, axis=1) * inv_c
    pad_val = (-sh / jnp.maximum(jnp.abs(inv_c), 1e-20)
               * jnp.sign(inv_c))                             # [N, C]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ring = jnp.zeros((n, h + 2, w + 2, 1), jnp.float32).at[
        :, 1:-1, 1:-1].set(1.0)
    xp = (xp * ring + pad_val[:, None, None, :] * (1 - ring)).astype(
        x.dtype)
    return pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec(kernel.shape, lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
    )(xp, inv_c[:, None, :].astype(jnp.float32),
      sh[:, None, :].astype(jnp.float32), kernel, bias)


def xla_gn_silu_conv(x, gamma, beta, kernel, bias, groups=32):
    n, h, w, c = x.shape
    mu, inv = gn_stats(x, groups)
    gsize = c // groups
    mu_c = jnp.repeat(mu, gsize, axis=1)
    inv_c = jnp.repeat(inv, gsize, axis=1)
    y = ((x.astype(jnp.float32) - mu_c[:, None, None, :])
         * inv_c[:, None, None, :] * gamma + beta)
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    return (out + bias).astype(x.dtype)


def timed(fn, args, n=30):
    def scanned(x, *rest):
        def body(c, _):
            # perturb in x's own dtype: a f32 scalar would promote the
            # whole activation to f32 and double the kernel's VMEM block
            out = fn(x + (c * 1e-20).astype(x.dtype), *rest)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    j1 = jax.jit(lambda *a: jnp.sum(fn(*a)))
    js = jax.jit(scanned)
    float(j1(*args)); float(js(*args))                      # noqa: E702
    t0 = time.perf_counter(); float(j1(*args)); t1 = time.perf_counter()  # noqa: E501,E702
    t2 = time.perf_counter(); float(js(*args)); t3 = time.perf_counter()  # noqa: E501,E702
    return ((t3 - t2) - (t1 - t0)) / (n - 1) * 1e3


def main():
    rs = np.random.RandomState(0)
    print('backend:', jax.default_backend(), flush=True)
    for name, (n, h, w, c) in (('L0', (32, 64, 64, 320)),
                               ('L1', (32, 32, 32, 640))):
        x = jnp.asarray(rs.randn(n, h, w, c), jnp.bfloat16)
        gamma = jnp.asarray(rs.rand(c) + 0.5, jnp.float32)
        beta = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)
        kern = jnp.asarray(rs.randn(3, 3, c, c) * (1 / np.sqrt(9 * c)),
                           jnp.bfloat16)
        bias = jnp.asarray(rs.randn(c) * 0.01, jnp.float32)
        args = (x, gamma, beta, kern, bias)
        ref = jax.jit(xla_gn_silu_conv)(*args)
        out = jax.jit(fused_gn_silu_conv)(*args)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t_x = timed(xla_gn_silu_conv, args)
        t_k = timed(fused_gn_silu_conv, args)
        flops = 2 * n * h * w * c * c * 9
        print(f'{name} ({n}x{h}x{w}x{c}): xla {t_x:6.2f} ms '
              f'({flops / t_x / 1e9:.0f} GF/s)  kernel {t_k:6.2f} ms '
              f'({flops / t_k / 1e9:.0f} GF/s)  maxerr {err:.3e}',
              flush=True)


if __name__ == '__main__':
    main()
