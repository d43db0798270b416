"""Fused GEGLU feed-forward — Pallas TPU kernel.

XLA cannot fuse across two matmuls, so the transformer FFN's 4x-wide GEGLU
intermediate makes a full HBM round trip (671 MB per call at SD level-0 —
measured 4.5 ms/call where the matmul FLOPs cost 1.8 ms). This kernel keeps
the intermediate in VMEM: weights stay resident (c=320: 2.4 MB, c=640:
9.8 MB), row blocks stream through. Measured on v5e: 3.6 -> 3.2 ms at
(131072, 320) and 2.9 -> 1.7 ms at (32768, 640).

Exact (erf) GELU matches the reference diffusers FeedForward
(activation 'geglu', F.gelu default); Pallas TPU has no erf primitive so
the Abramowitz-Stegun 7.1.26 polynomial is used (|err| <= 1.5e-7, far
below bf16 resolution).

Backward: custom VJP in plain XLA (recompute h) for the training path.
Used only where the weights fit VMEM (c <= 640); larger widths run tiny
row counts in this model family and stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_KERNEL_WIDTH = 640


def _erf(x):
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


# erf(u) ~ u * q(u^2/9) on |u|<=3, sign(u) outside; q is a degree-10
# Chebyshev-LS fit converted to Horner form. Pure multiply-add (no
# divide/exp like the A-S 7.1.26 formula — measured ~1.5 ms/module of VPU
# time in the fused temporal kernel at SD level-0), fp32 end-to-end GELU
# error <= 4.7e-5 — far below bf16 resolution and every kernel-parity
# tolerance in this repo (>= 2e-4 for bf16 paths).
_ERF_HORNER = (1.4207271411, -8.8140112788, 24.913610011, -43.054002726,
               51.767980495, -46.861629272, 33.590318391, -19.508373138,
               9.1353631098, -3.3850338503, 1.1283787715)


def _erf_fast(u):
    # fp32 internally regardless of input dtype: the Horner coefficients
    # reach ~52 with heavy cancellation — bf16 evaluation would be garbage
    u = u.astype(jnp.float32)
    s = jnp.minimum(u * u * (1.0 / 9.0), 1.0)
    q = jnp.float32(_ERF_HORNER[0])
    for c in _ERF_HORNER[1:]:
        q = q * s + c
    return jnp.clip(u * q, -1.0, 1.0)


def gelu_fast(x):
    """Division/exp-free exact-form GELU (|err| <= 4.7e-5; fp32 internal,
    result in the INPUT dtype — dtype-preserving like jax.nn.gelu, which
    the custom-VJP dtype contracts rely on)."""
    out = 0.5 * x.astype(jnp.float32) * (1.0 + _erf_fast(x * (2.0 ** -0.5)))
    return out.astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    mid = h.shape[-1] // 2
    g = h[:, :mid] * gelu_fast(h[:, mid:])
    o = jax.lax.dot_general(
        g.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = o.astype(o_ref.dtype)


def _xla_reference(x2, w1, b1, w2, b2):
    # same gelu_fast as the kernel: fallback/VJP parity is then exact;
    # gelu_fast itself is tested against jax.nn.gelu (<= 4.7e-5).
    # Output dtype pinned to x2.dtype like the kernel's out_shape — the
    # custom-VJP cotangent contract needs fallback == kernel dtypes even
    # when fp32 biases promote the intermediate.
    h = (x2 @ w1 + b1)
    a, gate = jnp.split(h, 2, axis=-1)
    return ((a * gelu_fast(gate)) @ w2 + b2).astype(x2.dtype)


def _forward(x2, w1, b1, w2, b2, interpret: bool = False,
             block: int | None = None, semantics: str = 'arbitrary'):
    n, c = x2.shape
    if block is None:
        # swept on v5e (scripts/bench_geglu.py): 256 beats 512 at c=320
        # (2.17 vs 2.71 ms @ 131072 rows) and 128 at c=640 (1.73 vs 1.81
        # @ 32768 rows) — 256x(8c) double-buffers within VMEM at both widths
        block = 256
    npad = (n + block - 1) // block * block
    if npad != n:
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1.shape, lambda i: (0,)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,)),
    )(x2, w1, b1, w2, b2)
    return out[:n]


@jax.custom_vjp
def geglu_ffn(x2, w1, b1, w2, b2):
    """x2: (N, C); w1: (C, 8C) GEGLU projection; w2: (4C, C)."""
    if jax.default_backend() != 'tpu' or x2.shape[-1] > MAX_KERNEL_WIDTH:
        return _xla_reference(x2, w1, b1, w2, b2)
    return _forward(x2, w1, b1, w2, b2)


def _fwd(x2, w1, b1, w2, b2):
    return geglu_ffn(x2, w1, b1, w2, b2), (x2, w1, b1, w2, b2)


def _bwd(res, g):
    x2, w1, b1, w2, b2 = res

    def f(x2, w1, b1, w2, b2):
        return _xla_reference(x2, w1, b1, w2, b2)

    _, vjp = jax.vjp(f, x2, w1, b1, w2, b2)
    return vjp(g)


geglu_ffn.defvjp(_fwd, _bwd)
