"""Fused spatial self-attention for SD head_dim 40 — Pallas TPU kernel.

ABLATION RESULT — NOT ROUTED (ops/attention.py keeps XLA for these sites).

The xformers-class kernel attempt for the >=32^2-token sites (reference
attention_register.py:66: seq >= 32^2 goes to xformers). Design, per the
temporal-kernel recipe (ops/temporal_attention.py):

- max-free softmax: ONE exp pass (logits clipped at 60; attention inputs
  are LayerNorm-bounded and exp runs in fp32) instead of the
  max+exp+normalize chain;
- the softmax DENOMINATOR rides the value contraction for free: V is laid
  out per-head in 48-lane groups [v_h | ones | 0-pad] (48 <= the padded
  128 output lanes the MXU wastes anyway), so dot(e, v_aug) yields both
  the weighted values and the row sum in one MXU op;
- normalization AFTER the contraction on the tiny [BQ, 48] tile;
- flash-style K-chunked grid with an fp32 VMEM accumulator (whole-S K/V
  blocks OOM the 16 MB VMEM).

Measured v5e, level-0 CFG shapes (B=32, S=4096, h=8, d=40), device-side
scan loops (scripts/bench_spatial_attn.py):
  XLA fused attention     13.9 ms
  this kernel             14.5 ms
  transposed-q variant    29.3 ms (daug=128 V re-reads dominate)
Beat-count floor: qk and pv are both 32 MXU beats/head/block (the d=40
padding wastes contraction DEPTH, not beats — output tiles x chunks is
invariant), so MXU floor = 11.2 ms and the one-exp VPU pass adds 4.7 ms
SERIALIZED in a monolithic kernel; XLA's flash fusion pipelines the same
stages across ops and already sits within ~10%% of the floor. Max possible
win is ~1.3 ms/site with perfect in-kernel VPU/MXU overlap — not worth the
routing risk. Kept as a tested, documented ablation; do not re-route
without an idea that cuts MXU beats or overlaps the exp pass.

Backward: custom VJP recomputing in plain XLA (inference is the target
path; training routes through 'chunked' attention anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLIP = 60.0
BQ = 256                      # query rows per grid step
BK = 2048                     # key/value rows per grid step (VMEM-sized)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, kt_ref, v_ref, o_ref, acc_ref, *, heads: int, d: int,
            daug: int, scale: float, nk: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for h in range(heads):
        ql = slice(h * d, (h + 1) * d)
        vl = slice(h * daug, (h + 1) * daug)
        s = jax.lax.dot_general(
            q_ref[0, :, ql], kt_ref[0, ql, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # single fused scale+clip+exp pass, no max pass: attention inputs
        # are LayerNorm-bounded so fp32 exp cannot overflow below CLIP;
        # bf16 probs match the fused XLA path (ops/attention.py casts
        # probs to the value dtype too)
        e = jnp.exp(jnp.minimum(s * scale, CLIP)).astype(v_ref.dtype)
        acc_ref[:, vl] += jax.lax.dot_general(
            e, v_ref[0, :, vl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _finish():
        for h in range(heads):
            vl = slice(h * daug, (h + 1) * daug)
            o = acc_ref[:, vl]
            denom = o[:, d:d + 1]           # the ones column's row sums
            o_ref[0, :, vl] = (o * (1.0 / denom)).astype(o_ref.dtype)


def _forward(q, k, v, heads: int, interpret: bool):
    b, s, c = q.shape
    d = c // heads
    daug = _round_up(d + 1, 8)
    cp = _round_up(c, _LANE)
    cv = _round_up(heads * daug, _LANE)
    scale = d ** -0.5
    bk = min(BK, s)
    nk = s // bk

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, cp - c)))
    kt = jnp.swapaxes(jnp.pad(k, ((0, 0), (0, 0), (0, cp - c))), 1, 2)
    vh = v.reshape(b, s, heads, d)
    va = jnp.pad(vh, ((0, 0), (0, 0), (0, 0), (0, daug - d)))
    va = va.at[..., d].set(1.0)             # denominator column
    va = va.reshape(b, s, heads * daug)
    if cv != heads * daug:
        va = jnp.pad(va, ((0, 0), (0, 0), (0, cv - heads * daug)))

    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, d=d, daug=daug, scale=scale,
                          nk=nk),
        grid=(b, s // BQ, nk),
        in_specs=[
            pl.BlockSpec((1, BQ, cp), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, cp, bk), lambda i, j, kk: (i, 0, kk)),
            pl.BlockSpec((1, bk, cv), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, cv), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, cv), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, cv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qp, kt, va)
    out = out[..., :heads * daug]
    return out.reshape(b, s, heads, daug)[..., :d].reshape(b, s, c)


def _xla_reference(q, k, v, heads: int):
    b, s, c = q.shape
    d = c // heads
    qh, kh, vh = (t.reshape(b, s, heads, d) for t in (q, k, v))
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * d ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs, vh)
    return out.reshape(b, s, c)


def supported(q: jnp.ndarray, k: jnp.ndarray, heads: int) -> bool:
    """Shapes this kernel handles: self-attention (same q/k length, a
    multiple of the q block) with head_dim <= 128."""
    b, sq, c = q.shape
    return (sq == k.shape[1] and sq % BQ == 0 and c % heads == 0
            and c // heads <= _LANE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spatial_self_attention(q, k, v, heads: int):
    """q/k/v: (B, S, C) merged-head layout straight from the projections.
    Self-attention over S. Returns (B, S, C)."""
    if jax.default_backend() != 'tpu':
        return _xla_reference(q, k, v, heads)
    return _forward(q, k, v, heads, interpret=False)


def _fwd(q, k, v, heads):
    return spatial_self_attention(q, k, v, heads), (q, k, v)


def _bwd(heads, res, g):
    q, k, v = res
    b, s, c = q.shape
    d = c // heads
    scale = d ** -0.5
    qh, kh, vh, do = (t.reshape(b, s, heads, d).astype(jnp.float32)
                      for t in (q, k, v, g))
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum('bhqk,bqhd->bkhd', p, do)
    dp = jnp.einsum('bqhd,bkhd->bhqk', do, vh)
    ds = p * (dp - (p * dp).sum(axis=-1, keepdims=True))
    dq = jnp.einsum('bhqk,bkhd->bqhd', ds, kh) * scale
    dk = jnp.einsum('bhqk,bqhd->bkhd', ds, qh) * scale
    return (dq.reshape(b, s, c).astype(q.dtype),
            dk.reshape(b, s, c).astype(k.dtype),
            dv.reshape(b, s, c).astype(v.dtype))


spatial_self_attention.defvjp(_fwd, _bwd)
