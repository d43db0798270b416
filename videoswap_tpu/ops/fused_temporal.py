"""Fully-fused AnimateDiff temporal transformer — one Pallas TPU kernel.

Covers everything TemporalTransformer3DModel does between its frame/space
transposes except the per-frame GroupNorm (whose (H,W) statistics span
locations, so it stays a cheap XLA op): proj_in -> N x
TemporalTransformerBlock (2 x [LayerNorm -> +sinusoidal PE -> frame-axis
attention -> out-proj -> residual] + [ff_norm -> GEGLU FFN -> residual])
-> zero-init proj_out -> outer residual. All weights (~4.4 MB bf16 at
C=320) stay VMEM-resident; activations make one HBM round trip instead
of ~14.

Techniques (each measured on v5e, see CLAUDE.md):
- rows are (location, frame) pairs; each 128-row tile holds P=128//F whole
  locations, so the F<=24 frame attention becomes dense [128,d]x[d,128]
  MXU dots with a block-diagonal -inf bias (7.5x over the best XLA
  formulation stand-alone);
- ALL logit tiles share one scratch and a single fused scale+bias+exp pass
  (per-op VPU overhead dominates 128x128-grain elementwise work);
- row reductions (softmax denominators, LayerNorm/GroupNorm moments) run
  as MXU dots against ones/group-indicator matrices — no lane-reduction
  shuffles; softmax normalizes AFTER the value contraction;
- max-free softmax (logits clipped at 60; inputs are LayerNorm-bounded,
  exp in fp32); GELU uses the divide/exp-free Horner erf polynomial
  (geglu_ffn.gelu_fast, |err| <= 4.7e-5 — the A-S 7.1.26 form's divide+exp
  cost ~1.5 ms/module of serialized VPU time at level-0).

Backward: custom VJP that recomputes the block in plain XLA (the training
path is remat-bound elsewhere; parity guaranteed by the shared reference
implementation used for CPU fallback and tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geglu_ffn import gelu_fast

NEG_INF = -1e30
CLIP = 60.0


# --------------------------------------------------------------- params
def flatten_tt_params(p: dict, n_blocks: int,
                      include_ffn: bool = True) -> list:
    """TemporalTransformer3DModel param dict -> flat arg list (fixed order,
    GroupNorm excluded — it runs outside the kernel). With
    include_ffn=False only proj_in + attention-block params are emitted
    (FFN/proj_out run outside when the weights don't fit VMEM).
    Layout mirrors models/motion_module.py naming."""
    out = [p['proj_in']['kernel'], p['proj_in']['bias']]
    for i in range(n_blocks):
        b = p[f'transformer_blocks_{i}']
        for j in (0, 1):
            a = b[f'attention_blocks_{j}']
            out += [b[f'norms_{j}']['scale'], b[f'norms_{j}']['bias'],
                    a['to_q']['kernel'], a['to_k']['kernel'],
                    a['to_v']['kernel'],
                    a['to_out_0']['kernel'], a['to_out_0']['bias']]
        if include_ffn:
            out += [b['ff_norm']['scale'], b['ff_norm']['bias'],
                    b['ff']['net_0_proj']['kernel'],
                    b['ff']['net_0_proj']['bias'],
                    b['ff']['net_2']['kernel'], b['ff']['net_2']['bias']]
    if include_ffn:
        out += [p['proj_out']['kernel'], p['proj_out']['bias']]
    return out


N_HEAD_PARAMS = 2          # proj_in kernel/bias
N_BLOCK_PARAMS = 2 * 7 + 6
N_TAIL_PARAMS = 2


# --------------------------------------------------------------- kernel
def _kernel(g_ref, x_ref, pe_ref, *args, heads: int, f: int,
            n_blocks: int, scale: float, rpt: int, include_ffn: bool,
            frame_major: bool = False):
    import os as _os
    _ablate = _os.environ.get('FT_ABLATE', '')   # bench-only VPU ablations
    refs = list(args[:-2])
    o_ref, s_scr = args[-2], args[-1]
    c = x_ref.shape[-1]
    d = c // heads
    if frame_major:
        # blocks are (1, f, P, c) slabs straight out of the model's natural
        # (B, F, HW, C) layout; transpose to (loc, frame) rows in VMEM —
        # replaces three full-tensor HBM transposes per module with two
        # in-register relayouts per block
        p_loc = x_ref.shape[2]
        rows = f * p_loc
    else:
        rows = x_ref.shape[0]
    n_tiles = rows // rpt

    def take(n):
        vals = refs[:n]
        del refs[:n]
        return vals

    ones_c = jnp.ones((c, 1), jnp.float32)
    ones_r = jnp.ones((rpt, 1), jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (rpt, rpt), 0) // f
    ci = jax.lax.broadcasted_iota(jnp.int32, (rpt, rpt), 1) // f
    bias = jnp.where(ri == ci, 0.0, NEG_INF).astype(jnp.float32)
    big_bias = jnp.concatenate([bias] * (n_tiles * heads), axis=-1)

    def rowsum(x):                       # (rows, c) -> (rows, 1) via MXU
        return jax.lax.dot_general(x, ones_c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def layernorm(h, g, b, eps=1e-6):
        if 'noln' in _ablate:
            return h.astype(jnp.float32) * g + b
        h32 = h.astype(jnp.float32)
        mean = rowsum(h32) * (1.0 / c)
        zc = h32 - mean
        var = rowsum(zc * zc) * (1.0 / c)
        return (zc * jax.lax.rsqrt(var + eps)) * g + b

    def dot(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    if frame_major:
        x = x_ref[0]                                     # (f, P, c), kept fm
        g_in = jnp.swapaxes(g_ref[0], 0, 1).reshape(rows, c)
    else:
        x = x_ref[:]
        g_in = g_ref[:]
    x32 = x.astype(jnp.float32)

    win, bin_ = take(2)
    h = dot(g_in, win[:]) + bin_[:]                      # proj_in (fp32)
    pe = jnp.concatenate([pe_ref[:]] * n_tiles, axis=0).astype(jnp.float32)

    for _ in range(n_blocks):
        for _j in (0, 1):
            ln_g, ln_b, wq, wk, wv, wo, bo = take(7)
            a_in = (layernorm(h, ln_g[:], ln_b[:]) + pe).astype(x.dtype)
            # fold the softmax scale into q: one (rows, c) multiply here
            # replaces a multiply over the whole (rpt, tiles*heads*rpt)
            # logit scratch in the exp pass below
            q = (dot(a_in, wq[:]) * scale).astype(x.dtype)
            k = dot(a_in, wk[:]).astype(x.dtype)
            v = dot(a_in, wv[:]).astype(x.dtype)
            kT = jnp.swapaxes(k, 0, 1)
            for t in range(n_tiles):
                sl = slice(t * rpt, (t + 1) * rpt)
                for hh in range(heads):
                    lane = slice(hh * d, (hh + 1) * d)
                    col = (t * heads + hh) * rpt
                    s_scr[:, col:col + rpt] = jax.lax.dot_general(
                        q[sl, lane], kT[lane, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            if 'noexp' in _ablate:
                s_scr[:] = jnp.maximum(s_scr[:] + big_bias, 0.0)
            else:
                s_scr[:] = jnp.exp(jnp.minimum(s_scr[:] + big_bias, CLIP))
            attn_rows = []
            for t in range(n_tiles):
                sl = slice(t * rpt, (t + 1) * rpt)
                outs = []
                for hh in range(heads):
                    lane = slice(hh * d, (hh + 1) * d)
                    col = (t * heads + hh) * rpt
                    e = s_scr[:, col:col + rpt]
                    eb = e.astype(x.dtype)
                    denom = jax.lax.dot_general(
                        e, ones_r, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pv = jax.lax.dot_general(
                        eb, v[sl, lane], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    outs.append(pv * (1.0 / denom))
                attn_rows.append(jnp.concatenate(outs, axis=-1))
            attn = jnp.concatenate(attn_rows, axis=0).astype(x.dtype)
            h = h + dot(attn, wo[:]) + bo[:]

        if include_ffn:
            fn_g, fn_b, w1, b1, w2, b2 = take(6)
            ln = layernorm(h, fn_g[:], fn_b[:]).astype(x.dtype)
            hh_ = dot(ln, w1[:]) + b1[:]
            mid = hh_.shape[-1] // 2
            if 'nogelu' in _ablate:
                g = hh_[:, :mid] * jnp.maximum(hh_[:, mid:], 0.0)
            else:
                g = hh_[:, :mid] * gelu_fast(hh_[:, mid:])
            h = h + dot(g.astype(x.dtype), w2[:]) + b2[:]

    if include_ffn:
        wout, bout = take(2)
        out = dot(h.astype(x.dtype), wout[:]) + bout[:]
        if frame_major:
            out_fm = jnp.swapaxes(out.reshape(p_loc, f, c), 0, 1)
            o_ref[0] = (x32 + out_fm).astype(o_ref.dtype)
        else:
            o_ref[:] = (x32 + out).astype(o_ref.dtype)
    else:
        # FFN + proj_out run outside (weights would not fit VMEM at
        # C>=640); emit h for the XLA/geglu continuation
        if frame_major:
            o_ref[0] = jnp.swapaxes(
                h.reshape(p_loc, f, c), 0, 1).astype(o_ref.dtype)
        else:
            o_ref[:] = h.astype(o_ref.dtype)


# --------------------------------------------------------- host wrapper
def _block_rows(c: int, itemsize: int, rpt: int) -> int:
    """Rows per grid step: VMEM-budgeted, always a multiple of the rpt
    attention tile (a non-multiple would leave tail rows unattended)."""
    budget = (3 << 20) // (8 * c * itemsize)
    return max(rpt, min(512, budget) // rpt * rpt)


def _pe_rows(f: int, c: int, rpt: int, max_len: int) -> np.ndarray:
    from videoswap_tpu.models.motion_module import sinusoidal_position_table
    pe = sinusoidal_position_table(max_len, c)[:f]       # (f, c)
    return np.tile(pe, (rpt // f, 1))                    # rows (loc, frame)


def _forward(g2, x2, pe_rows, flat_params, *, heads, f, n_blocks,
             include_ffn=True, interpret=False):
    n, c = x2.shape
    d = c // heads
    rpt = max(1, 128 // f) * f
    block_rows = _block_rows(c, x2.dtype.itemsize, rpt)
    npad = (n + block_rows - 1) // block_rows * block_rows
    if npad != n:
        g2 = jnp.pad(g2, ((0, npad - n), (0, 0)))
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))
    n_tiles = block_rows // rpt

    w_specs = [pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd)
               for p in flat_params]
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, f=f, n_blocks=n_blocks,
                          scale=d ** -0.5, rpt=rpt,
                          include_ffn=include_ffn),
        grid=(npad // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                  pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
                  pl.BlockSpec(pe_rows.shape, lambda i: (0, 0))] + w_specs,
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, c), x2.dtype),
        scratch_shapes=[pltpu.VMEM((rpt, n_tiles * heads * rpt),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(g2, x2, pe_rows, *flat_params)
    return out[:n]


def _forward_4d(g4, x4, pe_rows, flat_params, *, heads, f, n_blocks,
                include_ffn=True, interpret=False):
    """Frame-major entry: g4/x4 are (B, F, HW, C) — the model's natural
    layout. Blocks DMA (1, F, P, C) slabs; the (loc, frame) row order the
    attention tiling needs is produced by an in-VMEM relayout instead of
    XLA-side HBM transposes of the whole tensor."""
    b, fdim, hw, c = x4.shape
    assert fdim == f
    d = c // heads
    rpt = max(1, 128 // f) * f
    block_rows = _block_rows(c, x4.dtype.itemsize, rpt)
    p_loc = block_rows // f
    hwp = (hw + p_loc - 1) // p_loc * p_loc
    if hwp != hw:
        g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, hwp - hw), (0, 0)))
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, hwp - hw), (0, 0)))
    n_tiles = block_rows // rpt

    w_specs = [pl.BlockSpec(p.shape, lambda i, j, nd=p.ndim: (0,) * nd)
               for p in flat_params]
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, f=f, n_blocks=n_blocks,
                          scale=d ** -0.5, rpt=rpt,
                          include_ffn=include_ffn, frame_major=True),
        grid=(b, hwp // p_loc),
        in_specs=[pl.BlockSpec((1, f, p_loc, c), lambda i, j: (i, 0, j, 0)),
                  pl.BlockSpec((1, f, p_loc, c), lambda i, j: (i, 0, j, 0)),
                  pl.BlockSpec(pe_rows.shape, lambda i, j: (0, 0))] + w_specs,
        out_specs=pl.BlockSpec((1, f, p_loc, c), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, hwp, c), x4.dtype),
        scratch_shapes=[pltpu.VMEM((rpt, n_tiles * heads * rpt),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=interpret,
    )(g4, x4, pe_rows, *flat_params)
    return out[:, :, :hw]


def _rows_of(a4):
    b, f, hw, c = a4.shape
    return a4.transpose(0, 2, 1, 3).reshape(b * hw * f, c)


def _unrows(a2, b, f, hw):
    c = a2.shape[-1]
    return a2.reshape(b, hw, f, c).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_temporal_transformer_bfhw(g4, x4, pe_rows, flat_params,
                                    heads: int, f: int, n_blocks: int,
                                    include_ffn: bool = True):
    """Frame-major fused temporal transformer: g4 (per-frame-GroupNormed)
    and x4 (residual) in the model's natural (B, F, HW, C) layout — no
    host-side transposes. Returns (B, F, HW, C)."""
    if jax.default_backend() != 'tpu':
        b, f_, hw, c = x4.shape
        out2 = _xla_reference(_rows_of(g4), _rows_of(x4), pe_rows,
                              flat_params, heads, f, n_blocks, include_ffn)
        return _unrows(out2, b, f, hw)
    return _forward_4d(g4, x4, jnp.asarray(pe_rows, x4.dtype),
                       list(flat_params), heads=heads, f=f,
                       n_blocks=n_blocks, include_ffn=include_ffn)


def _fwd_bfhw(g4, x4, pe_rows, flat_params, heads, f, n_blocks,
              include_ffn):
    out = fused_temporal_transformer_bfhw(g4, x4, pe_rows, flat_params,
                                          heads, f, n_blocks, include_ffn)
    return out, (g4, x4, pe_rows, flat_params)


def _bwd_bfhw(heads, f, n_blocks, include_ffn, res, g):
    g4, x4, pe_rows, flat_params = res
    b, f_, hw, c = x4.shape

    def ref(g4, x4, fp):
        return _unrows(_xla_reference(_rows_of(g4), _rows_of(x4), pe_rows,
                                      fp, heads, f, n_blocks, include_ffn),
                       b, f, hw)

    _, vjp = jax.vjp(ref, g4, x4, tuple(flat_params))
    dg, dx, dfp = vjp(g)
    return dg, dx, None, list(dfp)


fused_temporal_transformer_bfhw.defvjp(_fwd_bfhw, _bwd_bfhw)


def _xla_reference(g2, x2, pe_rows, flat_params, heads, f, n_blocks,
                   include_ffn=True):
    """Same math in plain XLA (CPU fallback, VJP, parity tests)."""
    n, c = x2.shape
    d = c // heads
    ps = list(flat_params)

    def take(k):
        vals = ps[:k]
        del ps[:k]
        return vals

    def ln(h, g, b, eps=1e-6):
        h32 = h.astype(jnp.float32)
        mu = h32.mean(-1, keepdims=True)
        var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
        return (h32 - mu) * jax.lax.rsqrt(var + eps) * g + b

    x32 = x2.astype(jnp.float32)
    win, bin_ = take(2)
    h = g2 @ win + bin_
    pe = jnp.tile(pe_rows[:f].astype(jnp.float32), (n // f, 1))

    for _ in range(n_blocks):
        for _j in (0, 1):
            ln_g, ln_b, wq, wk, wv, wo, bo = take(7)
            a_in = (ln(h, ln_g, ln_b) + pe).astype(x2.dtype)
            q = (a_in @ wq).reshape(n // f, f, heads, d)
            k = (a_in @ wk).reshape(n // f, f, heads, d)
            v = (a_in @ wv).reshape(n // f, f, heads, d)
            s = jnp.einsum('lfhd,lghd->lfgh', q.astype(jnp.float32),
                           k.astype(jnp.float32)) * d ** -0.5
            p = jax.nn.softmax(s, axis=2)
            o = jnp.einsum('lfgh,lghd->lfhd', p.astype(x2.dtype),
                           v).reshape(n, c)
            h = h + o @ wo + bo
        if include_ffn:
            fn_g, fn_b, w1, b1, w2, b2 = take(6)
            l_ = ln(h, fn_g, fn_b).astype(x2.dtype)
            hh_ = l_ @ w1 + b1
            a, gate = jnp.split(hh_, 2, axis=-1)
            from .geglu_ffn import gelu_fast as _gf
            g = a * _gf(gate.astype(jnp.float32))
            h = h + g.astype(x2.dtype) @ w2 + b2

    if not include_ffn:
        return h.astype(x2.dtype)
    wout, bout = take(2)
    return (x32 + (h.astype(x2.dtype) @ wout + bout)).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_temporal_transformer(g2, x2, pe_rows, flat_params, heads: int,
                               f: int, n_blocks: int,
                               include_ffn: bool = True):
    """g2: per-frame-GroupNormed input; x2: residual input — both
    (L*F, C), rows ordered (location, frame). proj_in -> blocks ->
    proj_out, + x2 residual. With include_ffn=False, returns the hidden
    state after the attention blocks (FFN/proj_out run outside)."""
    if jax.default_backend() != 'tpu':
        return _xla_reference(g2, x2, pe_rows, flat_params, heads, f,
                              n_blocks, include_ffn)
    return _forward(g2, x2, jnp.asarray(pe_rows, x2.dtype),
                    list(flat_params), heads=heads, f=f, n_blocks=n_blocks,
                    include_ffn=include_ffn)


def _fwd(g2, x2, pe_rows, flat_params, heads, f, n_blocks, include_ffn):
    out = fused_temporal_transformer(g2, x2, pe_rows, flat_params, heads,
                                     f, n_blocks, include_ffn)
    return out, (g2, x2, pe_rows, flat_params)


def _bwd(heads, f, n_blocks, include_ffn, res, g):
    g2, x2, pe_rows, flat_params = res
    _, vjp = jax.vjp(
        lambda g2, x2, fp: _xla_reference(g2, x2, pe_rows, fp, heads, f,
                                          n_blocks, include_ffn),
        g2, x2, tuple(flat_params))
    dg, dx, dfp = vjp(g)
    return dg, dx, None, list(dfp)


fused_temporal_transformer.defvjp(_fwd, _bwd)


def ffn_tail(h2, x2, tt_params, dtype):
    """ff_norm -> GEGLU FFN (fused kernel) -> residual -> proj_out ->
    + outer residual — the continuation after an include_ffn=False kernel
    (n_blocks == 1). Plain jnp + geglu_ffn, so autodiff just works."""
    from .geglu_ffn import geglu_ffn
    blk = tt_params['transformer_blocks_0']
    h32 = h2.astype(jnp.float32)
    mu = h32.mean(-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
    l_ = ((h32 - mu) * jax.lax.rsqrt(var + 1e-6)
          * blk['ff_norm']['scale'] + blk['ff_norm']['bias']).astype(dtype)
    ffn = geglu_ffn(l_,
                    blk['ff']['net_0_proj']['kernel'].astype(dtype),
                    blk['ff']['net_0_proj']['bias'].astype(jnp.float32),
                    blk['ff']['net_2']['kernel'].astype(dtype),
                    blk['ff']['net_2']['bias'].astype(jnp.float32))
    h2 = h2 + ffn.astype(h2.dtype)
    out = (h2.astype(dtype) @ tt_params['proj_out']['kernel'].astype(dtype)
           + tt_params['proj_out']['bias'].astype(jnp.float32))
    return (x2.astype(jnp.float32) + out).astype(x2.dtype)
