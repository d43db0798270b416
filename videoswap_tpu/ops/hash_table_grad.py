"""Hash-grid table-gradient as MXU matmuls — Pallas TPU kernel.

The backward of a multiresolution hash encoding is a scatter-add of
R = points x 4 corners weighted cotangent rows into the level's feature
table. TPU scatter-add is serialization-bound at ~42-44 ns/row no matter
how it is phrased (one big scatter, segment_sum, sorted segment_sum all
tie — measured round 2, scripts/bench_atlas_parts.py), which made the
atlas train step 60% scatter (~165 ms of ~250-275 ms).

This kernel replaces the scatter with dense MXU work via a two-level
index decomposition: with idx = hi * LO + lo (LO = 512),

    d_table[hi*LO+lo, f] = sum_i [hi_i == hi] * ([lo_i == lo] * val[i, f])
                         = (HT @ Wv_f^T)[hi, lo]

where HT[m, i] = one_hot(hi_i)[m] and Wv_f[l, i] = one_hot(lo_i)[l] *
val[i, f] are formed on the fly in VMEM (both are lane-natural layouts:
hi/lo/val ride the lane dimension) and contracted with NT dot_generals.
MAC count is exactly table_entries x R x F — no one-hot padding waste —
so a hashed level (2^19 entries, 240k rows) costs ~250 GMAC where the
scatter costs 10 ms of serial row updates. fp32 values are split into
two bf16 operands (one-hot entries are exact in bf16), giving fp32-grade
results at the bf16 MXU rate.

Replaces the fused CUDA hash-grid backward the reference gets from
tinycudann (/root/reference/videoswap/atlas/implicit_neural_networks.py:
117-130, tcnn.Encoding 'HashGrid').

Rows with idx < 0 are dropped (used for block padding).

Measured (v5e, 240k rows, scripts/bench_hash_grad.py):
  G=289      kernel 0.20 ms   scatter  1.46 ms
  G=82944    kernel 1.39 ms   scatter  3.61 ms
  G=299209   kernel 3.38 ms   scatter 10.41 ms
  G=524288   kernel 5.31 ms   scatter 11.07 ms   (predicted MXU floor 5.1)
maxerr vs fp32 scatter <= 2.6e-5 across sizes. bf16x2=False lowers the
dots as DEFAULT-precision fp32, which Mosaic executes as ONE bf16 pass —
2x faster again (2.67 ms at G=2^19) but maxerr 1.6e-3; the split keeps
fp32-grade grads at the bf16 MXU rate, so it stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 512          # low-index width: output tile columns per feature
LO_BITS = 9
BK = 1024         # rows per grid step


def _kernel(idx_ref, val_ref, out_ref, *, m_tiles: int, bm: int, nf: int,
            k_chunks: int, bf16x2: bool):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                       # [BK] int32 (lanes)
    hi = idx >> LO_BITS                    # padding rows (-1) -> hi = -1
    lo = idx & (LO - 1)

    # one_hot(lo) over sublanes: [LO, BK]; lo broadcasts along sublanes.
    # NOTE: select formed as compare -> astype -> multiply; an i1 mask
    # feeding a bf16 `where` trips a Mosaic relayout error ((8,128) i1
    # tiling vs the (16,128) bf16 tiling — probed on v5e).
    lo_ids = jax.lax.broadcasted_iota(jnp.int32, (LO, idx.shape[0]), 0)
    cdtype = jnp.bfloat16 if bf16x2 else jnp.float32
    sel = (lo_ids == lo[None, :]).astype(cdtype)

    # Per feature, fold the row values into the lo-side one-hot. With
    # bf16x2 the fp32 value is split v = v_hi + v_lo into two bf16 parts
    # (exact split: bf16 shares fp32's exponent range); one-hot entries
    # are exact in bf16, so each product is exact and only the fp32
    # accumulation order differs from the scatter.
    rhs = []
    for f in range(nf):
        v = val_ref[f].astype(jnp.float32)          # [BK]
        if bf16x2:
            vh = v.astype(jnp.bfloat16)
            vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            rhs.append((sel * vh[None, :], sel * vl[None, :]))
        else:
            rhs.append((sel * v[None, :],))

    nt = (((1,), (1,)), ((), ()))
    for mt in range(m_tiles):
        mbase = mt * bm
        hi_ids = jax.lax.broadcasted_iota(
            jnp.int32, (bm, idx.shape[0]), 0) + mbase
        ht = (hi_ids == hi[None, :]).astype(cdtype)
        for f in range(nf):
            part = jax.lax.dot_general(
                ht, rhs[f][0], nt, preferred_element_type=jnp.float32)
            for extra in rhs[f][1:]:
                part += jax.lax.dot_general(
                    ht, extra, nt, preferred_element_type=jnp.float32)
            sl = (pl.ds(mbase, bm), pl.ds(f * LO, LO))
            out_ref[sl] += part


def hash_table_grad(idx: jnp.ndarray, val: jnp.ndarray, num_entries: int,
                    *, bf16x2: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Sum val rows into a [num_entries, F] table by idx (scatter-add).

    idx: [R] int32 in [0, num_entries); negative entries are dropped.
    val: [F, R] float32 (feature-major so row blocks are lane-natural).
    """
    nf, r = val.shape
    rpad = -(-r // BK) * BK
    if rpad != r:
        idx = jnp.pad(idx, (0, rpad - r), constant_values=-1)
        val = jnp.pad(val, ((0, 0), (0, rpad - r)))

    m = -(-num_entries // LO)
    bm = 128 if m >= 128 else -(-m // 8) * 8
    mpad = -(-m // bm) * bm

    out = pl.pallas_call(
        functools.partial(_kernel, m_tiles=mpad // bm, bm=bm, nf=nf,
                          k_chunks=rpad // BK, bf16x2=bf16x2),
        interpret=interpret,
        grid=(rpad // BK,),
        in_specs=[
            pl.BlockSpec((BK,), lambda k: (k,)),
            pl.BlockSpec((nf, BK), lambda k: (0, k)),
        ],
        out_specs=pl.BlockSpec((mpad, nf * LO), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((mpad, nf * LO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(idx, val)
    # [mpad, f*LO+l] -> [mpad, F, LO] -> [mpad*LO, F] -> [T, F]
    out = out.reshape(mpad, nf, LO).transpose(0, 2, 1)
    return out.reshape(mpad * LO, nf)[:num_entries]


def hash_table_grad_xla(idx: jnp.ndarray, val: jnp.ndarray,
                        num_entries: int) -> jnp.ndarray:
    """XLA scatter-add reference/fallback (negative idx rows dropped)."""
    return jnp.zeros((num_entries, val.shape[0]), jnp.float32).at[idx].add(
        val.T, mode='drop')
