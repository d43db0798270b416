"""Pallas TPU flash attention.

TPU-native replacement for the reference's xformers
`memory_efficient_attention` (used for all spatial attention sites with
>= 32^2 query tokens, /root/reference/videoswap/utils/p2p_utils/
attention_register.py:66-67). Non-causal, no mask in the hot path (SD
spatial/cross/temporal attention never uses one); KV-length masking handles
sequence padding.

Online-softmax tiling: grid (batch*heads, q_blocks, k_blocks), running
max/denominator in VMEM scratch, fp32 accumulation, output written on the
last k block. Head dim is zero-padded to a lane multiple (128) by the
wrapper; zero columns do not perturb q.k^T, and the padded value columns are
cropped after the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, block_k: int, scale: float):
    kv_blocks = pl.num_programs(2)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # [bq, d]
    k = k_ref[0]                      # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [bq, bk]

    # mask out KV padding in the last block
    kv_len = kv_len_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]                                  # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                             # [bq, bk]
    alpha = jnp.exp(m_prev - m_new)                    # [bq, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [bq, d]
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kb == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=('block_q', 'block_k'))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 512, block_k: int = 512) -> jnp.ndarray:
    """q: [B, Sq, H, D], k/v: [B, Sk, H, D] -> [B, Sq, H, D]."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    d_p = _round_up(d, 128)

    def prep(x, s_p):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        return jnp.pad(x, ((0, 0), (0, s_p - x.shape[1]), (0, d_p - d)))

    qp, kp, vp = prep(q, sq_p), prep(k, sk_p), prep(v, sk_p)
    kv_len = jnp.asarray([sk], dtype=jnp.int32)

    grid = (b * h, sq_p // block_q, sk_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_p),
                             lambda bh, i, j, *_: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d_p),
                             lambda bh, i, j, *_: (bh, j, 0)),
                pl.BlockSpec((1, block_k, d_p),
                             lambda bh, i, j, *_: (bh, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_p),
                                   lambda bh, i, j, *_: (bh, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d_p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(kv_len, qp, kp, vp)

    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
