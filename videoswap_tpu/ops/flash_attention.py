"""Pallas TPU flash attention with a custom VJP.

TPU-native replacement for the reference's xformers
`memory_efficient_attention` (used for all spatial attention sites with
>= 32^2 query tokens, /root/reference/videoswap/utils/p2p_utils/
attention_register.py:66-67, and for training at high resolution).
Non-causal, no mask in the hot path (SD spatial/cross/temporal attention
never uses one); KV-length masking handles sequence padding.

Forward: online-softmax tiling — grid (batch*heads, q_blocks, k_blocks),
running max/denominator in VMEM scratch, fp32 accumulation, out + row
logsumexp written on the last k block.

Backward (standard flash decomposition, two kernels):
  D  = rowsum(dout * out)                      (fused by XLA outside)
  p  = exp(q k^T * scale - lse)
  dv = p^T dout ;  dp = dout v^T ;  ds = p (dp - D)
  dq = ds k * scale  (grid over q blocks, loop k)
  dk = ds^T q * scale (grid over k blocks, loop q)
Zero-padded dout/D rows and masked KV columns make the padding contribute
exactly zero. lse/D are lane-replicated to (.., 128) to satisfy TPU block
tiling.

Head dim is zero-padded to a lane multiple (128) by the wrapper; zero
columns do not perturb q.k^T, and padded value columns are cropped after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
POS_INF = 1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------- forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, block_k: int, scale: float,
                kv_len: int):
    kv_blocks = pl.num_programs(2)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kb == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # lane-replicated: TPU blocks need a 128-divisible minor dim
        lse_ref[0] = jnp.broadcast_to(m_ref[:] + jnp.log(l_ref[:]),
                                      (m_ref.shape[0], 128))


def _fwd_core(qp, kp, vp, *, scale, block_q, block_k, kv_len):
    bh, sq_p, d_p = qp.shape
    sk_p = kp.shape[1]
    grid = (bh, sq_p // block_q, sk_p // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale,
                          kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_p), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, i, j: (bh, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_p, d_p), qp.dtype),
            jax.ShapeDtypeStruct((bh, sq_p, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(qp, kp, vp)
    return out, lse


# -------------------------------------------------------------- backward
def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
                   acc_ref, *, block_k: int, scale: float, kv_len: int):
    kv_blocks = pl.num_programs(2)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    p = jnp.where(col < kv_len, jnp.exp(s - lse_ref[0][:, 0:1]), 0.0)
    dp = jax.lax.dot_general(
        do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dd_ref[0][:, 0:1])
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(jnp.float32), k.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(kb == kv_blocks - 1)
    def _fin():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, block_k: int,
                    scale: float, kv_len: int):
    q_blocks = pl.num_programs(2)
    qb = pl.program_id(2)
    jb = pl.program_id(1)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jb * block_k
    p = jnp.where(col < kv_len, jnp.exp(s - lse_ref[0][:, 0:1]), 0.0)
    do = do_ref[0].astype(jnp.float32)
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dd_ref[0][:, 0:1])
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(qb == q_blocks - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_core(res, g, *, scale, block_q, block_k, kv_len):
    qp, kp, vp, out, lse = res
    bh, sq_p, d_p = qp.shape
    sk_p = kp.shape[1]
    do = g
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)                # (BH, Sq_p, 1)
    dd = jnp.broadcast_to(dd, dd.shape[:2] + (128,))    # lane-replicated

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale,
                          kv_len=kv_len),
        grid=(bh, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d_p), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d_p), qp.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(qp, kp, vp, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_k=block_k, scale=scale,
                          kv_len=kv_len),
        grid=(bh, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d_p), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_p), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk_p, d_p), kp.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d_p), vp.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, d_p), jnp.float32),
                        pltpu.VMEM((block_k, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(qp, kp, vp, do, lse, dd)
    return dq, dk, dv


# ------------------------------------------------------------ custom VJP
# The custom-VJP boundary sits on UNPADDED (BH, S, D) tensors: padding to
# TPU block shapes happens inside fwd/bwd. This keeps the VJP residuals —
# which become per-site HBM under gradient checkpointing with the
# 'save_flash' policy (unet3d._maybe_remat) — at their logical size:
# out (BH, Sq, D) instead of the lane-padded (BH, Sq_p, 128-rounded D),
# lse (BH, Sq) instead of its 128-lane-replicated kernel layout (a 3-128x
# difference at head_dim 40).


def _pad3(x, s_p, d_p):
    return jnp.pad(x, ((0, 0), (0, s_p - x.shape[1]),
                       (0, d_p - x.shape[2])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q3, k3, v3, block_q, block_k):
    out, _ = _flash_fwd_padded(q3, k3, v3, block_q, block_k)
    return out


def _flash_fwd_padded(q3, k3, v3, block_q, block_k):
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    d_p = _round_up(d, 128)
    out, lse = _fwd_core(
        _pad3(q3, sq_p, d_p), _pad3(k3, sk_p, d_p), _pad3(v3, sk_p, d_p),
        scale=d ** -0.5, block_q=block_q, block_k=block_k, kv_len=sk)
    return out[:, :sq, :d], lse[:, :sq, 0]


def _flash_fwd(q3, k3, v3, block_q, block_k):
    out, lse = _flash_fwd_padded(q3, k3, v3, block_q, block_k)
    # Residual tags for selective rematerialization: under
    # `nn.remat(..., policy=save_only_these_names('flash_out','flash_lse'))`
    # (unet3d gradient_checkpointing='save_flash') the bwd reuses the saved
    # out+lse — exactly what the bwd kernels consume — instead of re-running
    # the forward kernel; q/k/v stay rematerialized from the (cheap) dense
    # projections. The tags are identity ops under any other policy.
    from jax.ad_checkpoint import checkpoint_name
    return out, (q3, k3, v3, checkpoint_name(out, 'flash_out'),
                 checkpoint_name(lse, 'flash_lse'))


def _flash_bwd(block_q, block_k, res, g):
    q3, k3, v3, out, lse = res
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    d_p = _round_up(d, 128)
    # padded q rows: lse=+inf => p = exp(s - inf) = 0, so they contribute
    # exactly zero to dk/dv (their dout rows are zero-padded anyway)
    lse_p = jnp.pad(lse, ((0, 0), (0, sq_p - sq)),
                    constant_values=POS_INF)
    lse_p = jnp.broadcast_to(lse_p[:, :, None], (bh, sq_p, 128))
    res_p = (_pad3(q3, sq_p, d_p), _pad3(k3, sk_p, d_p),
             _pad3(v3, sk_p, d_p), _pad3(out, sq_p, d_p), lse_p)
    dq, dk, dv = _bwd_core(res_p, _pad3(g, sq_p, d_p), scale=d ** -0.5,
                           block_q=block_q, block_k=block_k, kv_len=sk)
    return dq[:, :sq, :d], dk[:, :sk, :d], dv[:, :sk, :d]


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 512, block_k: int = 512) -> jnp.ndarray:
    """q: [B, Sq, H, D], k/v: [B, Sk, H, D] -> [B, Sq, H, D].
    Differentiable (custom VJP with Pallas backward kernels).

    Deliberately NOT jit-wrapped: a nested pjit would hide the
    checkpoint_name residual tags from an enclosing nn.remat policy
    (save_only_these_names cannot see inside inner jit calls — verified
    by jaxpr pallas-call counts), and every caller already sits under a
    larger jit."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5

    if jax.default_backend() != 'tpu':
        # plain-XLA statement of the same math (CPU fallback, same
        # pattern as ops/temporal_attention.py): natively differentiable,
        # so CPU tests and the virtual-mesh dryrun exercise the 'flash'
        # routing without the TPU kernel.
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v)
        # same residual tag as the TPU path so the 'save_flash' remat
        # policy compiles identically on CPU tests / the multichip dryrun
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(out, 'flash_out')

    del scale  # folded into the VJP core (derived from the static d)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    def heads_to_batch(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

    out = _flash(heads_to_batch(q), heads_to_batch(k), heads_to_batch(v),
                 block_q, block_k)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))
