"""Attention primitives.

Two execution paths, mirroring the reference's split between xformers
(fused, >=32^2 tokens) and explicit-probability attention (controllable,
<32^2 tokens) — see /root/reference/videoswap/utils/p2p_utils/
attention_register.py:66-76:

- `dot_product_attention`: fused path. On TPU this lowers to the Pallas
  flash-attention kernel (videoswap_tpu.ops.flash_attention) for long
  sequences; otherwise XLA fuses the einsum/softmax chain.
- `attention_with_probs`: materializes the (heads, q, k) probabilities so a
  prompt-to-prompt controller can record or rewrite them. Only used at
  sites whose query length is below the control threshold, so the
  materialized tensor stays small.

Shapes are (batch, seq, heads, head_dim) throughout ("BSND"), the layout
XLA prefers on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def _xla_attention(qh, kh, vh):
    scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, vh)


def _chunked_attention(qh, kh, vh, chunk: int = 512):
    """Memory-bounded differentiable attention: scan over query chunks,
    full softmax per chunk (Rabe & Staats style). The training-path
    replacement for xformers' memory_efficient_attention — autodiff through
    the scan rematerializes per chunk, so peak memory is
    O(chunk * Sk * heads) instead of O(Sq * Sk * heads)."""
    b, sq, h, d = qh.shape
    if sq % chunk != 0:
        return _xla_attention(qh, kh, vh)
    qc = qh.reshape(b, sq // chunk, chunk, h, d).transpose(1, 0, 2, 3, 4)

    # checkpoint the body: otherwise autodiff-of-scan saves EVERY chunk's
    # probability tensor as residuals (at 512^2 that is ~12 GB and OOMs a
    # 16 GB chip); rematting recomputes each chunk's probs in the backward.
    attn = jax.checkpoint(_xla_attention)

    def body(_, qblk):
        return None, attn(qblk, kh, vh)

    _, out = jax.lax.scan(body, None, qc)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)


def _small_seq_attention(q, k, v, heads: int):
    """Tiny-sequence self-attention (the temporal/motion F<=24 axis):
    the fused Pallas kernel (ops/temporal_attention.py) — measured 0.66 ms
    vs 5.0 ms for the best XLA formulation at L=8192, F=16, C=320 on v5e
    (per-location matmuls waste the MXU; a (L,F,F,heads) logit tensor puts
    heads in the lanes and wastes the VPU). Falls back to equivalent XLA
    math off-TPU (inside the kernel wrapper). q/k/v: (L, F, C) unsplit."""
    from .temporal_attention import temporal_attention
    el, f, c = q.shape
    out = temporal_attention(q.reshape(el * f, c), k.reshape(el * f, c),
                             v.reshape(el * f, c), heads, f)
    return out.reshape(el, f, c)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          heads: int, use_flash: bool | None = None,
                          impl: str = 'auto') -> jnp.ndarray:
    """Fused multi-head attention. q: [B,Sq,D], k/v: [B,Sk,D] -> [B,Sq,D].

    impl routing (measured on v5e at SD-1.5 shapes, see CLAUDE.md):
    - 'auto': tiny sequences (<=32, the temporal axis) -> fused Pallas
      temporal-attention kernel (0.66 ms vs 5.0 ms XLA at level-0);
      everything else -> XLA einsum+softmax (which is probs-bandwidth-
      bound but still beats the d-padded flash kernel at head_dim 40);
    - 'flash': the Pallas flash kernel for spatial sites (memory-bound
      cases, training under remat; differentiable via custom VJP; 25%
      faster train step than 'chunked' at 512^2 — pipelines/trainer.py);
      tiny temporal sequences keep the fused temporal kernel;
    - 'chunked': scan over query blocks (memory-bounded but serial);
    - 'xla': plain einsum+softmax.
    """
    sq, sk = q.shape[1], k.shape[1]
    if sq == sk and sq <= 32 and use_flash is not True:
        # the fused temporal kernel beats both XLA and the d/seq-padded
        # flash kernel on the tiny frame axis (16 -> 128 padding wastes
        # 8x per block), so 'flash' keeps it too; use_flash=True is the
        # explicit kernel-test override.
        return _small_seq_attention(q, k, v, heads)
    big = sq >= 2048 and sk >= 2048
    # >=32^2-token self-attention sites (the reference's xformers path,
    # attention_register.py:66) deliberately stay on XLA: the fused
    # max-free Pallas kernel (ops/spatial_attention.py) measures 14.5 ms
    # vs XLA's 13.9 at SD level-0 shapes — see its docstring for the
    # beat-count analysis of why a monolithic kernel cannot win here.
    qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
    if impl == 'flash' or use_flash is True:
        from .flash_attention import flash_attention
        out = flash_attention(qh, kh, vh)
    elif impl == 'chunked' and big:
        out = _chunked_attention(qh, kh, vh)
    else:
        out = _xla_attention(qh, kh, vh)
    return _merge_heads(out)


def attention_with_probs(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    edit_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Attention that exposes probabilities for store/edit controllers.

    Returns (out [B,Sq,D], probs [B,heads,Sq,Sk]) where `probs` are the
    PRE-edit probabilities (the reference controller stores before
    rewriting, attention_util.py:82-84). `edit_fn`, when given, rewrites
    the probabilities used for the value contraction (the functional
    replacement for the reference's AttnControlProcessor `controller(...)`
    call, attention_register.py:150-156).
    """
    qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
    scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    used = edit_fn(probs) if edit_fn is not None else probs
    out = jnp.einsum('bhqk,bkhd->bqhd', used.astype(v.dtype), vh)
    return _merge_heads(out), probs
