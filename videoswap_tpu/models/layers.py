"""Shared flax building blocks for the SD-1.5 / AnimateDiff model family.

Module/parameter naming mirrors the diffusers checkpoint key structure
(`to_q`, `to_out_0`, `time_embedding.linear_1`, ...) so the torch->flax
converter (videoswap_tpu/models/converters.py) is a mechanical key rewrite.

Video activations are channels-last: (B, F, H, W, C).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from videoswap_tpu.ops import attention_with_probs, dot_product_attention


def timestep_sinusoidal(timesteps: jnp.ndarray, dim: int,
                        flip_sin_to_cos: bool = True,
                        freq_shift: float = 0.0,
                        max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep features, diffusers `Timesteps` semantics.

    timesteps: [B] int/float -> [B, dim] float32.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """two-layer SiLU MLP over sinusoidal features (diffusers naming)."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name='linear_1')(sample)
        sample = nn.silu(sample)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype,
                        name='linear_2')(sample)


class Attention(nn.Module):
    """Multi-head attention with the diffusers `Attention` parameter layout.

    to_q/to_k/to_v have no bias; to_out_0 has bias. Supports the functional
    attention-control tap: when `edit_fn` or `want_probs` is set, the
    probabilities are materialized (small sites only, by construction).
    """
    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    attn_impl: str = 'auto'   # 'auto' | 'chunked' | 'xla' (ops/attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 encoder_hidden_states: Optional[jnp.ndarray] = None,
                 edit_fn: Optional[Callable] = None,
                 want_probs: bool = False,
                 use_flash: bool | None = None):
        inner = self.heads * self.dim_head
        ctx = (hidden_states if encoder_hidden_states is None
               else encoder_hidden_states)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name='to_q')(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name='to_k')(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name='to_v')(ctx)

        probs = None
        if edit_fn is not None or want_probs:
            out, probs = attention_with_probs(q, k, v, self.heads,
                                              edit_fn=edit_fn)
        else:
            out = dot_product_attention(q, k, v, self.heads,
                                        use_flash=use_flash,
                                        impl=self.attn_impl)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name='to_out_0')(out)
        if want_probs:
            return out, probs
        return out


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense (same param names/inits) so a
    fused kernel can consume the weights directly."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return kernel, bias


class FeedForward(nn.Module):
    """GEGLU feed-forward, diffusers layout: net_0 (GEGLU proj), net_2.

    Runs through the fused Pallas kernel (ops/geglu_ffn.py) on TPU: the
    4x-wide GEGLU intermediate never round-trips HBM (XLA cannot fuse
    across the two matmuls — a 671 MB spill per call at SD level-0)."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from videoswap_tpu.ops.geglu_ffn import geglu_ffn
        inner = self.dim * self.mult
        c = x.shape[-1]
        w1, b1 = _DenseParams(inner * 2, name='net_0_proj')(c)
        w2, b2 = _DenseParams(self.dim, name='net_2')(inner)
        out = geglu_ffn(x.reshape(-1, c).astype(self.dtype),
                        w1.astype(self.dtype), b1.astype(self.dtype),
                        w2.astype(self.dtype), b2.astype(self.dtype))
        return out.reshape(*x.shape[:-1], self.dim)


class GroupNorm(nn.Module):
    """GroupNorm over the channel-last axis, fp32 statistics."""
    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                            dtype=self.dtype)(x)


def conv_over_frames(conv: nn.Module, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2D conv to a (B, F, H, W, C) video by folding frames into the
    batch — the reference's InflatedConv3d (resnet.py:9-18) as a reshape."""
    b, f, h, w, c = x.shape
    y = conv(x.reshape(b * f, h, w, c))
    return y.reshape(b, f, *y.shape[1:])
