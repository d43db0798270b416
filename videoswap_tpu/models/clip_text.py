"""CLIP text encoder (ViT-L/14 text tower used by SD-1.5) in flax.

Parity target: the `CLIPTextModel` the reference loads from its local
checkpoint dir (reference train.py:49-55). 12 layers, width 768, 12 heads,
quick-gelu, causal mask, final LayerNorm; the pipeline consumes
`last_hidden_state` ([B, 77, 768]).

Parameter naming mirrors the transformers key layout
(text_model.encoder.layers.N.self_attn.q_proj ...) for mechanical
conversion. The token embedding is a standalone matrix so ED-LoRA concept
tokens can extend it functionally (new rows appended to the table) instead
of resizing a torch module in place.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp


class CLIPTextConfig(NamedTuple):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """Shared by the text tower and the vision tower
    (models/clip_vision.py): `cfg` is any config NamedTuple with
    hidden_size/num_heads/intermediate_size/layer_norm_eps;
    causal_mask=None means bidirectional (vision)."""
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask=None):
        cfg = self.cfg
        d = cfg.hidden_size
        h = cfg.num_heads
        dh = d // h
        q = nn.Dense(d, dtype=self.dtype, name='q_proj')(x) * dh ** -0.5
        k = nn.Dense(d, dtype=self.dtype, name='k_proj')(x)
        v = nn.Dense(d, dtype=self.dtype, name='v_proj')(x)
        b, s, _ = x.shape
        q, k, v = (t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        if causal_mask is not None:
            logits = jnp.where(causal_mask, logits, -1e9)
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name='out_proj')(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask=None):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm1')(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype,
                              name='self_attn')(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='layer_norm2')(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name='mlp_fc1')(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name='mlp_fc2')(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 extra_token_embeds: jnp.ndarray | None = None):
        """input_ids: [B, S] -> last_hidden_state [B, S, hidden].

        `extra_token_embeds` ([N, hidden]) extends the vocabulary at runtime
        (ED-LoRA concept tokens with ids >= vocab_size).
        """
        cfg = self.cfg
        table = self.param(
            'token_embedding',
            nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size))
        if extra_token_embeds is not None:
            table = jnp.concatenate(
                [table, extra_token_embeds.astype(table.dtype)], axis=0)
        pos_table = self.param(
            'position_embedding',
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size))

        s = input_ids.shape[1]
        x = table[input_ids].astype(self.dtype) + pos_table[None, :s].astype(
            self.dtype)
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype,
                                 name=f'layers_{i}')(x, causal)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name='final_layer_norm')(x)
