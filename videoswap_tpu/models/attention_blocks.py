"""Spatial transformer applied per frame (Transformer3DModel equivalent).

Parity: /root/reference/videoswap/models/animatediff_models/attention.py —
frames fold into the batch (`b c f h w -> (b f) c h w`), text embeddings
repeat per frame, block = self-attn + cross-attn + GEGLU FFN. The shipped
configs disable `unet_use_cross_frame_attention` / `unet_use_temporal_attention`
(options/model_cfg/inference.yml), so those legacy paths are omitted.

ED-LoRA layer-wise embeddings: when `encoder_hidden_states` is 4-D
(B, L, 77, 768), each cross-attention layer selects its slice
`[:, cross_layer_idx]` (reference edlora_util.py:13-99 does this by
patching processors; here the layer index is static model structure).

Attention control: each attn site reports/edits its probabilities through
the threaded `AttnCtrl` (see videoswap_tpu/p2p/ctrl.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from videoswap_tpu.p2p import NO_CTRL, AttnCtrl, SiteKey

from .layers import Attention, FeedForward


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    place: str            # 'down' | 'mid' | 'up'
    attn_index: int       # per-place spatial-attention counter
    cross_layer_idx: int  # global cross-attn layer index (ED-LoRA slicing)
    attn_impl: str = 'auto'
    # CFG-prefix dedup: x enters as the single shared half (the CFG batch
    # halves are identical until text first enters at attn2) and is doubled
    # to [uncond; cond] right before the cross-attention. Exact math — the
    # controller can never touch this block's sites (its query length is
    # above the <32^2 control threshold whenever dedup is enabled).
    cfg_expand: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text: jnp.ndarray,
                 ctrl: AttnCtrl = NO_CTRL) -> jnp.ndarray:
        # x: [(B*F), S, dim]; text: [(B*F), 77, 768] or [(B*F), L, 77, 768]
        tokens = x.shape[1]
        site_self = SiteKey(self.place, 'self', self.attn_index)
        site_cross = SiteKey(self.place, 'cross', self.attn_index)

        attn1 = Attention(query_dim=self.dim, heads=self.heads,
                          dim_head=self.dim_head, dtype=self.dtype,
                          attn_impl=self.attn_impl, name='attn1')
        attn2 = Attention(query_dim=self.dim, heads=self.heads,
                          dim_head=self.dim_head,
                          cross_attention_dim=self.cross_attention_dim,
                          attn_impl=self.attn_impl,
                          dtype=self.dtype, name='attn2')

        if text.ndim == 4:
            text = text[:, self.cross_layer_idx]

        h = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        x = self._run_attn(attn1, h, None, site_self, tokens, ctrl) + x

        if self.cfg_expand:
            x = jnp.concatenate([x, x], axis=0)

        h = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        x = self._run_attn(attn2, h, text, site_cross, tokens, ctrl) + x

        h = nn.LayerNorm(dtype=self.dtype, name='norm3')(x)
        x = FeedForward(self.dim, dtype=self.dtype, name='ff')(h) + x
        return x

    def _run_attn(self, attn, h, context, site, tokens, ctrl):
        edit_fn = ctrl.get_edit_fn(site, tokens)
        want = ctrl.wants_store(site, tokens)
        if want:
            out, probs = attn(h, context, edit_fn=edit_fn, want_probs=True)
            self.sow('attn_store', site.name, probs,
                     reduce_fn=lambda prev, cur: cur)
        elif edit_fn is not None:
            out, _ = attn(h, context, edit_fn=edit_fn, want_probs=True)
        else:
            out = attn(h, context)
        return out


class Transformer3DModel(nn.Module):
    """GroupNorm -> 1x1-conv proj_in -> blocks -> 1x1-conv proj_out, +res."""
    heads: int
    dim_head: int
    cross_attention_dim: int
    num_layers: int
    place: str
    attn_index: int
    cross_layer_idx: int
    norm_groups: int = 32
    attn_impl: str = 'auto'
    cfg_expand: bool = False  # see BasicTransformerBlock.cfg_expand
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text: jnp.ndarray,
                 ctrl: AttnCtrl = NO_CTRL) -> jnp.ndarray:
        # x: (B, F, H, W, C); text: (B, 77, 768) / (B, L, 77, 768)
        # with cfg_expand, x is the shared CFG half (B=1) while text carries
        # both halves (B=2); the first block doubles x at its cross-attn
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        residual = x

        x = x.reshape(b * f, hh, ww, c)
        text = jnp.repeat(text, f, axis=0)  # per-frame text

        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm')(x)
        # SD-1.5 uses conv (use_linear_projection=False); a 1x1 conv on
        # channels-last is a Dense over C — keep conv naming for conversion.
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name='proj_in')(x)
        x = x.reshape(b * f, hh * ww, inner)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                place=self.place, attn_index=self.attn_index + i,
                cross_layer_idx=self.cross_layer_idx + i,
                attn_impl=self.attn_impl,
                cfg_expand=self.cfg_expand and i == 0,
                dtype=self.dtype,
                name=f'transformer_blocks_{i}')(x, text, ctrl)

        bf_out = x.shape[0]                 # b*f, or 2*b*f after cfg_expand
        x = x.reshape(bf_out, hh, ww, inner)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_out')(x)
        x = x.reshape(bf_out // f, f, hh, ww, c)
        if x.shape[0] != residual.shape[0]:
            residual = jnp.concatenate([residual, residual], axis=0)
        return x + residual
