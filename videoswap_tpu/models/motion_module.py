"""AnimateDiff temporal motion modules.

Parity: /root/reference/videoswap/models/animatediff_models/motion_module.py.
A VanillaTemporalModule wraps a TemporalTransformer3DModel:
GN -> proj_in -> N x TemporalTransformerBlock -> proj_out (zero-init) + res.
Each block runs `attention_block_types` (2x Temporal_Self) attentions over
the FRAME axis per spatial location ('(b f) d c -> (b d) f c',
motion_module.py:291) with sinusoidal positional encoding (max_len 24),
then a GEGLU FFN.

TPU note: the whole temporal transformer runs as fused Pallas kernels
(ops/fused_temporal.py at C<=320; attention-blocks kernel + geglu kernel
at C=640; layer-wise with fused attention/FFN kernels above). Under
frame-sharding the module boundary is where the all-to-all (Ulysses)
collective is inserted (see videoswap_tpu/parallel).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Attention, FeedForward


def window_index(f: int, window: int, stride: int) -> np.ndarray:
    """Static [n_windows, window] frame indices for sliding-window temporal
    attention: stride-spaced starts plus a final window flush to the end so
    every frame is covered. All shapes are trace-time constants."""
    assert window <= f and stride >= 1
    starts = list(range(0, f - window + 1, stride))
    if starts[-1] != f - window:
        starts.append(f - window)
    return np.asarray([[s + j for j in range(window)] for s in starts],
                      dtype=np.int32)


def sinusoidal_position_table(max_len: int, d_model: int) -> np.ndarray:
    """pe[p, 2i] = sin(p / 10000^(2i/d)), pe[p, 2i+1] = cos(...)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TemporalTransformerBlock(nn.Module):
    dim: int
    heads: int
    max_len: int = 24
    num_attention_blocks: int = 2
    window: int | None = None     # long-video sliding-window attention
    stride: int | None = None     # window start spacing (default window//2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [(B*D), F, C] — attention across frames per spatial location
        b, f, c = x.shape
        windowed = self.window is not None and f > self.window
        w = self.window if windowed else f
        assert w <= self.max_len, (
            f'temporal sequence {w} exceeds positional-encoding max_len '
            f'{self.max_len}; set a motion window (long_video_cfg) for '
            f'videos longer than {self.max_len} frames')
        pe = jnp.asarray(sinusoidal_position_table(self.max_len, self.dim),
                         dtype=x.dtype)[:w]
        if windowed:
            # Long-video extension (the reference's dormant long_video_config
            # hook, motion_module.py:60,73,106,131): overlapping windows of
            # `w` frames, each attended in full with PE[0:w] (pretrained
            # motion weights stay in-distribution), outputs averaged over
            # overlaps. Indices are trace-time constants — the gather/
            # scatter compiles to static slices, and under frame(sp)
            # sharding GSPMD inserts the halo collectives.
            idx = window_index(f, w, self.stride or max(1, w // 2))
            nwin = idx.shape[0]
            counts = np.zeros((f,), np.float32)
            np.add.at(counts, idx.reshape(-1), 1.0)
            inv_counts = jnp.asarray(1.0 / counts, x.dtype)[None, :, None]
        for i in range(self.num_attention_blocks):
            attn = Attention(query_dim=self.dim, heads=self.heads,
                             dim_head=self.dim // self.heads,
                             dtype=self.dtype,
                             name=f'attention_blocks_{i}')
            h = nn.LayerNorm(dtype=self.dtype, name=f'norms_{i}')(x)
            if windowed:
                hw = h[:, idx.reshape(-1)].reshape(b * nwin, w, c)
                a = attn(hw + pe[None], use_flash=False)
                h = jnp.zeros_like(h).at[:, idx.reshape(-1)].add(
                    a.reshape(b, nwin * w, c)) * inv_counts
            else:
                h = attn(h + pe[None], use_flash=False)
            x = h + x
        h = nn.LayerNorm(dtype=self.dtype, name='ff_norm')(x)
        return FeedForward(self.dim, dtype=self.dtype, name='ff')(h) + x


class TemporalTransformer3DModel(nn.Module):
    heads: int
    num_layers: int
    max_len: int = 24
    norm_groups: int = 32
    window: int | None = None
    stride: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, F, H, W, C)
        b, f, hh, ww, c = x.shape

        # Fused Pallas path (ops/fused_temporal.py). Full fusion needs
        # every weight VMEM-resident (~4.4 MB at C=320); at C=640 the FFN
        # (9.8 MB) is split out (include_ffn=False + ffn_tail); wider
        # levels run the layer-wise path (whose attention and FFN are
        # themselves fused kernels). Params are declared by the layer-wise
        # branch at init and read back via self.variables here (same
        # tree, full autodiff through the custom VJPs).
        import jax as _jax
        import os as _os_gate
        include_ffn = c <= 320
        use_fused = (_jax.default_backend() == 'tpu' and c <= 640
                     and f <= 128 and self.num_layers == 1
                     and f <= self.max_len
                     and (self.window is None or f <= self.window)
                     and not _os_gate.environ.get('FT_DISABLE')
                     and not self.is_initializing())
        # per-FRAME GroupNorm stats: the reference normalizes the
        # '(b f) c h w' layout (motion_module.py:112, after the rearrange
        # at :286), so statistics must NOT mix frames
        gn = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                          dtype=self.dtype, name='norm')(
            x.reshape(b * f, hh, ww, c)).reshape(x.shape)

        import os as _os
        if use_fused:
            from videoswap_tpu.ops.fused_temporal import (
                _pe_rows, ffn_tail, flatten_tt_params,
                fused_temporal_transformer, fused_temporal_transformer_bfhw)
            params = self.variables['params']
            flat = [jnp.asarray(p, self.dtype) if p.ndim == 2
                    else jnp.asarray(p, jnp.float32)
                    for p in flatten_tt_params(params, self.num_layers,
                                               include_ffn=include_ffn)]
            rpt = max(1, 128 // f) * f
            pe_rows = jnp.asarray(_pe_rows(f, c, rpt, self.max_len),
                                  self.dtype)
            if _os.environ.get('FT_4D'):
                # frame-major (B, F, HW, C) straight into the kernel with
                # an in-VMEM (loc, frame) relayout. Measured SLOWER than
                # the row layout at bench shapes (17.35 vs 17.07 s
                # headline avg — XLA fuses the host-side transposes more
                # cheaply than Mosaic's relayout): off by default, kept
                # for A/B benches via FT_4D=1.
                x4 = x.reshape(b, f, hh * ww, c).astype(self.dtype)
                g4 = gn.reshape(b, f, hh * ww, c).astype(self.dtype)
                out = fused_temporal_transformer_bfhw(
                    g4, x4, pe_rows, flat, self.heads, f, self.num_layers,
                    include_ffn)
                if not include_ffn:
                    out = ffn_tail(out.reshape(b * f * hh * ww, c),
                                   x4.reshape(b * f * hh * ww, c),
                                   params, self.dtype)
                return out.reshape(b, f, hh, ww, c)
            x2 = x.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww * f, c)
            g2 = gn.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww * f, c)
            out = fused_temporal_transformer(
                g2.astype(self.dtype), x2.astype(self.dtype), pe_rows,
                flat, self.heads, f, self.num_layers, include_ffn)
            if not include_ffn:
                out = ffn_tail(out, x2.astype(self.dtype), params,
                               self.dtype)
            return out.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)

        residual = x
        h = nn.Dense(c, dtype=self.dtype, name='proj_in')(gn)
        # (B, F, H, W, C) -> (B*H*W, F, C): frame-axis sequence per location
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        for i in range(self.num_layers):
            h = TemporalTransformerBlock(
                dim=c, heads=self.heads, max_len=self.max_len,
                window=self.window, stride=self.stride,
                dtype=self.dtype, name=f'transformer_blocks_{i}')(h)
        h = h.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        # zero-init proj_out: the module starts as identity (reference
        # motion_module.py:76-77), critical for loading-free smoke tests.
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name='proj_out')(h)
        return h + residual


class VanillaTemporalModule(nn.Module):
    heads: int = 8
    num_transformer_block: int = 1
    max_len: int = 24
    norm_groups: int = 32
    window: int | None = None
    stride: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return TemporalTransformer3DModel(
            heads=self.heads, num_layers=self.num_transformer_block,
            max_len=self.max_len, norm_groups=self.norm_groups,
            window=self.window, stride=self.stride,
            dtype=self.dtype,
            name='temporal_transformer')(x)
