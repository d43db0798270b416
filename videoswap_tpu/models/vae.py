"""AutoencoderKL (SD-1.5 VAE) in flax, channels-last.

Architecture parity with the diffusers SD-1.5 `AutoencoderKL` the reference
loads from its local `pretrained_model_path` (reference train.py:56-63,
test.py:73-79): 4-level encoder/decoder (128, 256, 512, 512), 2/3 resnets
per block, single-head mid-block attention, GroupNorm(32, eps=1e-6),
scaling factor 0.18215.

Video use: frames fold into the batch; `encode_video` / `decode_video`
wrap the per-frame 2D model for (B, F, H, W, C) tensors, replacing the
reference's `(b f) c h w` rearranges (pipeline_videoswap.py:204-233, 603).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from videoswap_tpu.models.resnet3d import _Conv2DParams
from videoswap_tpu.ops import dot_product_attention
from videoswap_tpu.ops.subpixel import (naive_upsample_conv, subpixel_enabled,
                                        subpixel_upsample_conv)

SD_VAE_SCALING = 0.18215


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm1')(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(h)
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm2')(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (mid block)."""
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='group_norm')(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name='to_q')(x)
        k = nn.Dense(c, dtype=self.dtype, name='to_k')(x)
        v = nn.Dense(c, dtype=self.dtype, name='to_v')(x)
        out = dot_product_attention(q, k, v, heads=1, use_flash=False)
        out = nn.Dense(c, dtype=self.dtype, name='to_out_0')(out)
        return out.reshape(b, h, w, c) + res


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = self.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block):
                x = VAEResnetBlock(ch, norm_groups=self.norm_groups, dtype=self.dtype,
                                   name=f'down_blocks_{i}_resnets_{j}')(x)
            if i < len(chans) - 1:
                # diffusers uses pad=0 with manual (0,1) asymmetric padding
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding='VALID',
                            dtype=self.dtype,
                            name=f'down_blocks_{i}_downsamplers_0_conv')(x)
        ch = chans[-1]
        x = VAEResnetBlock(ch, norm_groups=self.norm_groups, dtype=self.dtype, name='mid_block_resnets_0')(x)
        x = VAEAttention(norm_groups=self.norm_groups, dtype=self.dtype, name='mid_block_attentions_0')(x)
        x = VAEResnetBlock(ch, norm_groups=self.norm_groups, dtype=self.dtype, name='mid_block_resnets_1')(x)
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out')(x)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        chans = list(reversed(self.block_out_channels))   # (512,512,256,128)
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(z)
        x = VAEResnetBlock(chans[0], norm_groups=self.norm_groups, dtype=self.dtype,
                           name='mid_block_resnets_0')(x)
        x = VAEAttention(norm_groups=self.norm_groups, dtype=self.dtype, name='mid_block_attentions_0')(x)
        x = VAEResnetBlock(chans[0], norm_groups=self.norm_groups, dtype=self.dtype,
                           name='mid_block_resnets_1')(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block + 1):
                x = VAEResnetBlock(ch, norm_groups=self.norm_groups, dtype=self.dtype,
                                   name=f'up_blocks_{i}_resnets_{j}')(x)
            if i < len(chans) - 1:
                # nearest-2x + conv3x3 as a subpixel phase decomposition
                # (ops/subpixel.py): same math, 2.25x fewer conv FLOPs.
                # Params keep the nn.Conv kernel/bias path for converters.
                kernel, bias = _Conv2DParams(
                    ch, name=f'up_blocks_{i}_upsamplers_0_conv')(ch)
                if subpixel_enabled():
                    x = subpixel_upsample_conv(x, kernel, bias, self.dtype)
                else:
                    h, w = x.shape[1:3]
                    x = naive_upsample_conv(x, kernel, bias, self.dtype,
                                            (2 * h, 2 * w))
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name='conv_norm_out')(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out')(x)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    scaling_factor: float = SD_VAE_SCALING
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels,
                               latent_channels=self.latent_channels,
                               norm_groups=self.norm_groups,
                               dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels,
                               norm_groups=self.norm_groups,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, x):
        """image [B,H,W,3] -> (mean, logvar) each [B,H/8,W/8,4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Posterior sample (or mode when rng is None), already scaled."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, dtype=mean.dtype)
        return mean * self.scaling_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.scaling_factor))

    def encode_video(self, video, rng=None):
        """(B, F, H, W, 3) -> (B, F, H/8, W/8, 4) scaled latents."""
        b, f = video.shape[:2]
        z = self.encode(video.reshape(b * f, *video.shape[2:]), rng)
        return z.reshape(b, f, *z.shape[1:])

    def encode_video_moments(self, video):
        """(B, F, H, W, 3) -> posterior (mean, logvar), each
        (B, F, H/8, W/8, 4), UNSCALED. Lets a single-video train loop
        encode once and draw fresh posterior samples per step
        (`sample_video_from_moments`) — identical math to re-encoding."""
        b, f = video.shape[:2]
        mean, logvar = self.encode_moments(
            video.reshape(b * f, *video.shape[2:]))
        return (mean.reshape(b, f, *mean.shape[1:]),
                logvar.reshape(b, f, *logvar.shape[1:]))

    def sample_video_from_moments(self, mean, logvar, rng):
        """Draw the scaled posterior sample `encode_video` would produce
        from cached moments."""
        flat = mean.reshape(-1, *mean.shape[2:])
        eps = jax.random.normal(rng, flat.shape, dtype=flat.dtype)
        z = (flat + jnp.exp(0.5 * logvar.reshape(flat.shape)) * eps)
        return (z * self.scaling_factor).reshape(mean.shape)

    def decode_video(self, latents):
        b, f = latents.shape[:2]
        x = self.decode(latents.reshape(b * f, *latents.shape[2:]))
        return x.reshape(b, f, *x.shape[1:])

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
