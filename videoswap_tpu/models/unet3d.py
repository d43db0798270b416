"""SD-1.5 U-Net inflated to video + AnimateDiff motion modules (flax).

Structural parity with /root/reference/videoswap/models/animatediff_models/
unet.py:32-523 and unet_blocks.py (CrossAttnDownBlock3D / DownBlock3D /
UNetMidBlock3DCrossAttn / CrossAttnUpBlock3D / UpBlock3D), rebuilt
TPU-first:

- channels-last (B, F, H, W, C) activations, frames folded into batch for
  all 2D ops (the InflatedConv3d trick as pure reshapes, resnet.py:9-18);
- adapter residuals injected into the LAST layer of each down block
  (unet_blocks.py:399-402, unet.py:434-438);
- every spatial attention site carries a static `SiteKey` so prompt-to-
  prompt control is a function argument, not a runtime patch;
- ED-LoRA layerwise text embeddings (B, L, 77, 768) sliced per cross-attn
  layer by static `cross_layer_idx` (16 layers, walk order down->mid->up);
- optional gradient checkpointing via `nn.remat` per block layer
  (reference unet_blocks.py:372-390).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from videoswap_tpu.p2p import NO_CTRL, AttnCtrl
from videoswap_tpu.utils.registry import MODEL_REGISTRY

from .attention_blocks import Transformer3DModel
from .layers import TimestepEmbedding, timestep_sinusoidal
from .motion_module import VanillaTemporalModule
from .resnet3d import Downsample3D, InflatedConv, ResnetBlock3D, Upsample3D


class UNet3DConfig(NamedTuple):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8          # diffusers legacy: number of heads
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    sample_size: int = 64
    use_motion_module: bool = True
    motion_module_resolutions: Sequence[int] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_heads: int = 8
    motion_num_transformer_block: int = 1
    motion_max_len: int = 24
    # long-video extension: sliding-window temporal attention for videos
    # longer than motion_max_len frames (the reference's dormant
    # long_video_config hook, motion_module.py:60). None = full attention.
    motion_window: Optional[int] = None
    motion_window_stride: Optional[int] = None

    @property
    def num_cross_layers_per_down_block(self) -> int:
        return self.layers_per_block


def _maybe_remat(cls, mode):
    """mode: False (no remat), True (full-block remat), or 'save_flash'
    (remat the block but SAVE the flash-attention kernel's out+lse —
    tagged in ops/flash_attention.py — so the bwd pass never re-runs the
    attention forward; the remat-ideal 3x per-family cost includes that
    recompute, so this sits below it at the price of O(S*d) extra HBM
    per site)."""
    if not mode:
        return cls
    policy = None
    if mode == 'save_flash':
        policy = jax.checkpoint_policies.save_only_these_names(
            'flash_out', 'flash_lse')
    return nn.remat(cls, policy=policy)


class CrossAttnDownBlock3D(nn.Module):
    cfg: UNet3DConfig
    out_channels: int
    use_motion: bool
    add_downsample: bool
    place_idx: int        # down block index (0..2) for attention numbering
    attn_impl: str = 'auto'
    cfg_expand: bool = False  # CFG-prefix dedup (first block only)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, text, ctrl=NO_CTRL, adapter_residual=None):
        cfg = self.cfg
        heads = cfg.attention_head_dim
        skips = []
        Res = _maybe_remat(ResnetBlock3D, self.remat)
        Attn = _maybe_remat(Transformer3DModel, self.remat)
        n = cfg.layers_per_block
        for i in range(n):
            x = Res(out_channels=self.out_channels, eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'resnets_{i}')(x, temb)
            x = Attn(heads=heads, dim_head=self.out_channels // heads,
                     cross_attention_dim=cfg.cross_attention_dim,
                     norm_groups=cfg.norm_num_groups,
                     attn_impl=self.attn_impl,
                     num_layers=1, place='down',
                     attn_index=self.place_idx * n + i,
                     cross_layer_idx=self.place_idx * n + i,
                     cfg_expand=self.cfg_expand and i == 0,
                     dtype=self.dtype, name=f'attentions_{i}')(x, text, ctrl)
            if self.use_motion:
                x = VanillaTemporalModule(
                    heads=self.cfg.motion_heads,
                    num_transformer_block=cfg.motion_num_transformer_block,
                    max_len=cfg.motion_max_len,
                    window=cfg.motion_window,
                    stride=cfg.motion_window_stride,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'motion_modules_{i}')(x)
            if i == n - 1 and adapter_residual is not None:
                x = x + adapter_residual
            skips.append(x)
        if self.add_downsample:
            x = Downsample3D(self.out_channels, dtype=self.dtype,
                             name='downsamplers_0')(x)
            skips.append(x)
        return x, skips


class DownBlock3D(nn.Module):
    cfg: UNet3DConfig
    out_channels: int
    use_motion: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, adapter_residual=None):
        cfg = self.cfg
        skips = []
        Res = _maybe_remat(ResnetBlock3D, self.remat)
        for i in range(cfg.layers_per_block):
            x = Res(out_channels=self.out_channels, eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'resnets_{i}')(x, temb)
            if self.use_motion:
                x = VanillaTemporalModule(
                    heads=cfg.motion_heads,
                    num_transformer_block=cfg.motion_num_transformer_block,
                    max_len=cfg.motion_max_len,
                    window=cfg.motion_window,
                    stride=cfg.motion_window_stride,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'motion_modules_{i}')(x)
            skips.append(x)
        # the 4th adapter residual is added after the whole (final) down
        # block — reference unet.py:434-438 (no downsampler on this block).
        if adapter_residual is not None:
            x = x + adapter_residual
            skips[-1] = x
        if self.add_downsample:
            x = Downsample3D(self.out_channels, dtype=self.dtype,
                             name='downsamplers_0')(x)
            skips.append(x)
        return x, skips


class UNetMidBlock3DCrossAttn(nn.Module):
    cfg: UNet3DConfig
    use_motion: bool
    attn_impl: str = 'auto'
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, text, ctrl=NO_CTRL):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim
        Res = _maybe_remat(ResnetBlock3D, self.remat)
        Attn = _maybe_remat(Transformer3DModel, self.remat)
        x = Res(out_channels=ch, eps=cfg.norm_eps, groups=cfg.norm_num_groups,
                dtype=self.dtype, name='resnets_0')(x, temb)
        x = Attn(heads=heads, dim_head=ch // heads,
                 cross_attention_dim=cfg.cross_attention_dim,
                 norm_groups=cfg.norm_num_groups,
                 attn_impl=self.attn_impl, num_layers=1,
                 place='mid', attn_index=0,
                 cross_layer_idx=len(cfg.block_out_channels
                                     [:-1]) * cfg.layers_per_block,
                 dtype=self.dtype, name='attentions_0')(x, text, ctrl)
        if self.use_motion:
            x = VanillaTemporalModule(
                heads=cfg.motion_heads,
                num_transformer_block=cfg.motion_num_transformer_block,
                max_len=cfg.motion_max_len,
                window=cfg.motion_window,
                stride=cfg.motion_window_stride,
                norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                name='motion_modules_0')(x)
        x = Res(out_channels=ch, eps=cfg.norm_eps, groups=cfg.norm_num_groups,
                dtype=self.dtype, name='resnets_1')(x, temb)
        return x


class CrossAttnUpBlock3D(nn.Module):
    cfg: UNet3DConfig
    out_channels: int
    use_motion: bool
    add_upsample: bool
    place_idx: int        # up block index (1..3); block 0 has no attention
    attn_impl: str = 'auto'
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, text, ctrl=NO_CTRL,
                 upsample_size=None):
        cfg = self.cfg
        heads = cfg.attention_head_dim
        n = cfg.layers_per_block + 1
        Res = _maybe_remat(ResnetBlock3D, self.remat)
        Attn = _maybe_remat(Transformer3DModel, self.remat)
        n_down_cross = 3 * cfg.layers_per_block  # 6 cross layers in down path
        for i in range(n):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = Res(out_channels=self.out_channels, eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'resnets_{i}')(x, temb)
            x = Attn(heads=heads, dim_head=self.out_channels // heads,
                     cross_attention_dim=cfg.cross_attention_dim,
                     norm_groups=cfg.norm_num_groups,
                     attn_impl=self.attn_impl,
                     num_layers=1, place='up',
                     attn_index=(self.place_idx - 1) * n + i,
                     cross_layer_idx=(n_down_cross + 1
                                      + (self.place_idx - 1) * n + i),
                     dtype=self.dtype, name=f'attentions_{i}')(x, text, ctrl)
            if self.use_motion:
                x = VanillaTemporalModule(
                    heads=cfg.motion_heads,
                    num_transformer_block=cfg.motion_num_transformer_block,
                    max_len=cfg.motion_max_len,
                    window=cfg.motion_window,
                    stride=cfg.motion_window_stride,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'motion_modules_{i}')(x)
        if self.add_upsample:
            x = Upsample3D(self.out_channels, dtype=self.dtype,
                           name='upsamplers_0')(x, upsample_size)
        return x


class UpBlock3D(nn.Module):
    cfg: UNet3DConfig
    out_channels: int
    use_motion: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, upsample_size=None):
        cfg = self.cfg
        Res = _maybe_remat(ResnetBlock3D, self.remat)
        for i in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = Res(out_channels=self.out_channels, eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'resnets_{i}')(x, temb)
            if self.use_motion:
                x = VanillaTemporalModule(
                    heads=cfg.motion_heads,
                    num_transformer_block=cfg.motion_num_transformer_block,
                    max_len=cfg.motion_max_len,
                    window=cfg.motion_window,
                    stride=cfg.motion_window_stride,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f'motion_modules_{i}')(x)
        if self.add_upsample:
            x = Upsample3D(self.out_channels, dtype=self.dtype,
                           name='upsamplers_0')(x, upsample_size)
        return x


@MODEL_REGISTRY.register()
class AnimateDiffUNet3DModel(nn.Module):
    """The flagship video U-Net. sample (B,F,H,W,4) -> eps (B,F,H,W,4).

    attn_impl: 'auto' (Pallas flash for long sequences, inference),
    'chunked' (differentiable memory-bounded attention, training at high
    resolution), 'xla' (plain attention)."""
    cfg: UNet3DConfig = UNet3DConfig()
    attn_impl: str = 'auto'
    dtype: jnp.dtype = jnp.float32
    # False | True (full-block remat) | 'save_flash' (remat blocks but keep
    # flash-attention out+lse; see _maybe_remat)
    gradient_checkpointing: 'bool | str' = False

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 adapter_residuals: Optional[Sequence[jnp.ndarray]] = None,
                 ctrl: AttnCtrl = NO_CTRL,
                 cfg_prefix_dedup: bool = False) -> jnp.ndarray:
        """cfg_prefix_dedup: classifier-free-guidance fast path. `sample` is
        the SINGLE shared batch half (the caller would otherwise pass
        [latents; latents]) while `encoder_hidden_states` carries both CFG
        halves; the batch doubles to [uncond; cond] at the first
        cross-attention — the first point where text (the only divergence
        between the halves: timestep and adapter residuals are duplicated,
        reference pipeline_videoswap.py:544-564) enters. Exact same math as
        the duplicated pass, minus the duplicate prefix compute."""
        cfg = self.cfg
        chans = tuple(cfg.block_out_channels)
        remat_mode = self.gradient_checkpointing

        def rm(level: int):
            """Per-block remat mode. 'edges' remats ONLY the full-
            resolution blocks (level 0 of the channel pyramid — their
            activations dominate residual HBM at 4x the area of level 1)
            and saves everything deeper: the memory-vs-recompute sweet
            spot once attention/GEGLU residuals are compact (no-remat
            needs 16.30 G vs 15.75 G available at 512^2 x 16f — over by
            only 0.55 G, all of it recoverable at level 0)."""
            if remat_mode == 'edges':
                return level == 0
            if remat_mode == 'edges_sf':
                # level-0 blocks remat with the save_flash policy (their
                # S=4096 attention fwd is the costliest recompute)
                return 'save_flash' if level == 0 else False
            return remat_mode

        if cfg_prefix_dedup:
            assert encoder_hidden_states.shape[0] == 2 * sample.shape[0], (
                'cfg_prefix_dedup expects text with both CFG halves and '
                'sample with one')

        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_feat = timestep_sinusoidal(timesteps, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, dtype=self.dtype,
                                 name='time_embedding')(
                                     t_feat.astype(self.dtype))

        from videoswap_tpu.parallel.sharding import constrain_frames
        text = encoder_hidden_states.astype(self.dtype)
        x = sample.astype(self.dtype)
        x = InflatedConv(chans[0], dtype=self.dtype, name='conv_in')(x)
        x = constrain_frames(x)

        res = (list(adapter_residuals) if adapter_residuals is not None
               else [None] * len(chans))

        # with dedup the conv_in skip is consumed by the (post-expansion)
        # last up-block resnet at full CFG batch — double it here
        skips = [jnp.concatenate([x, x], axis=0) if cfg_prefix_dedup else x]
        # -- down ------------------------------------------------------------
        for i, ch in enumerate(chans):
            is_final = i == len(chans) - 1
            use_motion = (cfg.use_motion_module
                          and (2 ** i) in cfg.motion_module_resolutions)
            if not is_final:
                x, s = CrossAttnDownBlock3D(
                    cfg=cfg, out_channels=ch, use_motion=use_motion,
                    add_downsample=True, place_idx=i,
                    attn_impl=self.attn_impl,
                    cfg_expand=cfg_prefix_dedup and i == 0,
                    dtype=self.dtype,
                    remat=rm(i), name=f'down_blocks_{i}')(
                        x, temb, text, ctrl, res[i])
                x = constrain_frames(x)
            else:
                x, s = DownBlock3D(
                    cfg=cfg, out_channels=ch, use_motion=use_motion,
                    add_downsample=False, dtype=self.dtype, remat=rm(i),
                    name=f'down_blocks_{i}')(x, temb, res[i])
                x = constrain_frames(x)
            skips.extend(s)

        # -- mid -------------------------------------------------------------
        x = UNetMidBlock3DCrossAttn(
            cfg=cfg, use_motion=(cfg.use_motion_module
                                 and cfg.motion_module_mid_block),
            attn_impl=self.attn_impl,
            dtype=self.dtype, remat=rm(len(chans) - 1),
            name='mid_block')(
                x, temb, text, ctrl)
        x = constrain_frames(x)

        # -- up --------------------------------------------------------------
        rev = list(reversed(chans))
        for i, ch in enumerate(rev):
            is_final = i == len(rev) - 1
            resolution = 2 ** (len(rev) - 1 - i)
            use_motion = (cfg.use_motion_module
                          and resolution in cfg.motion_module_resolutions)
            n_take = cfg.layers_per_block + 1
            block_skips = skips[-n_take:]
            del skips[-n_take:]
            upsample_size = (skips[-1].shape[2:4] if skips else None)
            if i == 0:
                x = UpBlock3D(cfg=cfg, out_channels=ch,
                              use_motion=use_motion,
                              add_upsample=not is_final, dtype=self.dtype,
                              remat=rm(len(rev) - 1 - i),
                              name=f'up_blocks_{i}')(
                                  x, block_skips, temb, upsample_size)
            else:
                x = CrossAttnUpBlock3D(cfg=cfg, out_channels=ch,
                                       use_motion=use_motion,
                                       add_upsample=not is_final,
                                       place_idx=i,
                                       attn_impl=self.attn_impl,
                                       dtype=self.dtype,
                                       remat=rm(len(rev) - 1 - i),
                                       name=f'up_blocks_{i}')(
                                           x, block_skips, temb, text, ctrl,
                                           upsample_size)
            x = constrain_frames(x)
            # DIFT taps: up-block features, fetched via
            # mutable=['features'] (reference dift_util.py MyUNet2D early
            # exit after `up_ft_indices`; here capture is free unless asked)
            self.sow('features', f'up_block_{i}', x,
                     reduce_fn=lambda prev, cur: cur)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name='conv_norm_out')(x)
        x = nn.silu(x)
        x = InflatedConv(cfg.out_channels, dtype=self.dtype,
                         name='conv_out')(x)
        return x
