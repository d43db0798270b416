"""Authoritative key/shape fixtures for the real checkpoint families.

Generated from the diffusers/AnimateDiff naming rules, NOT from our flax
models — so converter tests against these catch naming or orientation drift
that self-referential fixtures cannot (VERDICT r01 missing #3).

Families (SURVEY.md §5.4):
- SD-1.5 U-Net, diffusers `UNet2DConditionModel` layout
  (unet/diffusion_pytorch_model.bin of chilloutmix; reference train.py:65-73)
- AnimateDiff `mm_sd_v14.ckpt` motion-module state dict
  (reference train.py:74-76; motion_module.py key structure)
- SD VAE `AutoencoderKL`, both the modern `to_q/...` attention keys and the
  deprecated `query/key/value/proj_attn` layout old exports carry
- CLIP-L/14 text encoder keys come straight from transformers (see test)
"""

from __future__ import annotations

UNET_BLOCK_OUT = (320, 640, 1280, 1280)
TEMB = 1280
CTX = 768
MM_MAX_LEN = 24
VAE_BLOCK_OUT = (128, 256, 512, 512)


def _resnet(prefix: str, cin: int, cout: int, time_emb: bool = True) -> dict:
    k = {
        f'{prefix}.norm1.weight': (cin,), f'{prefix}.norm1.bias': (cin,),
        f'{prefix}.conv1.weight': (cout, cin, 3, 3),
        f'{prefix}.conv1.bias': (cout,),
        f'{prefix}.norm2.weight': (cout,), f'{prefix}.norm2.bias': (cout,),
        f'{prefix}.conv2.weight': (cout, cout, 3, 3),
        f'{prefix}.conv2.bias': (cout,),
    }
    if time_emb:
        k[f'{prefix}.time_emb_proj.weight'] = (cout, TEMB)
        k[f'{prefix}.time_emb_proj.bias'] = (cout,)
    if cin != cout:
        k[f'{prefix}.conv_shortcut.weight'] = (cout, cin, 1, 1)
        k[f'{prefix}.conv_shortcut.bias'] = (cout,)
    return k


def _spatial_transformer(prefix: str, c: int) -> dict:
    tb = f'{prefix}.transformer_blocks.0'
    k = {
        f'{prefix}.norm.weight': (c,), f'{prefix}.norm.bias': (c,),
        f'{prefix}.proj_in.weight': (c, c, 1, 1),
        f'{prefix}.proj_in.bias': (c,),
        f'{prefix}.proj_out.weight': (c, c, 1, 1),
        f'{prefix}.proj_out.bias': (c,),
        f'{tb}.attn1.to_q.weight': (c, c),
        f'{tb}.attn1.to_k.weight': (c, c),
        f'{tb}.attn1.to_v.weight': (c, c),
        f'{tb}.attn1.to_out.0.weight': (c, c),
        f'{tb}.attn1.to_out.0.bias': (c,),
        f'{tb}.attn2.to_q.weight': (c, c),
        f'{tb}.attn2.to_k.weight': (c, CTX),
        f'{tb}.attn2.to_v.weight': (c, CTX),
        f'{tb}.attn2.to_out.0.weight': (c, c),
        f'{tb}.attn2.to_out.0.bias': (c,),
        f'{tb}.ff.net.0.proj.weight': (8 * c, c),
        f'{tb}.ff.net.0.proj.bias': (8 * c,),
        f'{tb}.ff.net.2.weight': (c, 4 * c),
        f'{tb}.ff.net.2.bias': (c,),
    }
    for n in ('norm1', 'norm2', 'norm3'):
        k[f'{tb}.{n}.weight'] = (c,)
        k[f'{tb}.{n}.bias'] = (c,)
    return k


def _motion_module(prefix: str, c: int) -> dict:
    tt = f'{prefix}.temporal_transformer'
    tb = f'{tt}.transformer_blocks.0'
    k = {
        f'{tt}.norm.weight': (c,), f'{tt}.norm.bias': (c,),
        f'{tt}.proj_in.weight': (c, c), f'{tt}.proj_in.bias': (c,),
        f'{tt}.proj_out.weight': (c, c), f'{tt}.proj_out.bias': (c,),
        f'{tb}.ff.net.0.proj.weight': (8 * c, c),
        f'{tb}.ff.net.0.proj.bias': (8 * c,),
        f'{tb}.ff.net.2.weight': (c, 4 * c),
        f'{tb}.ff.net.2.bias': (c,),
        f'{tb}.ff_norm.weight': (c,), f'{tb}.ff_norm.bias': (c,),
    }
    for j in (0, 1):
        ab = f'{tb}.attention_blocks.{j}'
        k[f'{ab}.to_q.weight'] = (c, c)
        k[f'{ab}.to_k.weight'] = (c, c)
        k[f'{ab}.to_v.weight'] = (c, c)
        k[f'{ab}.to_out.0.weight'] = (c, c)
        k[f'{ab}.to_out.0.bias'] = (c,)
        k[f'{ab}.pos_encoder.pe'] = (1, MM_MAX_LEN, c)
        k[f'{tb}.norms.{j}.weight'] = (c,)
        k[f'{tb}.norms.{j}.bias'] = (c,)
    return k


def sd15_unet_state_shapes() -> dict[str, tuple]:
    C = UNET_BLOCK_OUT
    k = {
        'conv_in.weight': (C[0], 4, 3, 3), 'conv_in.bias': (C[0],),
        'time_embedding.linear_1.weight': (TEMB, C[0]),
        'time_embedding.linear_1.bias': (TEMB,),
        'time_embedding.linear_2.weight': (TEMB, TEMB),
        'time_embedding.linear_2.bias': (TEMB,),
        'conv_norm_out.weight': (C[0],), 'conv_norm_out.bias': (C[0],),
        'conv_out.weight': (4, C[0], 3, 3), 'conv_out.bias': (4,),
    }
    # down blocks 0-2: CrossAttnDownBlock2D; 3: DownBlock2D
    for i in range(3):
        c, cin = C[i], C[i - 1] if i > 0 else C[0]
        p = f'down_blocks.{i}'
        k.update(_resnet(f'{p}.resnets.0', cin, c))
        k.update(_resnet(f'{p}.resnets.1', c, c))
        k.update(_spatial_transformer(f'{p}.attentions.0', c))
        k.update(_spatial_transformer(f'{p}.attentions.1', c))
        k[f'{p}.downsamplers.0.conv.weight'] = (c, c, 3, 3)
        k[f'{p}.downsamplers.0.conv.bias'] = (c,)
    k.update(_resnet('down_blocks.3.resnets.0', C[3], C[3]))
    k.update(_resnet('down_blocks.3.resnets.1', C[3], C[3]))
    # mid
    k.update(_resnet('mid_block.resnets.0', C[3], C[3]))
    k.update(_resnet('mid_block.resnets.1', C[3], C[3]))
    k.update(_spatial_transformer('mid_block.attentions.0', C[3]))
    # up blocks: skip-concat input channels per SD-1.5
    up_out = (1280, 1280, 640, 320)
    up_in = ((2560, 2560, 2560),
             (2560, 2560, 1920),
             (1920, 1280, 960),
             (960, 640, 640))
    for i in range(4):
        p = f'up_blocks.{i}'
        for j in range(3):
            k.update(_resnet(f'{p}.resnets.{j}', up_in[i][j], up_out[i]))
            if i > 0:
                k.update(_spatial_transformer(f'{p}.attentions.{j}',
                                              up_out[i]))
        if i < 3:
            k[f'{p}.upsamplers.0.conv.weight'] = (up_out[i], up_out[i], 3, 3)
            k[f'{p}.upsamplers.0.conv.bias'] = (up_out[i],)
    return k


def mm_sd_v14_state_shapes() -> dict[str, tuple]:
    """AnimateDiff mm_sd_v14.ckpt: down_blocks.{0-3}.motion_modules.{0,1} +
    up_blocks.{0-3}.motion_modules.{0,1,2}; no mid-block module
    (motion_module_mid_block: false, options/model_cfg/inference.yml)."""
    C = UNET_BLOCK_OUT
    k = {}
    for i in range(4):
        for j in range(2):
            k.update(_motion_module(f'down_blocks.{i}.motion_modules.{j}',
                                    C[i]))
    for i, c in enumerate(reversed(C)):
        for j in range(3):
            k.update(_motion_module(f'up_blocks.{i}.motion_modules.{j}', c))
    return k


def _vae_resnet(prefix: str, cin: int, cout: int) -> dict:
    return _resnet(prefix, cin, cout, time_emb=False)


def _vae_attention(prefix: str, c: int, legacy: bool) -> dict:
    k = {f'{prefix}.group_norm.weight': (c,),
         f'{prefix}.group_norm.bias': (c,)}
    names = (('query', 'key', 'value', 'proj_attn') if legacy
             else ('to_q', 'to_k', 'to_v', 'to_out.0'))
    for n in names:
        k[f'{prefix}.{n}.weight'] = (c, c)
        k[f'{prefix}.{n}.bias'] = (c,)
    return k


def sd_vae_state_shapes(legacy_attention: bool = False) -> dict[str, tuple]:
    B = VAE_BLOCK_OUT
    k = {
        'encoder.conv_in.weight': (B[0], 3, 3, 3),
        'encoder.conv_in.bias': (B[0],),
        'encoder.conv_norm_out.weight': (B[-1],),
        'encoder.conv_norm_out.bias': (B[-1],),
        'encoder.conv_out.weight': (8, B[-1], 3, 3),
        'encoder.conv_out.bias': (8,),
        'decoder.conv_in.weight': (B[-1], 4, 3, 3),
        'decoder.conv_in.bias': (B[-1],),
        'decoder.conv_norm_out.weight': (B[0],),
        'decoder.conv_norm_out.bias': (B[0],),
        'decoder.conv_out.weight': (3, B[0], 3, 3),
        'decoder.conv_out.bias': (3,),
        'quant_conv.weight': (8, 8, 1, 1), 'quant_conv.bias': (8,),
        'post_quant_conv.weight': (4, 4, 1, 1), 'post_quant_conv.bias': (4,),
    }
    for i, c in enumerate(B):
        cin = B[i - 1] if i > 0 else B[0]
        p = f'encoder.down_blocks.{i}'
        k.update(_vae_resnet(f'{p}.resnets.0', cin, c))
        k.update(_vae_resnet(f'{p}.resnets.1', c, c))
        if i < 3:
            k[f'{p}.downsamplers.0.conv.weight'] = (c, c, 3, 3)
            k[f'{p}.downsamplers.0.conv.bias'] = (c,)
    for enc in ('encoder', 'decoder'):
        c = B[-1]
        k.update(_vae_resnet(f'{enc}.mid_block.resnets.0', c, c))
        k.update(_vae_resnet(f'{enc}.mid_block.resnets.1', c, c))
        k.update(_vae_attention(f'{enc}.mid_block.attentions.0', c,
                                legacy_attention))
    up_out = tuple(reversed(B))                     # (512, 512, 256, 128)
    for i, c in enumerate(up_out):
        cin = up_out[i - 1] if i > 0 else B[-1]
        p = f'decoder.up_blocks.{i}'
        k.update(_vae_resnet(f'{p}.resnets.0', cin, c))
        k.update(_vae_resnet(f'{p}.resnets.1', c, c))
        k.update(_vae_resnet(f'{p}.resnets.2', c, c))
        if i < 3:
            k[f'{p}.upsamplers.0.conv.weight'] = (c, c, 3, 3)
            k[f'{p}.upsamplers.0.conv.bias'] = (c,)
    return k
