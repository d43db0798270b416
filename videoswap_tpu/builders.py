"""Config -> model/pipeline assembly (the reference's registry-driven
build_model/build_pipeline path, train.py:49-102 / test.py:52-79).

Supports two weight modes:
- `pretrained_model_path` pointing at a diffusers SD-1.5 layout
  (unet/vae/text_encoder subdirs with config.json + torch weights) plus an
  optional AnimateDiff motion_module_path — converted to flax params;
- no pretrained path (or missing files): random init at the configured
  sizes, for smoke/CI runs without downloaded checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.models import converters
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import get_logger
from videoswap_tpu.utils.tokenizer import load_tokenizer


def unet_config_from_opt(model_opt: dict, root_path: str,
                         pretrained_path: Optional[str]) -> UNet3DConfig:
    kwargs = {}
    inf_cfg_path = model_opt.get('inference_config_path')
    if inf_cfg_path:
        inf_cfg = load_config(os.path.join(root_path, inf_cfg_path)
                              if not os.path.isabs(inf_cfg_path)
                              else inf_cfg_path)
        ak = inf_cfg.get('unet_additional_kwargs', {})
        mk = ak.get('motion_module_kwargs', {})
        kwargs.update(
            use_motion_module=ak.get('use_motion_module', True),
            motion_module_resolutions=tuple(
                ak.get('motion_module_resolutions', (1, 2, 4, 8))),
            motion_module_mid_block=ak.get('motion_module_mid_block', False),
            motion_heads=mk.get('num_attention_heads', 8),
            motion_num_transformer_block=mk.get('num_transformer_block', 1),
            motion_max_len=mk.get('temporal_position_encoding_max_len', 24),
        )
        # long-video extension: the reference plumbs long_video_config into
        # every motion module but never consumes it (reference
        # motion_module.py:60,73,106,131 — dead hook). Here it enables
        # sliding-window temporal attention for videos longer than max_len.
        lv = mk.get('long_video_config') or {}
        if lv.get('window'):
            kwargs.update(motion_window=int(lv['window']),
                          motion_window_stride=int(lv['stride'])
                          if lv.get('stride') else None)
    # diffusers config.json (block sizes etc.) from the pretrained dir
    cfg_json = (os.path.join(pretrained_path, 'unet', 'config.json')
                if pretrained_path else None)
    if cfg_json and os.path.isfile(cfg_json):
        with open(cfg_json) as f:
            dcfg = json.load(f)
        kwargs.update(
            block_out_channels=tuple(dcfg['block_out_channels']),
            layers_per_block=dcfg.get('layers_per_block', 2),
            attention_head_dim=dcfg.get('attention_head_dim', 8),
            cross_attention_dim=dcfg.get('cross_attention_dim', 768),
            norm_num_groups=dcfg.get('norm_num_groups', 32),
            sample_size=dcfg.get('sample_size', 64),
        )
    # explicit overrides (ours; enables weightless smoke configs)
    kwargs.update(model_opt.get('unet_cfg', {}))
    if 'block_out_channels' in kwargs:
        kwargs['block_out_channels'] = tuple(kwargs['block_out_channels'])
    if 'motion_module_resolutions' in kwargs:
        kwargs['motion_module_resolutions'] = tuple(
            kwargs['motion_module_resolutions'])
    return UNet3DConfig(**kwargs)


def adapter_config_from_opt(model_opt: dict, root_path: str) -> AdapterConfig:
    kwargs = {}
    p = model_opt.get('model_config_path')
    if p:
        c = load_config(os.path.join(root_path, p)
                        if not os.path.isabs(p) else p)
        kwargs.update(
            embedding_channels=c.get('embedding_channels', 1280),
            channels=tuple(c.get('channels', (320, 640, 1280, 1280))),
            downsample_rate=tuple(c.get('downsample_rate', (8, 16, 32, 64))),
            mid_dim=c.get('mid_dim', 128),
        )
    kwargs.update(model_opt.get('adapter_cfg', {}))
    if 'channels' in kwargs:
        kwargs['channels'] = tuple(kwargs['channels'])
    if 'downsample_rate' in kwargs:
        kwargs['downsample_rate'] = tuple(kwargs['downsample_rate'])
    return AdapterConfig(**kwargs)


def _torch_bin(path: str, *names: str):
    for n in names:
        p = os.path.join(path, n)
        if os.path.isfile(p):
            return converters.load_torch_file(p)
    return None


def build_models(opt: dict, root_path: str, dtype=jnp.float32,
                 init_frames: int = 2, init_size: int = 64,
                 seed: int = 0):
    """Construct unet/vae/text_encoder/adapter (+sched, tokenizer, params)."""
    logger = get_logger()
    models_opt = opt.get('models', {})
    pre = opt.get('path', {}).get('pretrained_model_path')
    if pre and not os.path.isabs(pre):
        pre = os.path.join(root_path, pre)
    if pre and not os.path.isdir(pre):
        logger.warning(f'pretrained_model_path {pre} not found; '
                       'using random init (smoke mode)')
        pre = None

    unet_cfg = unet_config_from_opt(models_opt.get('unet', {}), root_path,
                                    pre)
    unet = AnimateDiffUNet3DModel(cfg=unet_cfg, dtype=dtype)

    vae_kwargs = models_opt.get('vae_cfg', {})
    if 'block_out_channels' in vae_kwargs:
        vae_kwargs['block_out_channels'] = tuple(
            vae_kwargs['block_out_channels'])
    vae = AutoencoderKL(dtype=jnp.float32, **vae_kwargs)

    text_kwargs = models_opt.get('text_encoder_cfg', {})
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(**text_kwargs),
                                 dtype=dtype)

    adapter_cfg = adapter_config_from_opt(models_opt.get('adapter', {}),
                                          root_path)
    adapter = SparsePointAdapter(cfg=adapter_cfg, dtype=dtype)

    # noise schedule
    sched_kwargs = {}
    inf_cfg_path = models_opt.get('unet', {}).get('inference_config_path')
    if inf_cfg_path:
        inf_cfg = load_config(os.path.join(root_path, inf_cfg_path)
                              if not os.path.isabs(inf_cfg_path)
                              else inf_cfg_path)
        sched_kwargs = dict(inf_cfg.get('noise_scheduler_kwargs', {}))
    sched = make_schedule(**sched_kwargs)

    tokenizer = load_tokenizer(pre)

    # ---- params: random init, then overlay pretrained weights -------------
    key = jax.random.PRNGKey(seed)
    f, s = init_frames, init_size
    e = adapter_cfg.embedding_channels
    ctx = unet_cfg.cross_attention_dim
    params = {
        'unet': jax.jit(unet.init)(
            key, jnp.zeros((1, f, s // 8, s // 8, 4)), jnp.array([0]),
            jnp.zeros((1, 77, ctx))),
        'vae': jax.jit(vae.init)(key, jnp.zeros((1, s, s, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            key, jnp.zeros((1, 77), jnp.int32)),
        'adapter': jax.jit(lambda k, t, em: adapter.init(
            k, t, (s, s), em))(key, jnp.zeros((f, 2, 2)), jnp.zeros((2, e))),
    }

    if pre:
        sd = _torch_bin(pre, 'unet/diffusion_pytorch_model.bin')
        if sd is not None:
            motion_path = models_opt.get('unet', {}).get('motion_module_path')
            if motion_path:
                mp = (motion_path if os.path.isabs(motion_path)
                      else os.path.join(root_path, motion_path))
                if os.path.isfile(mp):
                    sd.update(converters.load_torch_file(mp))
            p, missing, unused = converters.convert_unet(
                sd, params['unet']['params'])
            logger.info(f'unet load: {len(missing)} missing, '
                        f'{len(unused)} unused torch keys')
            params['unet'] = {'params': p}
        sd = _torch_bin(pre, 'vae/diffusion_pytorch_model.bin')
        if sd is not None:
            params['vae'] = {'params': converters.convert_vae(
                sd, params['vae']['params'])}
        sd = _torch_bin(pre, 'text_encoder/pytorch_model.bin',
                        'text_encoder/model.bin')
        if sd is not None:
            params['text_encoder'] = {
                'params': converters.convert_text_encoder(
                    sd, params['text_encoder']['params'])}

    # trained adapter checkpoint (test-time, reference test.py:68-71)
    adapter_ckpt = opt.get('path', {}).get('pretrained_adapter_path')
    if adapter_ckpt:
        ap = (adapter_ckpt if os.path.isabs(adapter_ckpt)
              else os.path.join(root_path, adapter_ckpt))
        params['adapter'] = {'params': load_adapter_checkpoint(
            ap, params['adapter']['params'])}
        logger.info(f'loaded adapter checkpoint: {ap}')

    return dict(unet=unet, vae=vae, text_encoder=text_encoder,
                adapter=adapter, sched=sched, tokenizer=tokenizer,
                params=params)


def build_clip_scorer(path: str, dtype=jnp.float32):
    """openai/clip-vit-large-patch14-style local dir -> (model, params).

    Sizes the model from config.json (text_config/vision_config) and loads
    pytorch_model.bin when present; otherwise random init (smoke mode —
    logged, the scores are then only a self-consistent relative signal)."""
    from videoswap_tpu.models.clip_vision import (CLIPVisionConfig,
                                                  CLIPWithProjection)
    logger = get_logger()
    vc, tc, proj = {}, {}, 768
    cfg_file = os.path.join(path, 'config.json')
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            c = json.load(f)
        vc = c.get('vision_config', {})
        tc = c.get('text_config', {})
        proj = c.get('projection_dim', 768)
    vision_cfg = CLIPVisionConfig(
        image_size=vc.get('image_size', 224),
        patch_size=vc.get('patch_size', 14),
        hidden_size=vc.get('hidden_size', 1024),
        num_layers=vc.get('num_hidden_layers', 24),
        num_heads=vc.get('num_attention_heads', 16),
        intermediate_size=vc.get('intermediate_size', 4096),
        projection_dim=proj)
    text_cfg = CLIPTextConfig(
        vocab_size=tc.get('vocab_size', 49408),
        hidden_size=tc.get('hidden_size', 768),
        num_layers=tc.get('num_hidden_layers', 12),
        num_heads=tc.get('num_attention_heads', 12),
        max_position_embeddings=tc.get('max_position_embeddings', 77),
        intermediate_size=tc.get('intermediate_size', 3072))
    model = CLIPWithProjection(vision_cfg=vision_cfg, text_cfg=text_cfg,
                               dtype=dtype)
    s = vision_cfg.image_size
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, text_cfg.max_position_embeddings), jnp.int32))
    sd = _torch_bin(path, 'pytorch_model.bin', 'model.bin')
    if sd is not None:
        params = {'params': converters.convert_clip_full(
            sd, params['params'])}
        logger.info(f'loaded CLIP scorer weights from {path}')
    else:
        logger.warning(f'no CLIP weights at {path}; scorer is random-init '
                       '(smoke mode — clip scores are not comparable '
                       'across runs)')
    return model, params


# --------------------------------------------------------------- checkpoints
def save_adapter_checkpoint(path: str, adapter_params) -> None:
    """Adapter state as .msgpack (flax serialization). Multi-host: only
    process 0 writes (the params are global/replicated under GSPMD)."""
    from flax import serialization
    from videoswap_tpu.parallel.dist import is_main_process
    if not is_main_process():
        return
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as fh:
        fh.write(serialization.to_bytes(adapter_params))


def load_adapter_checkpoint(path: str, template):
    if path.endswith('.pth'):  # reference torch format
        sd = converters.load_torch_file(path)
        return converters.convert_adapter(sd, template)
    from flax import serialization
    with open(path, 'rb') as fh:
        return serialization.from_bytes(template, fh.read())


def save_train_state(path: str, adapter_params, opt_state,
                     global_step: int) -> None:
    """Resumable checkpoint (adapter + optimizer + step) — the reference has
    NO resume path at all (SURVEY.md §5.3); this is the TPU-native upgrade."""
    from flax import serialization
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    from videoswap_tpu.parallel.dist import is_main_process
    if not is_main_process():
        return
    blob = {
        'adapter': serialization.to_bytes(adapter_params),
        'opt_state': serialization.to_bytes(opt_state),
        'global_step': global_step,
    }
    import pickle
    with open(path, 'wb') as fh:
        pickle.dump(blob, fh)


def load_train_state(path: str, adapter_template, opt_template):
    import pickle
    from flax import serialization
    with open(path, 'rb') as fh:
        blob = pickle.load(fh)
    return (serialization.from_bytes(adapter_template, blob['adapter']),
            serialization.from_bytes(opt_template, blob['opt_state']),
            blob['global_step'])
