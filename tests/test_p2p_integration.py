"""End-to-end prompt-to-prompt flow: inversion with selective attention
store -> edit bundle -> sampling with cross/self replacement + latent
blending. 256x256 is the smallest size where the blend sites share one map
resolution (as at the reference's production sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.tokenizer import HashTokenizer

F, H, W = 2, 256, 256


@pytest.fixture(scope='module')
def pipe():
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4, motion_heads=2))
    vae = AutoencoderKL(block_out_channels=(4, 4, 8, 8), norm_groups=4)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=16))
    adapter = SparsePointAdapter(cfg=AdapterConfig(
        embedding_channels=8, channels=(8, 8, 16, 16), mid_dim=4))
    k = jax.random.PRNGKey(0)
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, F, H // 8, W // 8, 4)),
                                   jnp.array([0]), jnp.zeros((1, 77, 16))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
        'adapter': jax.jit(lambda k, t, e: adapter.init(k, t, (W, H), e))(
            k, jnp.zeros((F, 2, 2)), jnp.zeros((2, 8))),
    }
    return VideoSwapPipeline(unet=unet, vae=vae, text_encoder=text_encoder,
                             tokenizer=HashTokenizer(),
                             sched=make_schedule(), adapter=adapter,
                             params=params)


def test_blend_validation_flow(pipe, tmp_path):
    video = np.random.RandomState(0).rand(1, F, H, W, 3).astype(
        np.float32) * 2 - 1
    editing_config = {
        'use_invertion_latents': True,
        'use_blend': True,
        'visualize_attention': True,
        'num_inference_steps': 3,
        'guidance_scale': 7.5,
        'editing_prompts': {
            'swap': {'replace': 'cat -> fluffy dog',
                     'blend_cfg': {'cross_replace_steps': 0.7,
                                   'self_replace_steps': 0.7,
                                   'blend_th': 0.3}},
            'swap_defaults': {'replace': 'cat -> dog'},
        },
    }
    results = pipe.validation(video, None, 'a cat on the floor',
                              editing_config, save_dir=str(tmp_path))
    assert set(results) == {'swap', 'swap_defaults'}
    assert (tmp_path / 'swap_attention' / 'cross_attention.png').is_file()
    for frames in results.values():
        assert len(frames) == F
        arr = np.asarray(frames[0])
        assert arr.shape == (H, W, 3)

    # blending must actually change the trajectory vs no-blend
    cfg_noblend = dict(editing_config, use_blend=False,
                       editing_prompts={'swap': {'replace': 'cat -> dog'}})
    res_nb = pipe.validation(video, None, 'a cat on the floor', cfg_noblend)
    a = np.asarray(results['swap_defaults'][0], np.float32)
    b = np.asarray(res_nb['swap'][0], np.float32)
    assert np.abs(a - b).max() > 0


def test_recompute_self_stores_matches_stored(pipe):
    """The recompute path (base self maps regenerated per edit step from
    the stored pre-step inversion latents) must reproduce the stored-maps
    path exactly — same params, same inputs, same math."""
    video = np.random.RandomState(2).rand(1, F, H, W, 3).astype(
        np.float32) * 2 - 1
    base_cfg = {
        'use_invertion_latents': True,
        'use_blend': True,
        'num_inference_steps': 3,
        'guidance_scale': 7.5,
        'editing_prompts': {
            'swap': {'replace': 'cat -> fluffy dog',
                     'blend_cfg': {'cross_replace_steps': 0.4,
                                   'self_replace_steps': 0.7,
                                   'blend_th': 0.3}},
        },
    }
    stored = pipe.validation(video, None, 'a cat on the floor',
                             dict(base_cfg, recompute_self_stores=False))
    recomputed = pipe.validation(video, None, 'a cat on the floor',
                                 dict(base_cfg, recompute_self_stores=True))
    a = np.asarray(stored['swap'][0], np.float32)
    b = np.asarray(recomputed['swap'][0], np.float32)
    # uint8 frames: allow 1-level rounding jitter
    assert np.abs(a - b).max() <= 1.0, f'max diff {np.abs(a - b).max()}'
