"""The blended/p2p production path under sharding (VERDICT r03 weak #1).

The path BENCH times as 'blended production' — inversion with attention
stores + cross-replace + self-replace + latent blending — carries edit
tensors and stores through the scan while sp shards the frame axis and tp
shards attention heads; both slice axes the store/edit tensors index.
This asserts the sharded run reproduces the single-device run end to end
on the virtual 8-device CPU mesh, through the same `validation()` surface
test.py drives (reference pipeline_videoswap.py:272-423).

256x256 is the smallest size where the blend sites share one map
resolution (same constraint as the reference; tests/test_p2p_integration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.parallel import make_mesh, shard_pipeline
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.tokenizer import HashTokenizer

F, H, W = 2, 256, 256

EDITING_CONFIG = {
    'use_invertion_latents': True,
    'use_blend': True,
    'num_inference_steps': 2,
    'guidance_scale': 7.5,
    't2i_guidance_scale': 0.5,
    't2i_start': 0.0,
    't2i_end': 0.5,
    'editing_prompts': {
        'swap': {'replace': 'cat -> fluffy dog',
                 'blend_cfg': {'cross_replace_steps': 0.7,
                               'self_replace_steps': 0.7,
                               'blend_th': 0.3}},
    },
}


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


@pytest.fixture(scope='module')
def video():
    return np.random.RandomState(0).rand(1, F, H, W, 3).astype(
        np.float32) * 2 - 1


@pytest.fixture(scope='module')
def conditions():
    return {
        'pred_tracks': np.array([[[40.0, 50.0], [120.0, 160.0]],
                                 [[44.0, 52.0], [118.0, 158.0]]],
                                np.float32),
        'point_embedding': np.random.RandomState(1).randn(2, 8).astype(
            np.float32),
        'point_name2id': {'head': 0, 'body': 1},
        'img_size': (W, H),
        'index_list': None,
    }


@pytest.fixture(scope='module')
def ref_frames(pipe, video, conditions):
    return pipe.validation(video, conditions, 'a cat on the floor',
                           EDITING_CONFIG)


@pytest.mark.parametrize('shape', [(1, 2, 4), (1, 1, 8), (2, 2, 2)])
def test_blended_edit_sharded_matches_single_device(pipe, video, conditions,
                                                    ref_frames, shape):
    mesh = make_mesh(shape)
    with jax.set_mesh(mesh):
        sh_pipe = shard_pipeline(pipe, mesh)
        sh = sh_pipe.validation(video, conditions, 'a cat on the floor',
                                EDITING_CONFIG)
    assert set(sh) == set(ref_frames) == {'swap'}
    for a, b in zip(ref_frames['swap'], sh['swap']):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # identical math modulo GSPMD reduction order; uint8 frames leave
        # at most a rounding level of jitter
        assert np.abs(a - b).max() <= 1.0, \
            f'sharded blended edit drifted: max {np.abs(a - b).max()}'
