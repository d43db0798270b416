"""Golden end-to-end regression guard.

A fixed-seed tiny pipeline run whose latent output is pinned to an on-disk
fixture. Parity-vs-reference is proven elsewhere (literal-restatement
tests); THIS test catches silent numeric drift introduced by kernel or
pipeline rewrites — any change that moves the end-to-end output by more
than float-noise must be deliberate (regenerate with
`python tests/test_golden.py`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.tokenizer import HashTokenizer

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'golden_sample.npz')


def _build():
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
        cross_attention_dim=24, norm_num_groups=8, motion_heads=4))
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16), norm_groups=8)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        vocab_size=49408, hidden_size=24, num_layers=1, num_heads=4,
        intermediate_size=32))
    adapter = SparsePointAdapter(cfg=AdapterConfig(
        embedding_channels=12, channels=(16, 32, 32, 32), mid_dim=8))
    k = jax.random.PRNGKey(7)
    f, h, w = 2, 64, 64
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, f, h // 8, w // 8, 4)),
                                   jnp.array([0]), jnp.zeros((1, 77, 24))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, h, w, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
        'adapter': jax.jit(lambda k, t, e: adapter.init(k, t, (w, h), e))(
            k, jnp.zeros((f, 3, 2)), jnp.zeros((3, 12))),
    }
    return VideoSwapPipeline(
        unet=unet, vae=vae, text_encoder=text_encoder,
        tokenizer=HashTokenizer(), sched=make_schedule(), adapter=adapter,
        params=params)


def _run():
    pipe = _build()
    conditions = {
        'pred_tracks': np.array(
            [[[10.0, 12.0], [30.0, 40.0], [50.0, 20.0]],
             [[12.0, 14.0], [28.0, 38.0], [-1.0, -1.0]]], np.float32),
        'point_embedding': np.random.RandomState(3).randn(3, 12).astype(
            np.float32),
        'point_name2id': {'head': 0, 'body': 1, 'tail': 2},
        'index_list': None,
    }
    out = pipe.sample('a cat with a red bell', video_length=2, height=64,
                      width=64, num_inference_steps=4, guidance_scale=7.5,
                      negative_prompt='ugly', conditions=conditions,
                      t2i_guidance_scale=0.8, t2i_start=0.0, t2i_end=0.6,
                      rng=jax.random.PRNGKey(11), output_type='latent')
    return np.asarray(out, np.float32)


def test_golden_sample_unchanged():
    got = _run()
    ref = np.load(FIXTURE)['latent']
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


if __name__ == '__main__':
    # regenerate the fixture (deliberate behavior changes only)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, latent=_run())
    print(f'wrote {FIXTURE}')
