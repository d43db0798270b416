"""Converter hardening against the REAL checkpoint key sets.

Synthetic state dicts carry the exact key list + shapes of the production
checkpoints (tests/fixtures/sd15_keys.py, authored from the diffusers /
AnimateDiff naming rules — NOT from our flax trees). A real chilloutmix /
mm_sd_v14 load succeeds iff these pass with zero missing and zero unused
keys (VERDICT r01 next-step #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.models import converters

from fixtures.sd15_keys import (mm_sd_v14_state_shapes,
                                sd15_unet_state_shapes,
                                sd_vae_state_shapes)


def _fake_sd(shapes: dict) -> dict:
    return {k: np.zeros(s, np.float32) for k, s in shapes.items()}


def _eval_params(init_fn, *args):
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


@pytest.fixture(scope='module')
def unet_params():
    model = AnimateDiffUNet3DModel(cfg=UNet3DConfig())   # full SD-1.5 size
    return _eval_params(model.init, jnp.zeros((1, 2, 8, 8, 4)),
                        jnp.array([0]), jnp.zeros((1, 77, 768)))


def test_unet_sd15_keys_complete(unet_params):
    """SD-1.5 2D weights alone: every non-motion flax param is filled;
    missing == exactly the motion modules (from_pretrained_2d semantics,
    reference unet.py:510-517); zero unused torch keys."""
    sd = _fake_sd(sd15_unet_state_shapes())
    params, missing, unused = converters.convert_unet(
        sd, unet_params['params'], strict=True)
    assert not unused, f'unused SD-1.5 unet keys: {unused[:10]}'
    assert missing and all('motion_modules' in k for k in missing), \
        f'non-motion missing keys: {[k for k in missing if "motion_modules" not in k][:10]}'


def test_unet_with_mm_sd_v14_zero_missing(unet_params):
    """SD-1.5 + mm_sd_v14 merged (reference train.py:74-76): nothing missing,
    nothing unused (pos_encoder.pe is sinusoidal, computed not stored)."""
    sd = _fake_sd(sd15_unet_state_shapes())
    sd.update(_fake_sd(mm_sd_v14_state_shapes()))
    params, missing, unused = converters.convert_unet(
        sd, unet_params['params'], strict=True)
    assert not missing, f'missing keys: {missing[:10]}'
    assert not unused, f'unused keys: {unused[:10]}'


@pytest.mark.parametrize('legacy', [False, True])
def test_vae_sd_keys_complete(legacy):
    """Both the modern (to_q/...) and deprecated (query/key/value/proj_attn)
    VAE attention layouts load with zero missing / zero unused."""
    vae = AutoencoderKL()                                # full SD size
    params = _eval_params(vae.init, jnp.zeros((1, 32, 32, 3)))
    sd = _fake_sd(sd_vae_state_shapes(legacy_attention=legacy))
    out, missing, unused = converters.convert_vae_diag(sd, params['params'])
    assert not missing, f'missing VAE keys: {missing[:10]}'
    assert not unused, f'unused VAE keys: {unused[:10]}'


def test_clip_text_real_keys_complete():
    """Key list straight from transformers' CLIPTextModel at the SD-1.5
    text-encoder config (CLIP-L/14): zero missing / zero unused. Includes
    the position_ids buffer old exports carry."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    hf_cfg = HFConfig(vocab_size=49408, hidden_size=768,
                      intermediate_size=3072, num_hidden_layers=12,
                      num_attention_heads=12, max_position_embeddings=77,
                      hidden_act='quick_gelu')
    hf = HFModel(hf_cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # old transformers exports persist this buffer; must be tolerated
    sd['text_model.embeddings.position_ids'] = np.arange(77)[None]

    model = CLIPTextModel(cfg=CLIPTextConfig())          # SD-1.5 defaults
    params = _eval_params(model.init, jnp.zeros((1, 77), jnp.int32))
    out, missing, unused = converters.convert_state_dict(
        sd, params['params'], key_map=converters.clip_key_map, strict=False)
    assert not missing, f'missing CLIP keys: {missing[:10]}'
    assert not unused, f'unused CLIP keys: {unused[:10]}'
