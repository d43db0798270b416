"""ED-LoRA training vertical: init semantics, in-graph merge vs consumer
parity, the full train -> save -> convert -> merge -> sample round trip,
and the CLI entry point.

Reference surfaces: LoRALinearLayer init
(/root/reference/videoswap/utils/edlora_util.py:199-226) and the
checkpoint schema convert_edlora consumes
(/root/reference/videoswap/utils/convert_edlora_to_diffusers.py:82-105).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videoswap_tpu.edlora import (encode_edlora_prompt,
                                  load_edlora_into_pipeline,
                                  merge_lora_into_params, restore_pipeline)
from videoswap_tpu.edlora_train import (EDLoRATrainer, init_concept_embedding,
                                        init_lora_params, lora_sites,
                                        merge_lora, register_concepts,
                                        save_edlora_checkpoint,
                                        tokenize_layer_prompts)
from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                  SparsePointAdapter, UNet3DConfig)
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.schedulers import make_schedule
from videoswap_tpu.utils.tokenizer import HashTokenizer

HID = 24
UNET_CFG = UNet3DConfig(block_out_channels=(16, 32, 32, 32),
                        attention_head_dim=4, cross_attention_dim=HID,
                        norm_num_groups=8, use_motion_module=False)
TEXT_CFG = CLIPTextConfig(hidden_size=HID, num_layers=1, num_heads=4,
                          intermediate_size=32)


@pytest.fixture(scope='module')
def models():
    unet = AnimateDiffUNet3DModel(cfg=UNET_CFG)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16), norm_groups=8)
    text_encoder = CLIPTextModel(cfg=TEXT_CFG)
    k = jax.random.PRNGKey(0)
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, 1, 8, 8, 4)),
                                   jnp.array([0]), jnp.zeros((1, 77, HID))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
    }
    return dict(unet=unet, vae=vae, text_encoder=text_encoder,
                params=params, sched=make_schedule())


def test_site_enumeration(models):
    u = lora_sites(models['params']['unet']['params'], 'unet', 'attn')
    t = lora_sites(models['params']['text_encoder']['params'],
                   'text_encoder', 'attn')
    # 16 spatial transformer blocks in SD topology at layers_per_block=2:
    # down 3 blocks x 2 + mid 1 + up 3 blocks x 3 = 16; x2 attn x4 proj
    assert len(u) == 16 * 2 * 4
    assert len(t) == TEXT_CFG.num_layers * 4
    assert all(not s.is_conv for s in u)
    assert not any('motion' in s.torch_key for s in u)
    some = {s.torch_key for s in u}
    assert ('down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_q'
            '.weight') in some
    assert all(k.startswith('text_model.encoder.layers.') for k in
               (s.torch_key for s in t))
    # 'full' scope adds FFN + proj_in/out (conv sites)
    full = lora_sites(models['params']['unet']['params'], 'unet', 'full')
    assert len(full) > len(u)
    assert any(s.is_conv for s in full)


def test_init_semantics_and_zero_start(models):
    """kaiming-uniform bound on down, zero up => merged == base exactly."""
    base = models['params']['unet']['params']
    sites = lora_sites(base, 'unet', 'attn')
    lora = init_lora_params(jax.random.PRNGKey(1), base, sites, rank=2)
    for site in sites[:4]:
        p = lora[site.torch_key]
        in_f = p['down'].shape[1]
        bound = 1.0 / np.sqrt(in_f)
        assert np.abs(np.asarray(p['down'])).max() <= bound
        assert np.asarray(p['up']).sum() == 0.0
    merged = merge_lora(base, lora, sites, alpha=1.0)
    a = jax.tree_util.tree_leaves(base)
    b = jax.tree_util.tree_leaves(merged)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_merge_matches_consumer_roundtrip(models, tmp_path):
    """save_edlora_checkpoint -> torch load -> edlora.merge_lora_into_params
    must equal the in-graph merge_lora (trainer and pipeline agree on what
    a checkpoint means), including 'full' scope conv sites."""
    base = models['params']['unet']['params']
    sites = lora_sites(base, 'unet', 'full')
    k = jax.random.PRNGKey(2)
    lora = init_lora_params(k, base, sites, rank=2)
    # non-trivial factors
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(k, x.shape, x.dtype), lora)

    tbase = models['params']['text_encoder']['params']
    tsites = lora_sites(tbase, 'text_encoder', 'full')
    tlora = init_lora_params(k, tbase, tsites, rank=2)
    tlora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(k, x.shape, x.dtype), tlora)

    train_params = {'concept_emb': {'catA1': jnp.zeros((16, HID))},
                    'unet_lora': lora, 'text_lora': tlora}
    path = tmp_path / 'edlora_model-latest.pth'
    save_edlora_checkpoint(str(path), train_params, sites, tsites)

    sd = torch.load(path, map_location='cpu', weights_only=False)
    assert set(sd) == {'new_concept_embedding', 'unet', 'text_encoder'}
    assert sd['new_concept_embedding']['catA1'].shape == (16, HID)

    alpha = 0.7
    merged_consumer, n = merge_lora_into_params(base, sd['unet'], 'unet',
                                                alpha)
    assert n == len(sites)
    merged_train = merge_lora(base, lora, sites, alpha)
    for x, y in zip(jax.tree_util.tree_leaves(merged_consumer),
                    jax.tree_util.tree_leaves(merged_train)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    from videoswap_tpu.models.converters import clip_key_map
    merged_tc, n = merge_lora_into_params(tbase, sd['text_encoder'],
                                          'text_encoder', alpha,
                                          key_map=clip_key_map)
    assert n == len(tsites)
    merged_tt = merge_lora(tbase, tlora, tsites, alpha)
    for x, y in zip(jax.tree_util.tree_leaves(merged_tc),
                    jax.tree_util.tree_leaves(merged_tt)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def _trainer(models, scope='attn'):
    unet_sites = lora_sites(models['params']['unet']['params'], 'unet',
                            scope)
    text_sites = lora_sites(models['params']['text_encoder']['params'],
                            'text_encoder', scope)
    return EDLoRATrainer(
        unet=models['unet'], text_encoder=models['text_encoder'],
        vae=models['vae'], sched=models['sched'],
        params=models['params'], unet_sites=unet_sites,
        text_sites=text_sites, alpha=1.0,
        tune_cfg={'attn_impl': 'xla'},
        optimizer_cfg={'emb_lr': 1e-2, 'lora_lr': 1e-3},
        max_grad_norm=1.0)


def test_train_save_merge_sample_roundtrip(models, tmp_path):
    """The VERDICT 'done' criterion: train a tiny concept N steps -> save
    -> convert -> merge -> sample; loss decreases and the merged sample
    moves in the concept direction."""
    tokenizer = HashTokenizer()
    cfg = register_concepts(tokenizer, ['catA1'])
    emb0 = init_concept_embedding(
        models['params']['text_encoder']['params'], tokenizer, 'cat')
    assert emb0.shape == (16, HID)

    trainer = _trainer(models)
    rng = jax.random.PRNGKey(0)
    train_params = trainer.init_train_params(rng, {'catA1': emb0}, rank=2)
    opt_state = trainer.init_state(train_params)

    ids = jnp.asarray(tokenize_layer_prompts(
        tokenizer, 'a photo of a catA1', cfg))
    assert ids.shape == (16, 77)
    pixels = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 64, 64, 3),
                                minval=-1, maxval=1)
    batch = {'input_ids': ids, 'pixels': pixels}

    losses = []
    for i in range(12):
        rng, k = jax.random.split(rng)
        train_params, opt_state, loss = trainer.step(train_params, opt_state,
                                                     batch, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    # factors actually moved
    up_norm = sum(float(jnp.abs(v['up']).sum())
                  for v in train_params['unet_lora'].values())
    assert up_norm > 0
    emb_moved = float(jnp.abs(train_params['concept_emb']['catA1']
                              - emb0).max())
    assert emb_moved > 0

    # ---- save -> load through the PIPELINE consumer -> sample
    ckpt = tmp_path / 'edlora_model-latest.pth'
    save_edlora_checkpoint(str(ckpt), jax.device_get(train_params),
                           trainer.unet_sites, trainer.text_sites)

    adapter = SparsePointAdapter(cfg=AdapterConfig(
        embedding_channels=12, channels=(16, 32, 32, 32), mid_dim=8))
    aparams = jax.jit(lambda k, t, e: adapter.init(k, t, (64, 64), e))(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 2)), jnp.zeros((2, 12)))
    pipe = VideoSwapPipeline(
        unet=models['unet'], vae=models['vae'],
        text_encoder=models['text_encoder'], tokenizer=HashTokenizer(),
        sched=models['sched'], adapter=adapter,
        params=dict(models['params'], adapter=aparams))

    base_lat = pipe.sample('a photo of a catA1', video_length=1, height=64,
                           width=64, num_inference_steps=2,
                           guidance_scale=7.5, output_type='latent')
    ctx = load_edlora_into_pipeline(pipe, str(ckpt), alpha=1.0)
    assert pipe.new_concept_cfg is not None
    emb = encode_edlora_prompt(pipe, ['a photo of a catA1'])
    assert emb.shape == (1, 16, 77, HID)
    lora_lat = pipe.sample('a photo of a catA1', video_length=1, height=64,
                           width=64, num_inference_steps=2,
                           guidance_scale=7.5, output_type='latent')
    assert np.isfinite(np.asarray(lora_lat)).all()
    # the merged model + trained concept tokens change the sample
    assert float(jnp.abs(lora_lat - base_lat).max()) > 1e-6
    restore_pipeline(pipe, ctx)


def test_cli_entry(tmp_path, monkeypatch):
    """train_edlora.py -opt runs end to end on the smoke config shape and
    emits a checkpoint + new_concept_cfg.json."""
    import sys

    from PIL import Image

    import train_edlora

    img_dir = tmp_path / 'concepts'
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (72, 72, 3), np.uint8)).save(
            img_dir / f'{i}.png')
    (img_dir / '0.txt').write_text('a photo of a catA1')
    (img_dir / '1.txt').write_text('a catA1 on the grass')

    import yaml
    with open('options/smoke/train_edlora_smoke.yml') as f:
        opt = yaml.safe_load(f)
    opt['datasets']['image_dir'] = str(img_dir)
    del opt['datasets']['caption_template']   # exercise sidecar captions
    opt['name'] = 'smoke_edlora_test'
    cfg_path = tmp_path / 'edlora.yml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(opt, f)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, 'argv',
                        ['train_edlora.py', '-opt', str(cfg_path)])
    args = type('A', (), {'opt': str(cfg_path)})()
    train_edlora.train(str(tmp_path), args)

    import glob
    ckpts = glob.glob(str(tmp_path / 'experiments' / 'smoke_edlora_test'
                          / 'models' / '*' / 'edlora_model-latest.pth'))
    assert ckpts, 'no checkpoint written'
    sd = torch.load(ckpts[0], map_location='cpu', weights_only=False)
    assert 'catA1' in sd['new_concept_embedding']
    assert any(k.endswith('.lora_up.weight') for k in sd['unet'])
    assert any(k.startswith('text_model.') for k in sd['text_encoder'])
