"""Combined ED-LoRA + prompt-to-prompt blended path — the reference's
flagship inference combination: a customized concept (16-layer embedding
slices inside CONTROLLED cross-attention) running simultaneously with
cross-replace + self-replace + spatial latent blending.

Reference surfaces: /root/reference/test.py:82-110 (per-swap lora_path +
blend config), videoswap/utils/p2p_utils/attention_register.py:146-156
(EDLoRA_AttnControlProcessor: per-layer embedding slice THEN controller
probability rewrite at the same site), pipeline_videoswap.py:312-320
(transient concept merge) + :348-359 (controller setup per swap).

The checkpoint is produced by train_edlora.py (the real producer path) on
smoke weights; the swap runs through test.py's CLI surface at 256^2 (the
smallest valid blend geometry) with 5 steps so the latent-blend window
[start_blend=1, end_blend=4) actually fires.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# one tiny model family shared by the ED-LoRA trainer and the swap
# pipeline: LoRA merge requires identical unet/text kernel shapes
HID = 16
MODELS = {
    'unet': {'unet_cfg': {
        'block_out_channels': [8, 8, 16, 16], 'attention_head_dim': 2,
        'cross_attention_dim': HID, 'norm_num_groups': 4,
        'motion_heads': 2}},
    'adapter': {'adapter_cfg': {
        'embedding_channels': 12, 'channels': [8, 8, 16, 16],
        'mid_dim': 8}},
    'vae_cfg': {'block_out_channels': [4, 4, 8, 8], 'norm_groups': 4},
    'text_encoder_cfg': {'hidden_size': HID, 'num_layers': 1,
                         'num_heads': 2, 'intermediate_size': 16},
}

BLEND_CFG = {'cross_replace_steps': 0.7, 'self_replace_steps': 0.6,
             'blend_th': 0.3}


@pytest.fixture(scope='module')
def edlora_ckpt(tmp_path_factory):
    """train_edlora.py on smoke weights -> edlora_model-latest.pth whose
    kernels match MODELS (the swap pipeline re-merges them at edit time)."""
    root = tmp_path_factory.mktemp('edlora_producer')
    from scripts.make_smoke_dataset import make
    make(str(root / 'data'), frames=2, size=64)

    train_cfg = {
        'name': 'blend_e2e_edlora', 'manual_seed': 3,
        'mixed_precision': 'no',
        'concepts': {'catA1': {'init_token': 'cat'}},
        'datasets': {'type': 'ConceptImageDataset',
                     'image_dir': str(root / 'data' / 'concepts'),
                     'caption_template': 'a photo of a catA1',
                     'resolution': 64},
        # no 'adapter': the ED-LoRA vertical trains the 2D U-Net only
        'models': {k: MODELS[k] for k in
                   ('unet', 'vae_cfg', 'text_encoder_cfg')},
        'path': {},
        'train': {'lora_rank': 2, 'lora_alpha': 1.0, 'lora_scope': 'attn',
                  'optimizer': {'emb_lr': 1e-2, 'lora_lr': 1e-3,
                                'weight_decay': 0.01},
                  'max_grad_norm': 1.0, 'total_iter': 4},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 4},
    }
    cfg_path = root / 'edlora.yml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(train_cfg, f)

    import train_edlora
    args = type('A', (), {'opt': str(cfg_path), 'shard': None})()
    train_edlora.train(str(root), args)

    import glob
    ckpts = glob.glob(str(root / 'experiments' / 'blend_e2e_edlora'
                          / 'models' / '*' / 'edlora_model-latest.pth'))
    assert ckpts, 'producer run wrote no checkpoint'
    return ckpts[0]


def test_edlora_blended_cli(tmp_path, edlora_ckpt):
    """test.py with a swap carrying BOTH lora_path and an active blend_cfg,
    plus a no-LoRA swap with the identical blend config sharing the same
    inversion — the previously-untested coupling."""
    from scripts.make_smoke_dataset import make
    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=2, size=256)

    test_cfg = {
        'name': 'blend_e2e', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': {
            'type': 'SingleVideoPointDataset',
            'path': str(data_dir / 'frames'),
            'tap_path': str(data_dir / 'TAP.pth'),
            'prompt': 'a cat walking on a gradient floor',
            'num_frames': 2, 'total_frames': 2,
            'video_transform': [
                {'type': 'Resize', 'size': 256},
                {'type': 'ToTensor'},
                {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
            ],
            'batch_size_per_gpu': 1,
        },
        'models': MODELS, 'path': {},
        'val': {'save_type': 'frame', 'editing_config': {
            'use_invertion_latents': True,
            'use_blend': True,
            'num_inference_steps': 5,
            'guidance_scale': 7.5,
            't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
            'editing_prompts': {
                'cat2concept': {'replace': 'cat -> catA1',
                                'lora_path': f'{edlora_ckpt}---1.0',
                                'blend_cfg': dict(BLEND_CFG)},
                'cat2dog': {'replace': 'cat -> dog',
                            'blend_cfg': dict(BLEND_CFG)},
            },
        }},
    }
    cfg_path = tmp_path / 'test_blend_lora.yml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(test_cfg, f)

    import test as test_mod
    test_mod.test(str(tmp_path), str(cfg_path))

    res = tmp_path / 'results' / 'blend_e2e' / 'visualization'
    from PIL import Image
    videos = {}
    for key in ('cat2concept', 'cat2dog'):
        files = sorted((res / key).rglob('*.jpg'))
        assert len(files) == 2, f'{key}: expected 2 frames, got {files}'
        videos[key] = np.stack(
            [np.asarray(Image.open(f), np.float32) for f in files])
        assert np.isfinite(videos[key]).all()

    # the merged concept + 16-layer embeddings change the controlled sample
    d = np.abs(videos['cat2concept'] - videos['cat2dog'])
    assert d.max() > 1.0, 'LoRA swap identical to the no-LoRA swap'

    # metrics.json covers both edits (the target prompt of the LoRA swap
    # contains the raw concept name; make_target_prompt must accept it)
    with open(res / 'metrics.json') as f:
        metrics = json.load(f)
    assert {'source', 'cat2concept', 'cat2dog'} <= set(metrics)


def test_edlora_blend_bundle_semantics(tmp_path, edlora_ckpt):
    """Host-side coupling checks the CLI can't surface: after the transient
    concept load, the p2p token machinery must resolve the concept through
    its 16-layer expansion, the prompt encode must take the [B,16,77,H]
    path, and the per-swap restore must leave the pipeline pristine."""
    import jax
    import jax.numpy as jnp

    from videoswap_tpu.edlora import (encode_edlora_prompt,
                                      load_edlora_into_pipeline,
                                      restore_pipeline)
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.p2p.edit import make_edit_bundle
    from videoswap_tpu.p2p.ptp_utils import get_word_inds
    from videoswap_tpu.pipelines import VideoSwapPipeline
    from videoswap_tpu.schedulers import make_schedule
    from videoswap_tpu.utils.tokenizer import HashTokenizer

    ucfg = MODELS['unet']['unet_cfg']
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=tuple(ucfg['block_out_channels']),
        attention_head_dim=ucfg['attention_head_dim'],
        cross_attention_dim=HID, norm_num_groups=4,
        use_motion_module=False))
    vae = AutoencoderKL(block_out_channels=(4, 4, 8, 8), norm_groups=4)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        hidden_size=HID, num_layers=1, num_heads=2, intermediate_size=16))
    k = jax.random.PRNGKey(0)
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, 1, 8, 8, 4)),
                                   jnp.array([0]),
                                   jnp.zeros((1, 77, HID))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
    }
    pipe = VideoSwapPipeline(
        unet=unet, vae=vae, text_encoder=text_encoder,
        tokenizer=HashTokenizer(), sched=make_schedule(),
        params=params)
    pristine_unet = pipe.params['unet']

    src = 'a cat walking on a gradient floor'
    tgt = 'a catA1 walking on a gradient floor'

    ctx = load_edlora_into_pipeline(pipe, edlora_ckpt, alpha=1.0)

    # 16 per-layer tokens registered, and the concept resolves through the
    # layer-0 expansion at its word position (BOS at 0 -> index 2)
    assert pipe.new_concept_cfg is not None
    names = pipe.new_concept_cfg['catA1']['concept_token_names']
    assert names == [f'<catA1_{i}>' for i in range(16)]
    inds = get_word_inds(tgt, 'catA1', pipe.tokenizer)
    np.testing.assert_array_equal(inds, [2])

    # prompt encode takes the layered path; per-layer rows differ because
    # each layer sees a different concept token embedding
    emb = encode_edlora_prompt(pipe, [tgt])
    assert emb.shape == (1, 16, 77, HID)
    layer_spread = float(jnp.abs(emb[0, 0] - emb[0, 8]).max())
    assert layer_spread > 1e-6, 'layer variants collapsed'
    # a concept-free prompt expands to 16 identical rows (negative-prompt
    # tiling semantics)
    emb_src = encode_edlora_prompt(pipe, [src])
    np.testing.assert_array_equal(np.asarray(emb_src[0, 0]),
                                  np.asarray(emb_src[0, 8]))

    # the LoRA actually changed merged kernels (trained up-factors nonzero)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(pristine_unet),
            jax.tree_util.tree_leaves(pipe.params['unet'])))
    assert moved, 'merge was a no-op: checkpoint carried zero deltas'

    # the edit bundle builds against the concept-aware tokenizer: the
    # cross-replace alpha schedule gates the concept token's position
    steps, f, size = 5, 2, 256
    h8 = w8 = size // 8
    from videoswap_tpu.p2p import sites as p2p_sites
    cross_s = [s for s in p2p_sites.all_sites('cross')
               if p2p_sites.site_tokens(s, h8, w8)
               < p2p_sites.CTRL_MAX_TOKENS]
    self_s = [s for s in p2p_sites.all_sites('self')
              if p2p_sites.site_tokens(s, h8, w8)
              < p2p_sites.CTRL_MAX_TOKENS]
    heads = ucfg['attention_head_dim']
    inv_attn = {}
    for s in cross_s:
        tok = p2p_sites.site_tokens(s, h8, w8)
        inv_attn[s.name] = jnp.ones((steps, f, heads, tok, 77)) / 77
    for s in self_s:
        tok = p2p_sites.site_tokens(s, h8, w8)
        inv_attn[s.name] = jnp.ones((steps, f, heads, tok, tok)) / tok
    bundle = make_edit_bundle(
        pipe.tokenizer, src, tgt, num_steps=steps, video_length=f,
        height=size, width=size,
        inv_latents_per_step=jnp.zeros((steps, 1, f, h8, w8, 4)),
        inv_attn_store=inv_attn,
        blend_words=[['cat'], ['catA1']], blend_cfg=dict(BLEND_CFG))
    assert bundle.cfg.cross_active and bundle.cfg.blend_self
    # blend word selection hits exactly the concept token position
    alpha_tgt = np.asarray(bundle.static_state['alpha_layers'][1])
    np.testing.assert_array_equal(np.nonzero(alpha_tgt)[0], [2])
    # refinement mapper aligns the concept position to the source 'cat'
    mapper = np.asarray(bundle.static_state['mapper'])
    alphas = np.asarray(bundle.static_state['alphas'])
    assert alphas[2] == 0.0, 'concept token should refine, not copy source'
    assert mapper[1] == 1 and alphas[1] == 1.0, 'shared context must map'

    # restore: pristine params, tokenizer cfg cleared, plain encode again
    restore_pipeline(pipe, ctx)
    assert pipe.new_concept_cfg is None
    assert getattr(pipe.tokenizer, 'new_concept_cfg', None) is None
    for a, b in zip(jax.tree_util.tree_leaves(pristine_unet),
                    jax.tree_util.tree_leaves(pipe.params['unet'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert pipe.encode_prompt([src]).shape == (1, 77, HID)


def test_recompute_self_faithful_under_edlora(tmp_path, edlora_ckpt):
    """recompute_self during an ED-LoRA swap must regenerate the inversion
    self maps with the INVERSION-time (pristine) U-Net and text embedding
    — not the merged concept weights — so it reproduces the stored-maps
    path exactly, as it does without LoRA
    (tests/test_p2p_integration.py::test_recompute_self_stores_matches_stored)."""
    import jax
    import jax.numpy as jnp

    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.pipelines import VideoSwapPipeline
    from videoswap_tpu.schedulers import make_schedule
    from videoswap_tpu.utils.tokenizer import HashTokenizer

    ucfg = MODELS['unet']['unet_cfg']
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=tuple(ucfg['block_out_channels']),
        attention_head_dim=ucfg['attention_head_dim'],
        cross_attention_dim=HID, norm_num_groups=4, motion_heads=2))
    vae = AutoencoderKL(block_out_channels=(4, 4, 8, 8), norm_groups=4)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        hidden_size=HID, num_layers=1, num_heads=2, intermediate_size=16))
    k = jax.random.PRNGKey(0)
    f, size = 2, 256
    params = {
        'unet': jax.jit(unet.init)(
            k, jnp.zeros((1, f, size // 8, size // 8, 4)),
            jnp.array([0]), jnp.zeros((1, 77, HID))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
    }
    pipe = VideoSwapPipeline(
        unet=unet, vae=vae, text_encoder=text_encoder,
        tokenizer=HashTokenizer(), sched=make_schedule(), params=params)

    video = np.random.RandomState(4).rand(1, f, size, size, 3).astype(
        np.float32) * 2 - 1
    base_cfg = {
        'use_invertion_latents': True,
        'use_blend': True,
        'num_inference_steps': 3,
        'guidance_scale': 7.5,
        'editing_prompts': {
            'swap': {'replace': 'cat -> catA1',
                     'lora_path': f'{edlora_ckpt}---1.0',
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
    assert np.abs(a - b).max() <= 1.0, f'max diff {np.abs(a - b).max()}'
