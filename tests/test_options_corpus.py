"""The full ported options corpus loads and builds (VERDICT r01 #3).

Every train/test videoswap config: YAML parses, the model configs resolve
(including the shared model_cfg ymls), the lr schedule builds, and every
editing prompt constructs its full static edit state (prompt replacement,
seq_aligner mappers, time-gated alpha schedule, blend-site geometry at the
config's resolution, store filter) through the SAME code paths test.py uses.
Every atlas config: all IMLP model blocks build, loss weights are known.

This catches schema drift across all 60+ recipes (replace/replace_other,
per-swap guidance/negative_prompt/t2i scale, select_point, blend_cfg,
tap_path overrides, local-blend variants)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoswap_tpu.p2p.sites as sites
from videoswap_tpu.builders import (adapter_config_from_opt,
                                    unet_config_from_opt)
from videoswap_tpu.p2p.edit import (inversion_store_filter,
                                    make_edit_bundle, want_recompute_self)
from videoswap_tpu.pipelines import VideoSwapTrainer
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.tokenizer import HashTokenizer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWAP_CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, 'options/train_videoswap/**/*.yml'),
              recursive=True) +
    glob.glob(os.path.join(ROOT, 'options/test_videoswap/**/*.yml'),
              recursive=True))
ATLAS_CONFIGS = sorted(
    p for p in glob.glob(
        os.path.join(ROOT, 'options/train_videoswap/**/*atlas*.yml'),
        recursive=True)) + [os.path.join(ROOT,
                                         'options/train_atlas/atlas_swan.yml')]
SWAP_CONFIGS = [p for p in SWAP_CONFIGS if 'atlas' not in p]

assert len(SWAP_CONFIGS) >= 60, f'corpus incomplete: {len(SWAP_CONFIGS)}'
assert len(ATLAS_CONFIGS) >= 6, f'atlas corpus incomplete: {len(ATLAS_CONFIGS)}'

_built_unet_cfgs = {}


def _resolution(opt) -> tuple[int, int]:
    for t in opt['datasets'].get('video_transform', []):
        if t['type'] == 'Resize':
            s = t['size']
            if isinstance(s, (list, tuple)):
                return int(s[0]), int(s[1])
            return int(s), int(s)
    return 512, 512


def _dummy_inversion(names_cross, names_self, n_steps, h8, w8, frames=2,
                     heads=1, w77=77):
    """Zero inversion stores shaped exactly like the sampler's sow output.
    numpy (not jnp) so the 50-step arrays stay virtual."""
    attn = {}
    all_sites = {s.name: s for s in sites.all_sites('cross')}
    all_sites.update({s.name: s for s in sites.all_sites('self')})
    for n in names_cross:
        s = sites.site_tokens(all_sites[n], h8, w8)
        attn[n] = np.zeros((n_steps, frames, heads, s, w77), np.float32)
    for n in names_self:
        s = sites.site_tokens(all_sites[n], h8, w8)
        attn[n] = np.zeros((n_steps, frames, heads, s, s), np.float32)
    lat = np.zeros((n_steps, 1, frames, h8, w8, 4), np.float32)
    return lat, attn


@pytest.mark.parametrize('path', SWAP_CONFIGS,
                         ids=[os.path.basename(p) for p in SWAP_CONFIGS])
def test_swap_config_builds(path):
    opt = load_config(path)
    tokenizer = HashTokenizer()

    # ---- model configs resolve (incl. shared model_cfg ymls) --------------
    unet_cfg = unet_config_from_opt(opt['models']['unet'], ROOT, None)
    adapter_cfg = adapter_config_from_opt(opt['models']['adapter'], ROOT)
    assert unet_cfg.block_out_channels == (320, 640, 1280, 1280)
    assert adapter_cfg.embedding_channels == 1280
    assert adapter_cfg.downsample_rate == (8, 16, 32, 64)

    # ---- train section (absent in inference-only configs) -----------------
    tr = opt.get('train')
    if tr:
        assert tr['optimizer'].pop('type', 'AdamW') == 'AdamW'
        VideoSwapTrainer.build_lr_schedule(
            tr.get('lr_scheduler', 'constant'),
            float(tr['optimizer']['lr']), int(tr['total_iter']),
            int(tr.get('warmup_iter', 0)))
        tune = tr.get('tune_cfg', {})
        assert set(tune) <= {'drop_rate', 'min_timestep', 'loss_type'}
        if 'loss_type' in tune:
            assert tune['loss_type'] in ('global', 'local')

    # ---- every editing prompt builds its static edit state ----------------
    ec = opt['val']['editing_config']
    height, width = _resolution(opt)
    h8, w8 = height // 8, width // 8
    steps = int(ec.get('num_inference_steps', 50))
    source_prompt = opt['datasets']['prompt']
    use_blend = ec.get('use_blend', False)

    if use_blend:
        # the inversion pass must know what to capture across ALL swaps;
        # when the projected self-store exceeds budget the filter skips
        # self sites and the bundle must take the recompute path instead
        # (exactly how the pipeline wires it, videoswap_pipeline.py:501-563)
        recompute = want_recompute_self(ec, height, width, 16, steps)
        filt = inversion_store_filter(ec, tokenizer, height, width)
        stored_cross = [s.name for s in sites.all_sites('cross')
                        if filt(s, sites.site_tokens(s, h8, w8))]
        stored_self = [s.name for s in sites.all_sites('self')
                       if filt(s, sites.site_tokens(s, h8, w8))]
        lat, attn = _dummy_inversion(stored_cross, stored_self, steps,
                                     h8, w8)

    for key, swap in ec.get('editing_prompts', {}).items():
        src, tgt = [s.strip() for s in swap['replace'].split('->')]
        assert src in source_prompt, f'{key}: {src!r} not in source prompt'
        target_prompt = source_prompt.replace(src, tgt)
        if 'replace_other' in swap:
            so, to = [s.strip() for s in swap['replace_other'].split('->')]
            assert so in target_prompt
            target_prompt = target_prompt.replace(so, to)
        if swap.get('lora_path'):
            p, alpha = swap['lora_path'].rsplit('---', 1)
            # alpha up to 1.2 ships in the human configs (thanos ED-LoRA)
            assert p.endswith('.pth') and 0 < float(alpha) <= 2.0
        gs = swap.get('guidance_scale', ec.get('guidance_scale', 7.5))
        assert float(swap.get('t2i_guidance_scale',
                              ec.get('t2i_guidance_scale', 1.0))) <= 1.0

        if not use_blend:
            continue
        bundle = make_edit_bundle(
            tokenizer, source_prompt, target_prompt,
            num_steps=steps, video_length=2, height=height, width=width,
            inv_latents_per_step=lat, inv_attn_store=attn,
            blend_words=[src.split(' '), tgt.split(' ')],
            blend_cfg=swap.get('blend_cfg', {}) or {},
            do_cfg=gs > 1.0, recompute_self=recompute,
            inv_z0=lat[0], inv_ts=np.arange(steps))
        cfg = bundle.cfg
        assert cfg.blend_latents
        assert bundle.static_state['alpha_layers'].shape == (2, 77)
        # reference builds num_steps+1 entries (ptp_utils.py:110-135)
        assert bundle.static_state['alpha_words'].shape[0] == steps + 1
        # every needed site has a reversed per-step array
        for n in cfg.blend_site_names:
            assert bundle.xs['base_cross'][n].shape[0] == steps
        bc = swap.get('blend_cfg', {}) or {}
        if bc.get('self_replace_steps', 0.0):
            assert cfg.blend_self
            if cfg.recompute_self:
                assert 'inv_lat_pre' in bundle.xs and 'inv_t' in bundle.xs
                assert bundle.xs['inv_lat_pre'].shape[0] == steps
            else:
                assert 'base_self' in bundle.xs
        if bc.get('cross_replace_steps', 0.0):
            assert cfg.cross_active


@pytest.mark.parametrize('path', ATLAS_CONFIGS,
                         ids=[os.path.basename(p) for p in ATLAS_CONFIGS])
def test_atlas_config_builds(path):
    from videoswap_tpu.atlas.imlp import imlp_from_opt
    opt = load_config(path)
    assert {'FG_UV_Mapping', 'BG_UV_Mapping', 'F_Alpha',
            'F_Atlas'} <= set(opt['models'])
    for name, mcfg in opt['models'].items():
        mcfg = dict(mcfg)
        mcfg.pop('mlp_type', None)
        mcfg.pop('fp16', None)
        model = imlp_from_opt(mcfg)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((4, mcfg['input_dim'])))
        out = jax.eval_shape(
            model.apply, shapes,
            jnp.zeros((4, mcfg['input_dim'])))
        assert out.shape == (4, mcfg['output_dim'])
    # the nested loss groups the atlas trainer consumes (atlas/trainer.py)
    known = {
        'reconstruction_loss': {'rgb_loss_weight', 'gradient_loss_weight',
                                'alpha_loss_weight'},
        'rigidity_loss': {'rigidity_loss_weight',
                          'global_rigidity_fg_loss_weight',
                          'global_rigidity_bg_loss_weight'},
        'flow_loss': {'flow_loss_weight', 'alpha_flow_loss_weight'},
        'sparsity_loss': {'sparsity_loss_weight'},
    }
    loss_cfg = opt['train'].get('loss_cfg', {})
    assert set(loss_cfg) <= set(known), \
        f'unknown atlas loss groups: {set(loss_cfg) - set(known)}'
    for g, sub in loss_cfg.items():
        assert set(sub) <= known[g], \
            f'unknown {g} keys: {set(sub) - known[g]}'
