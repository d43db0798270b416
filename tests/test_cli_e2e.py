"""End-to-end CLI smoke: train.py then test.py on a synthetic dataset with
tiny random-init models — the reference's config-driven e2e validation
style (SURVEY.md §4) minus the human eyeball."""

import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TINY_MODELS = {
    'unet': {'unet_cfg': {
        'block_out_channels': [16, 32, 32, 32], 'attention_head_dim': 4,
        'cross_attention_dim': 24, 'norm_num_groups': 8, 'motion_heads': 4}},
    'adapter': {'adapter_cfg': {
        'embedding_channels': 12, 'channels': [16, 32, 32, 32],
        'mid_dim': 8}},
    'vae_cfg': {'block_out_channels': [8, 8, 16, 16], 'norm_groups': 8},
    'text_encoder_cfg': {'hidden_size': 24, 'num_layers': 1,
                         'num_heads': 4, 'intermediate_size': 32},
}


def _write_cfg(path, cfg):
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)


def test_train_then_test_cli(tmp_path):
    from scripts.make_smoke_dataset import make
    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=4, size=64)

    datasets = {
        'type': 'SingleVideoPointDataset',
        'path': str(data_dir / 'frames'),
        'tap_path': str(data_dir / 'TAP.pth'),
        'prompt': 'a cat walking on a gradient floor',
        'num_frames': 2, 'total_frames': 4,
        'video_transform': [
            {'type': 'Resize', 'size': 64},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
        ],
        'batch_size_per_gpu': 1, 'dataset_enlarge_ratio': 4,
    }
    editing_config = {
        'use_invertion_latents': True,
        'use_blend': False,
        'num_inference_steps': 2,
        'guidance_scale': 7.5,
        't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
        'visualize_point': True,
        'editing_prompts': {
            'cat2dog': {'replace': 'cat -> dog', 'select_point': None,
                        'tap_path': None},
        },
    }

    train_cfg = {
        'name': 'smoke_train', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': TINY_MODELS, 'path': {},
        'train': {
            'train_pipeline': 'VideoSwapTrainer',
            'optimizer': {'type': 'AdamW', 'lr': 5.0e-4,
                          'weight_decay': 0.01, 'betas': [0.9, 0.999]},
            'tune_cfg': {'drop_rate': 0.2, 'min_timestep': 0.5,
                         'loss_type': 'local'},
            'lr_scheduler': 'constant', 'total_iter': 3, 'warmup_iter': 0},
        'val': {'val_pipeline': 'VideoSwapPipeline', 'save_type': 'frame',
                'val_freq': 3, 'editing_config': editing_config},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 3},
    }
    cfg_path = tmp_path / 'train_smoke.yml'
    _write_cfg(cfg_path, train_cfg)

    import train as train_mod

    class Args:
        opt = str(cfg_path)
        resume = False
    train_mod.train(str(tmp_path), Args())

    exp = tmp_path / 'experiments' / 'smoke_train'
    ckpt = exp / 'models' / 'models_3' / 'adapter.msgpack'
    assert ckpt.is_file(), 'adapter checkpoint not saved'
    assert (exp / 'visualization' / 'iter_3').is_dir(), 'no validation out'

    # ---- test.py consuming the trained checkpoint -------------------------
    # tiny CLIP scorer dir: config.json only -> random-init scorer path
    # (weighted path is covered by test_clip_vision.py parity)
    clip_dir = tmp_path / 'clip'
    clip_dir.mkdir()
    import json
    with open(clip_dir / 'config.json', 'w') as f:
        json.dump({'projection_dim': 16,
                   'text_config': {'vocab_size': 49408, 'hidden_size': 16,
                                   'num_hidden_layers': 1,
                                   'num_attention_heads': 4,
                                   'max_position_embeddings': 77,
                                   'intermediate_size': 32},
                   'vision_config': {'image_size': 28, 'patch_size': 14,
                                     'hidden_size': 16,
                                     'num_hidden_layers': 1,
                                     'num_attention_heads': 4,
                                     'intermediate_size': 32}}, f)
    test_cfg = {
        'name': 'smoke_test', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': TINY_MODELS,
        'path': {'pretrained_adapter_path': str(ckpt),
                 'clip_model_path': str(clip_dir)},
        'val': {'save_type': 'frame', 'editing_config': editing_config},
    }
    tcfg_path = tmp_path / 'test_smoke.yml'
    _write_cfg(tcfg_path, test_cfg)

    import test as test_mod
    test_mod.test(str(tmp_path), str(tcfg_path))

    res = tmp_path / 'results' / 'smoke_test' / 'visualization'
    assert (res / 'source').is_dir()
    assert (res / 'cat2dog').is_dir()
    frame_files = list((res / 'cat2dog').rglob('*.jpg'))
    assert len(frame_files) == 2, f'expected 2 frames, got {frame_files}'

    # quality metrics report written alongside the videos
    with open(res / 'metrics.json') as f:
        metrics = json.load(f)
    assert {'source', 'cat2dog'} <= set(metrics)
    assert metrics['source']['temporal_consistency_db'] is not None
    assert 'psnr_vs_source_db' in metrics['cat2dog']
    # CLIP(frame, prompt) present for the source and every edit
    import numpy as np
    assert np.isfinite(metrics['source']['clip_score'])
    assert np.isfinite(metrics['cat2dog']['clip_score'])


def test_long_video_cli(tmp_path):
    """test.py on a video LONGER than the temporal-PE cap: 8 frames with
    motion_max_len=4 + a 4-frame window (stride 2) — the long-video
    sliding-window path, reached purely through the YAML surface."""
    from scripts.make_smoke_dataset import make
    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=8, size=64)

    models = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in TINY_MODELS.items()}
    models['unet'] = {'unet_cfg': dict(
        TINY_MODELS['unet']['unet_cfg'], motion_max_len=4,
        motion_window=4, motion_window_stride=2)}
    datasets = {
        'type': 'SingleVideoPointDataset',
        'path': str(data_dir / 'frames'),
        'tap_path': str(data_dir / 'TAP.pth'),
        'prompt': 'a cat walking on a gradient floor',
        'num_frames': 8, 'total_frames': 8,
        'video_transform': [
            {'type': 'Resize', 'size': 64},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
        ],
        'batch_size_per_gpu': 1,
    }
    test_cfg = {
        'name': 'smoke_long', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': models, 'path': {},
        'val': {'save_type': 'frame', 'editing_config': {
            'use_invertion_latents': True,
            'use_blend': False,
            'num_inference_steps': 2,
            'guidance_scale': 7.5,
            't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
            'editing_prompts': {
                'cat2dog': {'replace': 'cat -> dog'},
            },
        }},
    }
    tcfg_path = tmp_path / 'test_long.yml'
    _write_cfg(tcfg_path, test_cfg)

    import test as test_mod
    test_mod.test(str(tmp_path), str(tcfg_path))

    res = tmp_path / 'results' / 'smoke_long' / 'visualization'
    frame_files = list((res / 'cat2dog').rglob('*.jpg'))
    assert len(frame_files) == 8, f'expected 8 frames, got {frame_files}'


def test_sharded_cli(tmp_path):
    """`test.py --shard 1,2,4` on the virtual 8-device mesh: the multi-chip
    inference path (sp frame sharding of pixels/latents + Megatron tp U-Net
    sharding) reached purely through the CLI surface — then the SAME config
    unsharded, asserting the output frames match."""
    from scripts.make_smoke_dataset import make
    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=4, size=64)

    datasets = {
        'type': 'SingleVideoPointDataset',
        'path': str(data_dir / 'frames'),
        'tap_path': str(data_dir / 'TAP.pth'),
        'prompt': 'a cat walking on a gradient floor',
        'num_frames': 4, 'total_frames': 4,
        'video_transform': [
            {'type': 'Resize', 'size': 64},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
        ],
        'batch_size_per_gpu': 1,
    }
    test_cfg = {
        'name': 'smoke_shard', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': TINY_MODELS, 'path': {},
        'val': {'save_type': 'frame', 'editing_config': {
            'use_invertion_latents': True,
            'use_blend': False,
            'num_inference_steps': 2,
            'guidance_scale': 7.5,
            't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
            'editing_prompts': {
                'cat2dog': {'replace': 'cat -> dog'},
            },
        }},
    }
    tcfg_path = tmp_path / 'test_shard.yml'
    _write_cfg(tcfg_path, test_cfg)

    import test as test_mod
    test_mod.test(str(tmp_path), str(tcfg_path), shard='1,2,4')

    res = tmp_path / 'results' / 'smoke_shard' / 'visualization'
    frame_files = list((res / 'cat2dog').rglob('*.jpg'))
    assert len(frame_files) == 4, f'expected 4 frames, got {frame_files}'

    # ---- numerical equivalence vs the unsharded run ------------------------
    test_cfg['name'] = 'smoke_noshard'
    ncfg_path = tmp_path / 'test_noshard.yml'
    _write_cfg(ncfg_path, test_cfg)
    test_mod.test(str(tmp_path), str(ncfg_path), shard=None)
    res_ref = tmp_path / 'results' / 'smoke_noshard' / 'visualization'

    import numpy as np
    from PIL import Image
    for f in sorted((res / 'cat2dog').rglob('*.jpg')):
        ref = res_ref / 'cat2dog' / f.relative_to(res / 'cat2dog')
        a = np.asarray(Image.open(f), np.float32)
        b = np.asarray(Image.open(ref), np.float32)
        # identical math modulo GSPMD collective reduction order (the
        # CFG-half constraint reorders the motion all-to-all sums); the
        # RANDOM-init unet amplifies that fp noise chaotically over the
        # 2-step trajectory on isolated pixels (observed: 2 of 4 frames
        # bit-exact, max 12 uint8 levels on ~1.6% of one frame; the
        # 256^2 blended equivalence tests hold <= 1 level). Bound the
        # flipped fraction and mean like test_sharded_cli_blended.
        d = np.abs(a - b)
        assert (d > 4).mean() < 0.03, \
            f'{f.name}: {100 * (d > 4).mean():.2f}% pixels differ >4'
        assert d.mean() <= 0.5, f'{f.name}: sharded drifted ({d.mean()})'


def test_sharded_cli_blended(tmp_path):
    """The BLENDED production path (inversion with attention stores +
    cross/self replace + latent blending) through test.py --shard — the
    r03 verdict's gap: the sharded equivalence only ever ran with
    use_blend False. 256x256 (smallest valid blend geometry), sp frame
    sharding + tp head sharding, vs the identical unsharded run."""
    from scripts.make_smoke_dataset import make
    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=2, size=256)

    datasets = {
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
    }
    # smaller than TINY_MODELS: 256^2 inversion+edit runs twice on 1 core
    models = {
        'unet': {'unet_cfg': {
            'block_out_channels': [8, 8, 16, 16], 'attention_head_dim': 2,
            'cross_attention_dim': 16, 'norm_num_groups': 4,
            'motion_heads': 2}},
        'adapter': {'adapter_cfg': {
            'embedding_channels': 12, 'channels': [8, 8, 16, 16],
            'mid_dim': 8}},
        'vae_cfg': {'block_out_channels': [4, 4, 8, 8], 'norm_groups': 4},
        'text_encoder_cfg': {'hidden_size': 16, 'num_layers': 1,
                             'num_heads': 2, 'intermediate_size': 16},
    }
    test_cfg = {
        'name': 'smoke_shard_blend', 'manual_seed': 7,
        'mixed_precision': 'no',
        'datasets': datasets, 'models': models, 'path': {},
        'val': {'save_type': 'frame', 'editing_config': {
            'use_invertion_latents': True,
            'use_blend': True,
            'num_inference_steps': 2,
            'guidance_scale': 7.5,
            't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
            'editing_prompts': {
                'cat2dog': {'replace': 'cat -> fluffy dog',
                            'blend_cfg': {'cross_replace_steps': 0.7,
                                          'self_replace_steps': 0.7,
                                          'blend_th': 0.3}},
            },
        }},
    }
    tcfg_path = tmp_path / 'test_shard_blend.yml'
    _write_cfg(tcfg_path, test_cfg)

    import test as test_mod
    test_mod.test(str(tmp_path), str(tcfg_path), shard='1,2,4')
    res = tmp_path / 'results' / 'smoke_shard_blend' / 'visualization'
    frame_files = list((res / 'cat2dog').rglob('*.jpg'))
    assert len(frame_files) == 2, f'expected 2 frames, got {frame_files}'

    test_cfg['name'] = 'smoke_noshard_blend'
    ncfg_path = tmp_path / 'test_noshard_blend.yml'
    _write_cfg(ncfg_path, test_cfg)
    test_mod.test(str(tmp_path), str(ncfg_path), shard=None)
    res_ref = tmp_path / 'results' / 'smoke_noshard_blend' / 'visualization'

    import numpy as np
    from PIL import Image
    for f in sorted((res / 'cat2dog').rglob('*.jpg')):
        ref = res_ref / 'cat2dog' / f.relative_to(res / 'cat2dog')
        a = np.asarray(Image.open(f), np.float32)
        b = np.asarray(Image.open(ref), np.float32)
        d = np.abs(a - b)
        # the blend mask is THRESHOLDED (pooled attn > blend_th,
        # spatial_blend semantics): an fp-epsilon of GSPMD reduction-order
        # drift at a boundary pixel flips that pixel's blend source, so a
        # handful of isolated pixels may differ visibly (observed max 13
        # uint8 levels on <0.1% of pixels). Bound the flipped fraction and
        # the mean instead of the max; the exact-math check is the
        # unthresholded pipeline test (tests/test_multichip_blend.py,
        # max diff <= 1 uint8 level).
        assert (d > 4).mean() < 0.005, \
            f'{f.name}: {100 * (d > 4).mean():.2f}% pixels flipped'
        assert d.mean() <= 0.5, f'{f.name}: sharded drifted (mean {d.mean()})'
