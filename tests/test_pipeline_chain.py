"""Five-workload chain (SURVEY.md §0): the reference's full user journey
composed end to end on synthetic data, every artifact flowing through the
real on-disk formats —

1. semantic point extraction  -> TAP.pth   (native tracker + embeddings)
2. optical flow               -> *.npy     (scripts/extract_flow.py main)
3. atlas training             -> .msgpack  (train_atlas.py CLI)
   + point-drag propagation   -> TAP_edit  (propagate_point_displacement)
4. adapter training           -> adapter   (train.py CLI)
5. swap inference             -> frames    (test.py CLI, per-swap tap_path
                                            consuming the PROPAGATED TAP)

Each stage is covered in isolation elsewhere; this test pins the
inter-stage contracts (TAP tensor-dict schema, flow npy layout, atlas
checkpoint format, per-swap tap override) the reference's shell workflow
relies on (/root/reference/README.md pipeline;
extract_semantic_point.py:229, scripts/extract_flow.py:136-149,
train_atlas.py:54-98, propagate_point_displacement.py:128-146).
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tests.test_cli_e2e import TINY_MODELS  # noqa: E402

H = W = 64
FRAMES = 4


class _PatchFeaturizer:
    """5x5 mean-centered patch descriptors (the SD-weight-free stand-in
    used across the preprocess tests)."""

    def forward(self, image: np.ndarray, prompt: str) -> np.ndarray:
        g = np.asarray(image, np.float32).mean(-1)
        h, w = g.shape
        pad = np.pad(g, 2, mode='edge')
        feats = np.stack([pad[dy:dy + h, dx:dx + w]
                          for dy in range(5) for dx in range(5)], axis=-1)
        return (feats - feats.mean(-1, keepdims=True)).astype(np.float32)


def _make_video(data_dir):
    """Textured blob translating over a textured background + masks."""
    rs = np.random.RandomState(3)
    fdir = os.path.join(data_dir, 'frames')
    mdir = os.path.join(data_dir, 'masks')
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)
    bg = rs.rand(H, W, 3).astype(np.float32)
    for _ in range(2):
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)
              + np.roll(bg, 2, 0) + np.roll(bg, 2, 1)) / 5
    tex = rs.rand(24, 24, 3).astype(np.float32) * 0.5 + 0.5
    tex[::4] *= 0.4                           # stripes: trackable texture
    centers = []
    for i in range(FRAMES):
        cx, cy = 20 + 6 * i, 28 + 2 * i
        centers.append((cx, cy))
        img = bg.copy() * 0.6
        img[cy - 12:cy + 12, cx - 12:cx + 12] = tex
        mask = np.zeros((H, W), np.float32)
        mask[cy - 12:cy + 12, cx - 12:cx + 12] = 1.0
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(fdir, f'{i:05d}.png'))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(mdir, f'{i:05d}.png'))
    return fdir, mdir, centers


@pytest.mark.slow
def test_five_workload_chain(tmp_path):
    data_dir = str(tmp_path / 'data')
    fdir, mdir, centers = _make_video(data_dir)

    # ---- workload 1: semantic point extraction -> TAP.pth ---------------
    from extract_semantic_point import (extract_point_embedding,
                                        propagate_general_keypoint,
                                        save_tap)
    anno_path = os.path.join(data_dir, '00000.json')
    cx0, cy0 = centers[0]
    anno = {'head': [float(cy0 - 5), float(cx0 + 5)],    # [y, x] reference
            'tail': [float(cy0 + 5), float(cx0 - 5)]}    # annotation format
    with open(anno_path, 'w') as f:
        json.dump(anno, f)
    feat = _PatchFeaturizer()
    tap = propagate_general_keypoint(fdir, anno_path, feat, 'toy')
    tap = extract_point_embedding(tap, fdir, anno_path, feat, 'toy',
                                  is_human=False)
    # tracks must ride the blob: frame i center displaced by (6i, 2i)
    for i in range(FRAMES):
        gt = np.asarray(
            [[cx0 + 5 + 6 * i, cy0 - 5 + 2 * i],
             [cx0 - 5 + 6 * i, cy0 + 5 + 2 * i]], np.float32)
        err = np.abs(tap['pred_tracks'][i] - gt).max()
        assert err <= 2.0, f'frame {i} track err {err}'
    assert tap['point_embedding'].shape == (2, 25)
    tap_path = os.path.join(data_dir, 'TAP.pth')
    save_tap(tap, tap_path)

    # ---- workload 2: optical flow -> npy ---------------------------------
    from scripts.extract_flow import main as flow_main
    flow_dir = os.path.join(data_dir, 'flows')
    flow_main(fdir, flow_dir)
    fl = np.load(os.path.join(flow_dir, '00000.npy'))
    assert fl.shape == (2, H, W, 2)
    # inside the blob the flow must match its (6, 2) motion
    cy, cx = centers[0][1], centers[0][0]
    blob_flow = np.median(
        fl[0][cy - 8:cy + 8, cx - 8:cx + 8], axis=(0, 1))
    assert np.allclose(blob_flow, [6, 2], atol=1.0), blob_flow

    # ---- workload 3: atlas training + displacement propagation ----------
    atlas_cfg = {
        'name': 'chain_atlas', 'manual_seed': 0, 'mixed_precision': 'no',
        'datasets': {
            'frame_path': fdir, 'mask_path': mdir, 'flow_path': flow_dir,
            'res_x': W, 'res_y': H, 'max_frames': FRAMES,
            'filter_optical_flow': True},
        'models': {
            n: {'input_dim': 3, 'output_dim': 2, 'hidden_dim': 32,
                'pe_type': 'none', 'pe_dim': 2, 'mlp_type': 'origin',
                'mlp_layers': 3, 'skip_layers': []}
            for n in ('FG_UV_Mapping', 'BG_UV_Mapping')},
        'path': {},
        'train': {
            'optimizer': {'type': 'Adam', 'lr': 1.0e-3},
            'total_iter': 120, 'sample_batch_size': 512,
            'pretrain_UV_mapping_iter': 40, 'pretrain_alpha_iter': 100,
            'pretrain_global_rigidity_iter': 5, 'uv_mapping_scale': 0.8,
            'derivative_amount': 1, 'global_derivative_amount': 4,
            'loss_cfg': {
                'reconstruction_loss': {'rgb_loss_weight': 5000.0,
                                        'gradient_loss_weight': 1000.0,
                                        'alpha_loss_weight': 2000.0},
                'sparsity_loss': {'sparsity_loss_weight': 1000.0},
                'rigidity_loss': {'rigidity_loss_weight': 1.0,
                                  'global_rigidity_fg_loss_weight': 5.0,
                                  'global_rigidity_bg_loss_weight': 50.0},
                'flow_loss': {'flow_loss_weight': 5.0,
                              'alpha_flow_loss_weight': 49.0}}},
        'val': {'val_freq': 120},
        'logger': {'print_freq': 40, 'save_checkpoint_freq': 120},
    }
    atlas_cfg['models']['F_Alpha'] = {
        'input_dim': 3, 'output_dim': 1, 'hidden_dim': 32,
        'pe_type': 'encoding', 'pe_dim': 2, 'mlp_type': 'origin',
        'mlp_layers': 3, 'skip_layers': []}
    atlas_cfg['models']['F_Atlas'] = {
        'input_dim': 2, 'output_dim': 3, 'hidden_dim': 32,
        'pe_type': 'hash_encoding', 'pe_dim': 4, 'mlp_type': 'origin',
        'mlp_layers': 3, 'skip_layers': [], 'hash_levels': 4,
        'log2_hashmap_size': 10}
    atlas_cfg['models']['FG_UV_Mapping_Inverse'] = {
        'input_dim': 3, 'output_dim': 3, 'hidden_dim': 32,
        'pe_type': 'none', 'pe_dim': 2, 'mlp_type': 'origin',
        'mlp_layers': 3, 'skip_layers': []}
    acfg_path = tmp_path / 'atlas.yml'
    with open(acfg_path, 'w') as f:
        yaml.safe_dump(atlas_cfg, f)

    import train_atlas

    class AArgs:
        opt = str(acfg_path)
    train_atlas.train(str(tmp_path), AArgs())
    ckpt = (tmp_path / 'experiments' / 'chain_atlas' / 'models'
            / 'models_120.msgpack')
    assert ckpt.is_file(), 'atlas checkpoint not saved'

    # drag both points by (+4, -2) px on the keyframe, propagate
    from propagate_point_displacement import (
        process_displacement_propagation)
    tgt_path = os.path.join(data_dir, 'edit.json')
    with open(tgt_path, 'w') as f:
        json.dump({k: [v[0] - 2.0, v[1] + 4.0] for k, v in anno.items()},
                  f)
    tap_edit = process_displacement_propagation(
        str(acfg_path), str(ckpt), tap_path, anno_path, tgt_path)
    moved = np.asarray(tap_edit['pred_tracks'][0]) - np.asarray(
        tap['pred_tracks'][0])
    assert np.all(np.abs(moved).sum(-1) > 0.5), \
        f'propagation did not move the keyframe points: {moved}'
    tap_edit_path = os.path.join(data_dir, 'TAP_edit.pth')
    save_tap(tap_edit, tap_edit_path)

    # ---- workload 4: adapter training (train.py CLI) ---------------------
    models = yaml.safe_load(yaml.safe_dump(TINY_MODELS))  # deep copy
    models['adapter']['adapter_cfg']['embedding_channels'] = 25
    datasets = {
        'type': 'SingleVideoPointDataset', 'path': fdir,
        'tap_path': tap_path, 'prompt': 'a toy block sliding',
        'num_frames': 2, 'total_frames': FRAMES,
        'video_transform': [
            {'type': 'Resize', 'size': W},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]}],
        'batch_size_per_gpu': 1, 'dataset_enlarge_ratio': 2,
    }
    editing_config = {
        'use_invertion_latents': True, 'use_blend': False,
        'num_inference_steps': 2, 'guidance_scale': 7.5,
        't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
        'editing_prompts': {
            'block2brick': {'replace': 'block -> brick',
                            'select_point': None,
                            'tap_path': tap_edit_path}},
    }
    train_cfg = {
        'name': 'chain_train', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': models, 'path': {},
        'train': {
            'train_pipeline': 'VideoSwapTrainer',
            'optimizer': {'type': 'AdamW', 'lr': 5.0e-4,
                          'weight_decay': 0.01, 'betas': [0.9, 0.999]},
            'tune_cfg': {'drop_rate': 0.2, 'min_timestep': 0.5,
                         'loss_type': 'local'},
            'lr_scheduler': 'constant', 'total_iter': 2, 'warmup_iter': 0},
        'val': {'val_pipeline': 'VideoSwapPipeline', 'save_type': 'frame',
                'val_freq': 10 ** 9, 'editing_config': editing_config},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 2},
    }
    tcfg = tmp_path / 'chain_train.yml'
    with open(tcfg, 'w') as f:
        yaml.safe_dump(train_cfg, f)
    import train as train_mod

    class TArgs:
        opt = str(tcfg)
        resume = False
    train_mod.train(str(tmp_path), TArgs())
    adapter_ckpt = (tmp_path / 'experiments' / 'chain_train' / 'models'
                    / 'models_2' / 'adapter.msgpack')
    assert adapter_ckpt.is_file()

    # ---- workload 5: swap inference consuming the PROPAGATED TAP --------
    test_cfg = {
        'name': 'chain_test', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': datasets, 'models': models,
        'path': {'pretrained_adapter_path': str(adapter_ckpt)},
        'val': {'save_type': 'frame', 'editing_config': editing_config},
    }
    scfg = tmp_path / 'chain_test.yml'
    with open(scfg, 'w') as f:
        yaml.safe_dump(test_cfg, f)
    import test as test_mod
    test_mod.test(str(tmp_path), str(scfg))
    res = tmp_path / 'results' / 'chain_test' / 'visualization'
    frames_out = list((res / 'block2brick').rglob('*.jpg'))
    assert len(frames_out) == 2, frames_out
