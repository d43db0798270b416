"""Point-drag propagation driver.

Parity: /root/reference/propagate_point_displacement.py:128-177 — load a
trained atlas, read the keyframe source/target point JSONs, propagate the
displacement to every frame through the atlas Jacobians, and write an
edited `TAP_<name>.pth` consumable by test.py's per-swap `tap_path`.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

from train_atlas import build_nets, load_atlas_checkpoint
from videoswap_tpu.atlas.data import load_input_data
from videoswap_tpu.atlas.propagate import (bind_nets,
                                           propagate_point_sequence)
from videoswap_tpu.data.frame_point_dataset import load_tap_file
from videoswap_tpu.utils.config import load_config


def process_displacement_propagation(atlas_config_path: str,
                                     atlas_model_path: str,
                                     source_tap_path: str,
                                     source_point_path: str,
                                     target_point_path: str) -> dict:
    import jax
    cfg = load_config(atlas_config_path)
    nets = build_nets(cfg['models'])
    template = {}
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    for name, net in nets.items():
        template[name] = jax.jit(net.init)(key,
                                           jnp.zeros((1, net.input_dim)))
    params = load_atlas_checkpoint(atlas_model_path, template)
    fg, inv, alpha = bind_nets(nets, params)

    data = load_input_data(cfg['datasets'])
    num_frames = data['video'].shape[0]
    larger_dim = int(max(data['video'].shape[1:3]))

    def norm_s(v):
        return v / (larger_dim / 2.0) - 1.0

    def norm_t(v):
        return v / (num_frames / 2.0) - 1.0

    with open(source_point_path) as f:
        source_points = json.load(f)
    keyframe_t = int(osp.splitext(osp.basename(source_point_path))[0])
    with open(target_point_path) as f:
        target_points = json.load(f)

    tap = load_tap_file(source_tap_path)
    tracks = propagate_point_sequence(
        source_points, target_points, keyframe_t,
        np.asarray(tap['pred_tracks']), tap['point_name2id'],
        fg, inv, alpha, larger_dim, num_frames, norm_s, norm_t)
    tap['pred_tracks'] = tracks
    return tap


def save_tap(tap: dict, path: str) -> None:
    import torch
    out = {k: (torch.from_numpy(np.asarray(v))
               if isinstance(v, np.ndarray) else v)
           for k, v in tap.items()}
    torch.save(out, path)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--atlas_config_path', type=str, required=True)
    parser.add_argument('--atlas_model_path', type=str, required=True)
    parser.add_argument('--source_point_path', type=str, required=True)
    parser.add_argument('--source_tap_path', type=str, required=True)
    parser.add_argument('--target_point_path', type=str, required=True)
    args = parser.parse_args()

    tap = process_displacement_propagation(
        args.atlas_config_path, args.atlas_model_path,
        args.source_tap_path, args.source_point_path,
        args.target_point_path)

    save_dir = os.path.dirname(args.target_point_path)
    suffix = osp.splitext(osp.basename(args.target_point_path))[0]
    out_path = os.path.join(save_dir, f'TAP_{suffix}.pth')
    save_tap(tap, out_path)
    print(f'save to {out_path}')
