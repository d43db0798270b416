"""Swap inference driver: `python test.py -opt options/test_.../x.yml`.

Parity: /root/reference/test.py:24-126 — builds the pipeline (U-Net +
motion weights, adapter + trained checkpoint, optional persistent ED-LoRA
concepts), runs `validation()` over the config's editing prompts, saves the
source video and every edit.
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp

from videoswap_tpu.builders import build_models
from videoswap_tpu.data import build_dataset
from videoswap_tpu.pipelines import VideoSwapPipeline
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import (dict2str, get_logger,
                                        set_path_logger)
from videoswap_tpu.utils.vis_util import save_video_to_dir


def test(root_path: str, opt_path: str) -> None:
    opt = load_config(opt_path)
    set_path_logger(root_path, opt_path, opt, is_train=False)
    logger = get_logger()
    logger.info(dict2str(opt))

    dtype = {'fp16': jnp.bfloat16, 'bf16': jnp.bfloat16,
             'no': jnp.float32}.get(opt.get('mixed_precision', 'no'),
                                    jnp.float32)

    dataset_opt = opt['datasets']
    dataset = build_dataset(dataset_opt)

    models = build_models(opt, root_path, dtype=dtype,
                          init_frames=dataset_opt['num_frames'],
                          init_size=dataset.size_y,
                          seed=opt.get('manual_seed', 0))

    pipeline = VideoSwapPipeline(
        unet=models['unet'], vae=models['vae'],
        text_encoder=models['text_encoder'], tokenizer=models['tokenizer'],
        sched=models['sched'], adapter=models['adapter'],
        params=models['params'])

    # persistent ED-LoRA concepts (reference test.py:82-86)
    concept_cfg = opt.get('path', {}).get('new_concept_cfg')
    if concept_cfg:
        with open(os.path.join(root_path, concept_cfg)) as f:
            new_concept_cfg = json.load(f)
        from videoswap_tpu.edlora import apply_new_concept_cfg
        apply_new_concept_cfg(pipeline, new_concept_cfg)

    source_video = dataset.get_frames()
    source_conditions = dataset.get_conditions()

    results = pipeline.validation(
        source_video=source_video,
        source_conditions=source_conditions,
        source_prompt=dataset.prompt,
        editing_config=opt['val']['editing_config'],
        train_dataset=dataset,
        save_dir=opt['path']['visualization'])

    save_dir = opt['path']['visualization']
    save_type = opt['val'].get('save_type', 'frame_gif')
    save_video_to_dir(source_video, os.path.join(save_dir, 'source'),
                      save_suffix='source', save_type=save_type)
    for key, frames in results.items():
        save_video_to_dir(frames, os.path.join(save_dir, key),
                          save_suffix=key, save_type=save_type)
    logger.info(f'results saved to {save_dir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    args = parser.parse_args()
    test(os.path.abspath('.'), args.opt)
