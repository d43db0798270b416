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


def _to_float_video(frames) -> 'np.ndarray':
    """PIL list or array video -> (F, H, W, C) float in [0, 1]."""
    import numpy as np
    if isinstance(frames, (list, tuple)):
        arr = np.stack([np.asarray(f, dtype=np.float32) for f in frames])
        return arr / 255.0
    arr = np.asarray(frames, dtype=np.float32)
    if arr.ndim == 5:  # (B, F, H, W, C)
        arr = arr[0]
    if arr.min() < -0.01:  # [-1, 1] pixel convention
        arr = (arr + 1.0) / 2.0
    elif arr.max() > 1.5:  # uint8 range
        arr = arr / 255.0
    return np.clip(arr, 0.0, 1.0)


def _make_clip_scorer(opt: dict, root_path: str, tokenizer):
    """Optional CLIP scorer from `path.clip_model_path` (a local
    openai/clip-vit-large-patch14-style dir). Returns a
    `score(frames, prompt) -> float` callable or None."""
    import jax
    import numpy as np

    path = opt.get('path', {}).get('clip_model_path')
    if not path:
        return None
    if not os.path.isabs(path):
        path = os.path.join(root_path, path)
    logger = get_logger()
    if not os.path.isdir(path):
        logger.warning(f'clip_model_path {path} missing; skipping '
                       'CLIP scores')
        return None
    from videoswap_tpu.builders import build_clip_scorer
    from videoswap_tpu.models.clip_vision import preprocess_frames
    model, params = build_clip_scorer(path)
    img_fn = jax.jit(lambda p, x: model.apply(p, x, method='image_embeds'))
    txt_fn = jax.jit(lambda p, i: model.apply(p, i, method='text_embeds'))
    vocab = model.text_cfg.vocab_size if model.text_cfg else 49408
    size = model.vision_cfg.image_size

    def score(frames, prompt: str) -> float:
        pix = preprocess_frames(_to_float_video(frames), image_size=size)
        ids = tokenizer(prompt, padding='max_length', truncation=True,
                        max_length=77).input_ids
        # ED-LoRA concept tokens (ids >= vocab) are unknown to vanilla CLIP
        ids = np.minimum(np.asarray(ids, np.int32), vocab - 1)
        img = img_fn(params, pix)                  # [F, D]
        txt = txt_fn(params, ids)                  # [1, D]
        s = np.maximum(np.asarray(img @ txt[0]), 0.0) * 100.0
        return float(s.mean())

    return score


def report_metrics(source_video, results: dict, save_dir: str,
                   clip_scorer=None, prompts: dict | None = None) -> dict:
    """Quality diagnostics per edit: PSNR vs the source (background/identity
    preservation proxy), temporal consistency (flicker proxy; compare
    against the source's own value, not in absolute), and — when a CLIP
    scorer is configured (path.clip_model_path) — CLIP(frame, target
    prompt), the BASELINE.md "CLIP parity" number. Logged and written to
    `metrics.json`. The reference reports no quality numbers at swap time —
    this is the measurement surface BASELINE.md's quality parity check uses.
    """
    import numpy as np

    from videoswap_tpu.utils.metrics import temporal_consistency, video_psnr

    logger = get_logger()
    prompts = prompts or {}
    src = _to_float_video(source_video)
    report = {'source': {
        'temporal_consistency_db': round(temporal_consistency(src), 3)}}
    if clip_scorer is not None and 'source' in prompts:
        report['source']['clip_score'] = round(
            clip_scorer(source_video, prompts['source']), 3)
    for key, frames in results.items():
        edit = _to_float_video(frames)
        h, w = edit.shape[1:3]
        entry = {'temporal_consistency_db':
                 round(temporal_consistency(edit), 3)}
        if src.shape[0] == edit.shape[0]:
            psnr_v = video_psnr(src[:, :h, :w], edit)
            entry['psnr_vs_source_db'] = (
                None if np.isinf(psnr_v) else round(psnr_v, 3))
        if clip_scorer is not None and key in prompts:
            entry['clip_score'] = round(clip_scorer(frames, prompts[key]), 3)
        report[key] = entry
        logger.info(f'metrics[{key}]: {entry}')
    with open(os.path.join(save_dir, 'metrics.json'), 'w') as f:
        json.dump(report, f, indent=2)
    return report


def test(root_path: str, opt_path: str, shard: str | None = None) -> None:
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

    mesh_ctx = None
    if shard:
        # multi-chip inference: tp-shard the U-Net params over a
        # (dp, sp, tp) mesh; GSPMD inserts the collectives
        import contextlib

        import jax

        from videoswap_tpu.parallel import make_mesh, shard_pipeline
        shape = tuple(int(x) for x in shard.split(','))
        assert len(shape) == 3, '--shard expects DP,SP,TP'
        mesh = make_mesh(shape)
        mesh_ctx = contextlib.ExitStack()
        mesh_ctx.enter_context(jax.set_mesh(mesh))
        pipeline = shard_pipeline(pipeline, mesh)
        logger.info(f'sharded inference over mesh (dp,sp,tp)={shape}')

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
    clip_scorer = _make_clip_scorer(opt, root_path, models['tokenizer'])
    prompts = None
    if clip_scorer is not None:
        from videoswap_tpu.pipelines.videoswap_pipeline import \
            make_target_prompt
        edit_cfg = opt['val']['editing_config']
        prompts = {'source': dataset.prompt}
        for key, swap_cfg in edit_cfg.get('editing_prompts', {}).items():
            prompts[key] = make_target_prompt(dataset.prompt, swap_cfg)
    report_metrics(source_video, results, save_dir,
                   clip_scorer=clip_scorer, prompts=prompts)
    if mesh_ctx is not None:
        mesh_ctx.close()
    logger.info(f'results saved to {save_dir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--shard', type=str, default=None,
                        help='Multi-chip inference mesh as "DP,SP,TP" '
                             '(e.g. --shard 1,1,8 tp-shards the U-Net '
                             'over 8 chips).')
    args = parser.parse_args()
    test(os.path.abspath('.'), args.opt, shard=args.shard)
