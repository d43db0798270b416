"""Adapter training driver: `python train.py -opt options/train_.../x.yml`.

Parity: /root/reference/train.py:24-259 — same YAML schema, experiment-dir
layout, print/val/checkpoint cadence. TPU-native differences: the whole
train step is one jitted, donated function; RNG is an explicit threaded
key seeded from `manual_seed`; `--resume` restores adapter+optimizer+step
(the reference restarts from scratch, SURVEY.md §5.3).
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.builders import (build_models, load_train_state,
                                    save_adapter_checkpoint,
                                    save_train_state)
from videoswap_tpu.data import build_dataset
from videoswap_tpu.data.frame_point_dataset import infinite_batches
from videoswap_tpu.pipelines import VideoSwapPipeline, VideoSwapTrainer
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import (MessageLogger, dict2str, get_logger,
                                        set_path_logger)
from videoswap_tpu.utils.vis_util import save_video_to_dir


def train(root_path: str, args) -> None:
    # multi-host: init the process group BEFORE any backend use (the
    # reference's Accelerator(...) DDP init, train.py:29-31); single
    # process is a no-op
    from videoswap_tpu.parallel.dist import (is_main_process,
                                             maybe_initialize_distributed)
    maybe_initialize_distributed(getattr(args, 'distributed', False))

    opt = load_config(args.opt)
    set_path_logger(root_path, args.opt, opt, is_train=True,
                    reuse_existing=getattr(args, 'resume', False))
    logger = get_logger()
    logger.info(dict2str(opt))

    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        logger.info(f'manual_seed not set, using {seed}')
    np.random.seed(seed)

    dtype = {'fp16': jnp.bfloat16, 'bf16': jnp.bfloat16,
             'no': jnp.float32}.get(opt.get('mixed_precision', 'no'),
                                    jnp.float32)

    dataset_opt = opt['datasets']
    dataset = build_dataset(dataset_opt)

    models = build_models(opt, root_path, dtype=dtype,
                          init_frames=dataset_opt['num_frames'],
                          init_size=dataset.size_y, seed=seed)

    train_opt = opt['train']
    trainer = VideoSwapTrainer(
        unet=models['unet'], vae=models['vae'],
        text_encoder=models['text_encoder'], tokenizer=models['tokenizer'],
        sched=models['sched'], adapter=models['adapter'],
        params={k: v for k, v in models['params'].items() if k != 'adapter'},
        tune_cfg=train_opt.get('tune_cfg', {}),
        optimizer_cfg=train_opt.get('optimizer', {}),
        max_grad_norm=train_opt.get('max_grad_norm'))

    adapter_params = models['params']['adapter']['params']
    opt_state = trainer.init_state(adapter_params)
    total_iter = int(train_opt['total_iter'])
    global_step = 0

    # checkpoint backend: 'msgpack' (reference-parity flat files, default)
    # or 'orbax' (async step-indexed manager w/ retention + sharding-aware
    # restore — utils/checkpointing.py)
    ckpt_backend = opt['logger'].get('checkpoint_backend', 'msgpack')
    ckpt_mgr = None
    if ckpt_backend == 'orbax':
        from videoswap_tpu.utils.checkpointing import CheckpointManager
        ckpt_mgr = CheckpointManager(
            os.path.join(opt['path']['models'], 'orbax'),
            max_to_keep=int(opt['logger'].get('max_to_keep', 3)))

    resume_path = os.path.join(opt['path']['models'], 'train_state.pkl')
    if args.resume and ckpt_mgr is not None and \
            ckpt_mgr.latest_step() is not None:
        restored = ckpt_mgr.restore(template={
            'adapter': adapter_params, 'opt_state': opt_state,
            'global_step': 0})
        adapter_params = restored['adapter']
        opt_state = restored['opt_state']
        global_step = int(restored['global_step'])
        logger.info(f'resumed from orbax step {global_step}')
    elif args.resume and os.path.isfile(resume_path):
        adapter_params, opt_state, global_step = load_train_state(
            resume_path, adapter_params, opt_state)
        logger.info(f'resumed from step {global_step}')

    # static per-video batch: tokenized prompt + conditions
    batch0 = dataset[0]
    batch = {
        'pixels': jnp.asarray(batch0['pixels'])[None],
        'input_ids': jnp.asarray(models['tokenizer'](
            [batch0['prompt']], padding='max_length',
            max_length=models['tokenizer'].model_max_length,
            truncation=True).input_ids),
        'pred_tracks': jnp.asarray(batch0['pred_tracks']),
        'point_embedding': jnp.asarray(batch0['point_embedding']),
    }
    if train_opt.get('cache_vae_latents', True):
        # the dataset replays ONE cached video, so the deterministic VAE
        # encoder pass is loop-invariant: encode the posterior moments
        # once and let the train step draw fresh samples from them —
        # byte-identical to re-encoding, minus ~20% step time
        from videoswap_tpu.models.vae import AutoencoderKL
        mean, logvar = jax.jit(lambda p, x: models['vae'].apply(
            p, x, method=AutoencoderKL.encode_video_moments))(
            models['params']['vae'], batch.pop('pixels'))
        batch['latent_mean'], batch['latent_logvar'] = mean, logvar
        logger.info('cached VAE posterior moments (single-video loop)')
    yielder = infinite_batches(dataset)

    logger_msg = MessageLogger(opt, global_step)
    rng = jax.random.PRNGKey(seed)
    from videoswap_tpu.utils.profiling import StepTimer
    timer = StepTimer(sync=True)
    print_freq = int(opt['logger'].get('print_freq', 10))
    save_freq = int(float(opt['logger'].get('save_checkpoint_freq', 10000)))
    val_freq = int(opt.get('val', {}).get('val_freq', 10 ** 9))
    lr = float(train_opt.get('optimizer', {}).get('lr', 5e-4))

    while global_step < total_iter:
        next(yielder)  # parity: epoch cycling (single cached video)
        rng, step_rng = jax.random.split(rng)
        timer.start()
        adapter_params, opt_state, loss = trainer.step(
            adapter_params, opt_state, batch, step_rng)
        timer.stop(loss)
        global_step += 1

        if global_step % print_freq == 0:
            logger_msg({'iter': global_step, 'lrs': [lr],
                        'total_loss': jax.device_get(loss),
                        'step_time': timer.times[-1]})

        if global_step % val_freq == 0 and 'val' in opt:
            run_validation(opt, models, dataset, adapter_params,
                           global_step, dtype)

        if global_step % save_freq == 0 or global_step == total_iter:
            mdir = os.path.join(opt['path']['models'],
                                f'models_{global_step}')
            save_adapter_checkpoint(
                os.path.join(mdir, 'adapter.msgpack'), adapter_params)
            if ckpt_mgr is not None:
                ckpt_mgr.save(global_step, {
                    'adapter': adapter_params, 'opt_state': opt_state,
                    'global_step': global_step})
            else:
                save_train_state(resume_path, adapter_params, opt_state,
                                 global_step)
            logger.info(f'saved checkpoint at step {global_step}')

    if ckpt_mgr is not None:
        ckpt_mgr.close()       # drain the async save thread before exit
    s = timer.summary()
    if s:
        logger.info(
            f'step time: mean {s["mean_s"]:.3f}s  p50 {s["p50_s"]:.3f}s  '
            f'p90 {s["p90_s"]:.3f}s over {s["steps"]} steps '
            f'(total {s["total_s"]:.1f}s)')
    logger.info('training done')


def run_validation(opt, models, dataset, adapter_params, global_step,
                   dtype) -> None:
    logger = get_logger()
    logger.info(f'validation at step {global_step}')
    params = dict(models['params'])
    params['adapter'] = {'params': adapter_params}
    pipeline = VideoSwapPipeline(
        unet=models['unet'], vae=models['vae'],
        text_encoder=models['text_encoder'], tokenizer=models['tokenizer'],
        sched=models['sched'], adapter=models['adapter'], params=params)
    results = pipeline.validation(
        source_video=dataset.get_frames(),
        source_conditions=dataset.get_conditions(),
        source_prompt=dataset.prompt,
        editing_config=opt['val']['editing_config'],
        train_dataset=dataset,
        save_dir=opt['path']['visualization'])
    save_dir = os.path.join(opt['path']['visualization'],
                            f'iter_{global_step}')
    save_type = opt['val'].get('save_type', 'frame_gif')
    from videoswap_tpu.parallel.dist import is_main_process
    if is_main_process():                 # IO once (reference train.py:210)
        for key, frames in results.items():
            save_video_to_dir(frames, os.path.join(save_dir, key),
                              save_suffix=key, save_type=save_type)
    logger.info(f'validation saved to {save_dir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the latest train_state.pkl')
    parser.add_argument('--distributed', action='store_true',
                        help='multi-host: jax.distributed.initialize() '
                             '(or set JAX_COORDINATOR_ADDRESS / '
                             'NUM_PROCESSES / PROCESS_ID env vars)')
    args = parser.parse_args()
    train(os.path.abspath('.'), args)
