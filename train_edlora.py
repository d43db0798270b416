"""ED-LoRA subject-finetuning driver: `python train_edlora.py -opt x.yml`.

Produces the checkpoint the swap pipeline consumes per-edit
(`lora_path: <exp>/models/edlora_model-latest.pth---<alpha>` in
test configs) — the reference only ships the *consumer*
(/root/reference/videoswap/utils/convert_edlora_to_diffusers.py:82-105);
training itself lives in Mix-of-Show. Recipe: per-layer concept
embeddings (16x768, init from a class noun) + rank-r LoRA factors on
unet/text-encoder attention projections, one jit-compiled optax step
(videoswap_tpu/edlora_train.py).

Config schema (same house style as train.py):

    name: 8101_edlora_catA
    manual_seed: 0
    mixed_precision: bf16
    path: {pretrained_model_path: pretrained_models/chilloutmix}
    concepts:
      catA1: {init_token: cat}        # captions refer to the concept
                                      # by this name (tokens <catA1_i>)
    datasets:
      type: ConceptImageDataset
      image_dir: datasets/concepts/catA
      caption_template: a photo of a catA1
      resolution: 512
    models: {unet: {...}, ...}        # as train.py; motion modules are
                                      # forced OFF (2D SD finetuning)
    train:
      lora_rank: 4
      lora_alpha: 1.0
      lora_scope: attn                # or 'full'
      optimizer: {emb_lr: 1.e-3, lora_lr: 1.e-4}
      max_grad_norm: 1.0
      total_iter: 100
    logger: {print_freq: 10, save_checkpoint_freq: 100}
"""

from __future__ import annotations

import argparse
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.builders import build_models
from videoswap_tpu.data import build_dataset
from videoswap_tpu.edlora_train import (EDLoRATrainer, init_concept_embedding,
                                        lora_sites, register_concepts,
                                        save_edlora_checkpoint,
                                        tokenize_layer_prompts)
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import (MessageLogger, dict2str, get_logger,
                                        set_path_logger)


def train(root_path: str, args) -> None:
    opt = load_config(args.opt)
    set_path_logger(root_path, args.opt, opt, is_train=True)
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

    dataset = build_dataset(opt['datasets'])
    res = dataset.pixels.shape[1]

    # ED-LoRA finetunes the 2D SD U-Net: motion modules OFF (their keys
    # never appear in an ED-LoRA checkpoint; the swap pipeline re-merges
    # the factors into the full 3D model at edit time)
    opt = dict(opt)
    opt['models'] = dict(opt.get('models', {}))
    unet_opt = dict(opt['models'].get('unet', {}))
    unet_opt['unet_cfg'] = dict(unet_opt.get('unet_cfg', {}),
                                use_motion_module=False)
    opt['models']['unet'] = unet_opt
    models = build_models(opt, root_path, dtype=dtype, init_frames=1,
                          init_size=res, seed=seed)
    tokenizer = models['tokenizer']

    # ---- concepts: tokens + warm-start embeddings (registration order
    # defines the extra-embedding row order — keep dicts in config order)
    concepts = opt['concepts']
    new_concept_cfg = register_concepts(tokenizer, list(concepts))
    concept_emb = {
        name: init_concept_embedding(
            models['params']['text_encoder']['params'], tokenizer,
            c.get('init_token', name))
        for name, c in concepts.items()}
    logger.info(f'registered concepts: '
                f'{[c["concept_token_names"][0] for c in new_concept_cfg.values()]} ...')

    train_opt = opt['train']
    scope = train_opt.get('lora_scope', 'attn')
    unet_sites = lora_sites(models['params']['unet']['params'], 'unet',
                            scope)
    text_sites = lora_sites(models['params']['text_encoder']['params'],
                            'text_encoder', scope)
    logger.info(f'LoRA sites: unet {len(unet_sites)}, '
                f'text_encoder {len(text_sites)} (scope={scope})')

    trainer = EDLoRATrainer(
        unet=models['unet'], text_encoder=models['text_encoder'],
        vae=models['vae'], sched=models['sched'],
        params={k: models['params'][k]
                for k in ('unet', 'vae', 'text_encoder')},
        unet_sites=unet_sites, text_sites=text_sites,
        alpha=float(train_opt.get('lora_alpha', 1.0)),
        tune_cfg=train_opt.get('tune_cfg', {}),
        optimizer_cfg=train_opt.get('optimizer', {}),
        max_grad_norm=train_opt.get('max_grad_norm'))

    rng = jax.random.PRNGKey(seed)
    rng, k_init = jax.random.split(rng)
    train_params = trainer.init_train_params(
        k_init, concept_emb, rank=int(train_opt.get('lora_rank', 4)))
    opt_state = trainer.init_state(train_params)

    if getattr(args, 'shard', None):
        # Megatron tp over the frozen unet/text-encoder kernels; factors
        # and embeddings replicated (sharded step == single-device step,
        # tests/test_edlora_shard.py). The batch is one image, so tp is
        # the only axis with work to split.
        from videoswap_tpu.edlora_train import shard_edlora_trainer
        from videoswap_tpu.parallel import make_mesh, replicate_tree
        n = int(args.shard)
        avail = len(jax.devices())
        if avail < n:
            raise SystemExit(
                f'--shard {n} requested but only {avail} device(s) are '
                f'visible; run unsharded or set '
                f'XLA_FLAGS=--xla_force_host_platform_device_count={n} '
                f'JAX_PLATFORMS=cpu for a virtual mesh')
        mesh = make_mesh((1, 1, n), devices=jax.devices()[:n])
        trainer = shard_edlora_trainer(trainer, mesh)
        train_params = replicate_tree(train_params, mesh)
        opt_state = replicate_tree(opt_state, mesh)
        logger.info(f'ED-LoRA training tp-sharded over {n} devices')

    # ---- static per-image batches: layer-variant ids + cached VAE moments
    ids_all = np.stack([
        tokenize_layer_prompts(tokenizer, dataset[i]['caption'],
                               new_concept_cfg)
        for i in range(len(dataset))])                     # (N, 16, 77)
    from videoswap_tpu.models.vae import AutoencoderKL
    pixels = jnp.asarray(dataset.pixels)[:, None]          # (N, 1, H, W, 3)
    mean, logvar = jax.jit(lambda p, x: models['vae'].apply(
        p, x, method=AutoencoderKL.encode_video_moments))(
        models['params']['vae'], pixels)
    mean, logvar = jax.device_get(mean), jax.device_get(logvar)
    logger.info(f'cached VAE posterior moments for {len(dataset)} images')

    logger_msg = MessageLogger(opt, 0)
    from videoswap_tpu.utils.profiling import StepTimer
    timer = StepTimer(sync=True)
    total_iter = int(train_opt['total_iter'])
    print_freq = int(opt['logger'].get('print_freq', 10))
    save_freq = int(float(opt['logger'].get('save_checkpoint_freq',
                                            total_iter)))

    order = np.random.permutation(len(dataset))
    for global_step in range(1, total_iter + 1):
        i = int(order[(global_step - 1) % len(dataset)])
        if global_step % len(dataset) == 0:
            order = np.random.permutation(len(dataset))
        batch = {
            'input_ids': jnp.asarray(ids_all[i]),
            'latent_mean': jnp.asarray(mean[i:i + 1]),
            'latent_logvar': jnp.asarray(logvar[i:i + 1]),
        }
        rng, step_rng = jax.random.split(rng)
        timer.start()
        train_params, opt_state, loss = trainer.step(
            train_params, opt_state, batch, step_rng)
        timer.stop(loss)

        if global_step % print_freq == 0:
            logger_msg({'iter': global_step,
                        'lrs': [float(train_opt.get('optimizer', {})
                                      .get('lora_lr', 1e-4))],
                        'total_loss': jax.device_get(loss),
                        'step_time': timer.times[-1]})

        if global_step % save_freq == 0 or global_step == total_iter:
            mdir = os.path.join(opt['path']['models'],
                                f'models_{global_step}')
            ckpt = os.path.join(mdir, 'edlora_model-latest.pth')
            save_edlora_checkpoint(ckpt, jax.device_get(train_params),
                                   unet_sites, text_sites)
            with open(os.path.join(mdir, 'new_concept_cfg.json'), 'w') as f:
                json.dump(new_concept_cfg, f, indent=2)
            logger.info(f'saved ED-LoRA checkpoint: {ckpt}')

    s = timer.summary()
    if s:
        logger.info(
            f'step time: mean {s["mean_s"]:.3f}s  p50 {s["p50_s"]:.3f}s  '
            f'p90 {s["p90_s"]:.3f}s over {s["steps"]} steps '
            f'(total {s["total_s"]:.1f}s)')
    logger.info('ED-LoRA training done')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--shard', type=int, default=None,
                        help='tensor-parallel-shard the frozen models '
                             'over N devices')
    args = parser.parse_args()
    train(os.path.abspath('.'), args)
