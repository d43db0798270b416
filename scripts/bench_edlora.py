"""ED-LoRA training-step benchmark at production scale (512^2 images,
full SD-1.5 2D U-Net + text encoder, rank-4 LoRA on attention projections
+ concept embeddings, bf16, flash attention, no remat — see the
EDLORA_REMAT ablation below; the round-4 407 ms figure was dominated by
the flash wrapper's nested jit + padded residuals, fixed in round 5).

Mix-of-Show trains single-concept ED-LoRAs for ~100s of iterations; this
measures OUR one donated jit step (in-graph W + alpha*up@down merging over
176 sites, 16-layer-variant text encode, VAE moment sampling, U-Net
fwd/bwd, multi-lr optax) and the implied 100-iter wall-clock.

Run: timeout 3000 python scripts/bench_edlora.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

SIZE = 512


def main():
    from videoswap_tpu.edlora_train import (EDLoRATrainer,
                                            init_concept_embedding,
                                            lora_sites, register_concepts,
                                            tokenize_layer_prompts)
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.models.clip_text import CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.schedulers import make_schedule
    from videoswap_tpu.utils.tokenizer import HashTokenizer

    dtype = jnp.bfloat16
    unet = AnimateDiffUNet3DModel(
        cfg=UNet3DConfig(use_motion_module=False), dtype=dtype)
    vae = AutoencoderKL(dtype=jnp.float32)
    text_encoder = CLIPTextModel(dtype=dtype)
    k = jax.random.PRNGKey(0)
    h8 = SIZE // 8
    params = {
        'unet': jax.jit(unet.init)(
            k, jnp.zeros((1, 1, h8, h8, 4), dtype), jnp.array([0]),
            jnp.zeros((1, 77, 768), dtype)),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
    }
    print('# init done', file=sys.stderr, flush=True)

    tokenizer = HashTokenizer()
    cfg = register_concepts(tokenizer, ['catA1'])
    emb0 = init_concept_embedding(params['text_encoder']['params'],
                                  tokenizer, 'cat')
    scope = os.environ.get('EDLORA_SCOPE', 'attn')
    unet_sites = lora_sites(params['unet']['params'], 'unet', scope)
    text_sites = lora_sites(params['text_encoder']['params'],
                            'text_encoder', scope)
    print(f'# sites: unet {len(unet_sites)} text {len(text_sites)} '
          f'(scope={scope})', file=sys.stderr)

    trainer = EDLoRATrainer(
        unet=unet, text_encoder=text_encoder, vae=vae,
        sched=make_schedule(), params=params,
        unet_sites=unet_sites, text_sites=text_sites, alpha=1.0,
        tune_cfg={'attn_impl': os.environ.get('TRAIN_ATTN_IMPL',
                                              'flash'),
                  # '0' NO remat (the default: batch-1 activations fit,
                  # 57.5 ms vs 79.3 full-block / 67.5 no-remat-XLA —
                  # measured 2026-08-20 same-session), '1' full-block,
                  # 'save_flash' selective
                  'remat': {'1': True, '0': False}.get(
                      os.environ.get('EDLORA_REMAT', '0'),
                      os.environ.get('EDLORA_REMAT'))},
        optimizer_cfg={'emb_lr': 1e-3, 'lora_lr': 1e-4},
        max_grad_norm=1.0)
    rng = jax.random.PRNGKey(1)
    rng, k_init = jax.random.split(rng)
    train_params = trainer.init_train_params(k_init, {'catA1': emb0},
                                             rank=4)
    opt_state = trainer.init_state(train_params)

    rs = np.random.RandomState(0)
    ids = tokenize_layer_prompts(tokenizer, 'a photo of a catA1', cfg)
    pixels = jnp.asarray(
        rs.rand(1, 1, SIZE, SIZE, 3).astype(np.float32) * 2 - 1)
    from videoswap_tpu.models.vae import AutoencoderKL as VK
    mean, logvar = jax.jit(lambda p, x: vae.apply(
        p, x, method=VK.encode_video_moments))(params['vae'], pixels)
    batch = {'input_ids': jnp.asarray(ids), 'latent_mean': mean,
             'latent_logvar': logvar}

    t0 = time.time()
    train_params, opt_state, loss = trainer.step(train_params, opt_state,
                                                 batch, rng)
    print(f'# compile+1: {time.time() - t0:.1f}s loss={float(loss):.4f}',
          file=sys.stderr, flush=True)
    # untimed warmup window (post-compile slow window, CLAUDE.md)
    for i in range(12):
        rng, kk = jax.random.split(rng)
        train_params, opt_state, loss = trainer.step(train_params,
                                                     opt_state, batch, kk)
    float(loss)
    best = float('inf')
    for _ in range(2):
        n = 12
        t0 = time.time()
        for i in range(n):
            rng, kk = jax.random.split(rng)
            train_params, opt_state, loss = trainer.step(
                train_params, opt_state, batch, kk)
        float(loss)
        best = min(best, (time.time() - t0) / n)
        print(f'# window: {(time.time() - t0) / n * 1e3:.1f} ms/step',
              file=sys.stderr, flush=True)
    print(f'edlora step: {best * 1e3:.1f} ms  '
          f'(100 iters ~ {best * 100:.1f}s)', flush=True)


if __name__ == '__main__':
    main()
