"""Per-family ablation profile of the adapter TRAIN step (fwd+bwd+optax)
at production shapes (512^2 x 16 frames, bf16, cached VAE moments).

Same methodology as profile_unet.py (whole subsystems stubbed, per-family
cost from deltas vs full) but through the donated jitted train step, so the
deltas include each family's backward pass and remat recompute. Cached VAE
posterior moments isolate the U-Net fwd+bwd: the VAE encode cost is already
known from bench_train.py (983.6 - 879.8 = ~104 ms).

Usage: python scripts/bench_train_parts.py [variant ...]
Variants: full nomotion nospatial noffn skeleton  (default: all).
One fresh trainer + jit per variant; ~10 min tunnel compile each.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

FRAMES, SIZE, POINTS = 16, 512, 10
WARMUP, ITERS = 3, 5


def patch(variant):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import profile_unet
    if variant in ('full', 'nomotion'):
        return lambda: 0
    if variant == 'skeleton':
        return profile_unet.patch('nospatial')
    return profile_unet.patch(variant)


def run_variant(variant: str) -> float:
    cleanup = patch(variant)
    try:
        from videoswap_tpu.models import (AdapterConfig,
                                          AnimateDiffUNet3DModel,
                                          SparsePointAdapter, UNet3DConfig)
        from videoswap_tpu.models.clip_text import CLIPTextModel
        from videoswap_tpu.models.vae import AutoencoderKL
        from videoswap_tpu.pipelines import VideoSwapTrainer
        from videoswap_tpu.schedulers import make_schedule
        from videoswap_tpu.utils.tokenizer import HashTokenizer

        dtype = jnp.bfloat16
        use_motion = variant not in ('nomotion', 'skeleton')
        unet = AnimateDiffUNet3DModel(
            cfg=UNet3DConfig(use_motion_module=use_motion), dtype=dtype)
        vae = AutoencoderKL(dtype=dtype)
        text_encoder = CLIPTextModel(dtype=dtype)
        adapter = SparsePointAdapter(cfg=AdapterConfig(), dtype=dtype)

        k = jax.random.PRNGKey(0)
        h8 = SIZE // 8
        params = {
            'unet': jax.jit(unet.init)(
                k, jnp.zeros((1, 2, h8, h8, 4), dtype), jnp.array([0]),
                jnp.zeros((1, 77, 768), dtype)),
            'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3), dtype)),
            'text_encoder': jax.jit(text_encoder.init)(
                k, jnp.zeros((1, 77), jnp.int32)),
            'adapter': jax.jit(lambda k, t, e: adapter.init(
                k, t, (SIZE, SIZE), e))(
                k, jnp.zeros((FRAMES, POINTS, 2)),
                jnp.zeros((POINTS, 1280), dtype)),
        }
        trainer = VideoSwapTrainer(
            unet=unet, vae=vae, text_encoder=text_encoder,
            tokenizer=HashTokenizer(), sched=make_schedule(),
            adapter=adapter,
            params={n: params[n] for n in ('unet', 'vae', 'text_encoder')},
            tune_cfg={'drop_rate': 0.2, 'min_timestep': 0.5,
                      'loss_type': 'global',
                      'attn_impl': os.environ.get('TRAIN_ATTN_IMPL',
                                                  'flash')},
            optimizer_cfg={'lr': 1e-5})

        rs = np.random.RandomState(0)
        pixels = jnp.asarray(
            rs.rand(1, FRAMES, SIZE, SIZE, 3).astype(np.float32) * 2 - 1)
        mean, logvar = jax.jit(lambda p, x: vae.apply(
            p, x, method=AutoencoderKL.encode_video_moments))(
            params['vae'], pixels)
        batch = {
            'latent_mean': mean, 'latent_logvar': logvar,
            'input_ids': jnp.asarray(
                rs.randint(0, 49408, (1, 77)).astype(np.int32)),
            'pred_tracks': jnp.asarray(
                rs.rand(FRAMES, POINTS, 2).astype(np.float32) * SIZE),
            'point_embedding': jnp.asarray(
                rs.randn(POINTS, 1280).astype(np.float32)),
        }
        adapter_params = params['adapter']['params']
        opt_state = trainer.init_state(adapter_params)

        t0 = time.time()
        adapter_params, opt_state, loss = trainer.step(
            adapter_params, opt_state, batch, jax.random.PRNGKey(0))
        compile_s = time.time() - t0
        print(f'# {variant}: compile+1 {compile_s:.0f}s '
              f'loss={float(loss):.4f}', file=sys.stderr, flush=True)
        for i in range(WARMUP):
            adapter_params, opt_state, loss = trainer.step(
                adapter_params, opt_state, batch, jax.random.PRNGKey(i + 1))
        float(loss)
        best = float('inf')
        for w in range(2):
            t0 = time.time()
            for i in range(ITERS):
                adapter_params, opt_state, loss = trainer.step(
                    adapter_params, opt_state, batch,
                    jax.random.PRNGKey(100 * w + i))
            float(loss)
            best = min(best, (time.time() - t0) / ITERS * 1e3)
        return best
    finally:
        cleanup()


def main():
    variants = sys.argv[1:] or ['full', 'nomotion', 'nospatial', 'noffn',
                                'skeleton']
    results = {}
    for v in variants:
        ms = run_variant(v)
        results[v] = ms
        print(f'{v:10s} {ms:8.1f} ms/step', flush=True)
    if 'full' in results:
        base = results['full']
        for v, ms in results.items():
            if v != 'full':
                print(f'delta {v:10s} {base - ms:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
