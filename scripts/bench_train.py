"""Full-size adapter-training step benchmark (512^2 x 16 frames, bf16).

The reference trains the adapter for 50-100 iters on an A100 (BASELINE.md);
it publishes no step time. This measures OUR donated jitted train step
(VAE encode + text encode + adapter + U-Net fwd/bwd via chunked remat
attention + masked MSE + AdamW) at production shapes on the real chip.

Prints one line: train-step ms + implied wall-clock for a 100-iter run.
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


def main():
    import bench
    from videoswap_tpu.pipelines import VideoSwapTrainer

    pipe = bench.build_pipeline()
    trainer = VideoSwapTrainer(
        unet=pipe.unet, vae=pipe.vae, text_encoder=pipe.text_encoder,
        tokenizer=pipe.tokenizer, sched=pipe.sched, adapter=pipe.adapter,
        params={n: pipe.params[n] for n in ('unet', 'vae', 'text_encoder')},
        tune_cfg={'drop_rate': 0.2, 'min_timestep': 0.5,
                  'loss_type': 'global',
                  'attn_impl': os.environ.get('TRAIN_ATTN_IMPL',
                                              'flash')},
        optimizer_cfg={'lr': 1e-5})

    rs = np.random.RandomState(0)
    batch = {
        'pixels': jnp.asarray(
            rs.rand(1, FRAMES, SIZE, SIZE, 3).astype(np.float32) * 2 - 1),
        'input_ids': jnp.asarray(
            rs.randint(0, 49408, (1, 77)).astype(np.int32)),
        'pred_tracks': jnp.asarray(
            rs.rand(FRAMES, POINTS, 2).astype(np.float32) * SIZE),
        'point_embedding': jnp.asarray(
            rs.randn(POINTS, 1280).astype(np.float32)),
    }
    adapter_params = pipe.params['adapter']['params']
    opt_state = trainer.init_state(adapter_params)

    t0 = time.time()
    adapter_params, opt_state, loss = trainer.step(
        adapter_params, opt_state, batch, jax.random.PRNGKey(0))
    print(f'# compile+run {time.time() - t0:.1f}s  loss={float(loss):.4f}',
          flush=True)

    n = 5
    t0 = time.time()
    for i in range(n):
        adapter_params, opt_state, loss = trainer.step(
            adapter_params, opt_state, batch, jax.random.PRNGKey(i + 1))
    loss = float(loss)   # sync
    ms = (time.time() - t0) / n * 1e3
    print(f'train-step {ms:8.1f} ms  (100-iter adapter train ~'
          f'{ms / 10:.1f}s)  loss={loss:.4f}', flush=True)

    # cached-moments path (train.py cache_vae_latents, byte-identical math)
    from videoswap_tpu.models.vae import AutoencoderKL
    mean, logvar = jax.jit(lambda p, x: pipe.vae.apply(
        p, x, method=AutoencoderKL.encode_video_moments))(
        pipe.params['vae'], batch.pop('pixels'))
    batch['latent_mean'], batch['latent_logvar'] = mean, logvar
    adapter_params, opt_state, loss = trainer.step(
        adapter_params, opt_state, batch, jax.random.PRNGKey(99))
    float(loss)
    t0 = time.time()
    for i in range(n):
        adapter_params, opt_state, loss = trainer.step(
            adapter_params, opt_state, batch, jax.random.PRNGKey(100 + i))
    loss = float(loss)
    ms = (time.time() - t0) / n * 1e3
    print(f'train-step (cached VAE moments) {ms:8.1f} ms  '
          f'loss={loss:.4f}', flush=True)


if __name__ == '__main__':
    main()
