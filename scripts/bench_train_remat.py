"""A/B: full-block remat vs the 'save_flash' selective-remat policy on the
adapter TRAIN step at production shapes (512^2 x 16 frames, bf16, cached
VAE posterior moments, flash attention).

'save_flash' (unet3d._maybe_remat) saves each flash site's out+lse — the
exact residuals the Pallas bwd kernels consume (ops/flash_attention.py
checkpoint_name tags) — so the backward pass never re-runs an attention
forward; everything else (denses, resnets, norms) still rematerializes.
The full-block variant ('remat': True) is the round-4 default this must
beat: its per-family cost ran at 2.1-3.1x the batch-1 forward vs the 3x
remat ideal INCLUDING attention recompute (scripts/bench_train_parts.py).

Extra HBM for the saved residuals is O(S*d) per site (the custom-VJP
boundary sits on unpadded tensors precisely so this isn't the 3-128x
larger kernel layout).

Usage: python scripts/bench_train_remat.py [full] [save_flash]
One fresh trainer + jit per variant; same-session so tunnel variance
cancels in the delta.

MEASURED (v5e, 2026-08-20, same-session, policy verified active via
jax.ad_checkpoint.print_saved_residuals — out+lse at their compact
unpadded shapes): full 665.7 ms/step, save_flash 663.0 ms/step (+2.7 ms,
0.4%, inside tunnel noise; compile 153 s vs 121 s; no OOM — the extra
residual HBM fits; axon exposes no allocator stats). NEGATIVE RESULT:
eliminating the attention-forward recompute does not move the step at
production shapes — the bwd is dominated by its matmuls, confirming the
round-4 'at the remat floor' analysis from the other side. Default stays
full-block remat (tune_cfg {'remat': 'save_flash'} opts in; equivalence
pinned by tests/test_attention.py::
test_save_flash_remat_policy_matches_full_remat).

Caveat that cost a day: the policy silently no-ops if the tagged values
sit inside a NESTED jit (flash_attention was jit-wrapped; the first A/B
compiled identical programs for both arms). Verify tag visibility with
print_saved_residuals before trusting any remat-policy A/B.

Follow-up sweeps (same day): 'none' (no remat) OOMs by 0.55 G (16.30 vs
15.75 G — the compact flash residuals got it this close; r04's 'auto'
no-remat needed 19.81 G). 'edges' (remat only the level-0 blocks, whose
activations are 4x level 1's area; save everything deeper) fits and runs
632.2/632.0 ms vs full 665.8 same-session — a 5.3% win and the new
trainer default. 'edges_sf' (level-0 remat with the save_flash policy)
638.0 — the attention-residual trade is neutral-to-negative everywhere.
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


def mem_stats(tag: str) -> None:
    try:
        s = jax.local_devices()[0].memory_stats()
        print(f'# {tag}: bytes_in_use={s.get("bytes_in_use", 0) / 2**30:.2f}G'
              f' peak={s.get("peak_bytes_in_use", 0) / 2**30:.2f}G',
              file=sys.stderr, flush=True)
    except Exception as e:  # axon may not expose allocator stats
        print(f'# {tag}: memory_stats unavailable ({e})', file=sys.stderr,
              flush=True)


def run_variant(remat_mode) -> float:
    from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                      SparsePointAdapter, UNet3DConfig)
    from videoswap_tpu.models.clip_text import CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.pipelines import VideoSwapTrainer
    from videoswap_tpu.schedulers import make_schedule
    from videoswap_tpu.utils.tokenizer import HashTokenizer

    dtype = jnp.bfloat16
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(), dtype=dtype)
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
                  'loss_type': 'global', 'attn_impl': 'flash',
                  'remat': remat_mode},
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
    print(f'# remat={remat_mode}: compile+1 {compile_s:.0f}s '
          f'loss={float(loss):.4f}', file=sys.stderr, flush=True)
    for i in range(WARMUP):
        adapter_params, opt_state, loss = trainer.step(
            adapter_params, opt_state, batch, jax.random.PRNGKey(i + 1))
    float(loss)
    mem_stats(f'remat={remat_mode} post-warmup')
    best = float('inf')
    for w in range(2):
        t0 = time.time()
        for i in range(ITERS):
            adapter_params, opt_state, loss = trainer.step(
                adapter_params, opt_state, batch,
                jax.random.PRNGKey(100 * w + i))
        float(loss)
        best = min(best, (time.time() - t0) / ITERS * 1e3)
    return best, float(loss)


def main():
    names = sys.argv[1:] or ['full', 'save_flash']
    # 'none': no remat at all — viable only because flash residuals are
    # compact (r04's no-remat OOM was 'auto' XLA attention saving its
    # (B*h, S, S) probs, ~11 G of the 19.8 G demand)
    modes = {'full': True, 'save_flash': 'save_flash', 'none': False,
             'edges': 'edges', 'edges_sf': 'edges_sf'}
    results, losses = {}, {}
    for n in names:
        ms, ls = run_variant(modes[n])
        results[n], losses[n] = ms, ls
        print(f'{n:12s} {ms:8.1f} ms/step', flush=True)
    if len(results) == 2 and 'full' in results:
        other = next(n for n in results if n != 'full')
        print(f'delta {other}: {results["full"] - results[other]:+.1f} ms '
              f'({results["full"] / results[other]:.3f}x)', flush=True)
        # same math, different schedule: final losses must agree closely
        print(f'loss full={losses["full"]:.6f} '
              f'{other}={losses[other]:.6f}', flush=True)


if __name__ == '__main__':
    main()
