"""Headline benchmark: 16-frame 512x512 subject swap, 50 DDIM steps, CFG,
point-adapter guidance — single chip.

Baseline (BASELINE.md): < 30 s wall-clock on one TPU v5e. Random weights
(same compute graph as trained ones). Prints TWO JSON lines: first the
PRODUCTION path (use_blend: 50-step DDIM inversion with attention stores +
50-step edit with cross/self replacement and latent blending — the
reference's shipped recipe), then the headline plain CFG+adapter swap
(the line the driver parses):
{"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 30/value}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeated bench runs skip the big XLA compile
os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRAMES = 16
SIZE = 512
STEPS = 50
POINTS = 10
BASELINE_S = 30.0


def build_pipeline():
    from videoswap_tpu.models import (AdapterConfig, AnimateDiffUNet3DModel,
                                      SparsePointAdapter, UNet3DConfig)
    from videoswap_tpu.models.clip_text import CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.pipelines import VideoSwapPipeline
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
    return VideoSwapPipeline(unet=unet, vae=vae, text_encoder=text_encoder,
                             tokenizer=HashTokenizer(),
                             sched=make_schedule(), adapter=adapter,
                             params=params)


def bench_blended_swap(pipe, conditions):
    """The production recipe (reference validation, use_blend: true):
    50-step inversion storing attention maps + latents, then a 50-step
    edit with cross/self attention replacement and latent blending."""
    from videoswap_tpu.utils.profiling import StepTimer
    rs = np.random.RandomState(1)
    video = (rs.rand(1, FRAMES, SIZE, SIZE, 3) * 2 - 1).astype(np.float32)
    editing_config = {
        'use_invertion_latents': True,
        'use_blend': True,
        'num_inference_steps': STEPS,
        'guidance_scale': 7.5,
        't2i_guidance_scale': 0.5,
        't2i_start': 0.0, 't2i_end': 0.5,
        'editing_prompts': {
            # latent blend + cross replacement: the dominant shipped recipe
            # (self_replace at 512^2 stores ~5 GB of 256x256 self maps over
            # 50 steps — HBM-resident stores need the recompute path for
            # that; the reference CPU-offloads instead)
            'swap': {'replace': 'kitten -> white dog',
                     'blend_cfg': {'cross_replace_steps': 0.3,
                                   'blend_th': 0.3}},
        },
    }
    src_prompt = ('a kitten with a red bell around its neck sitting on a '
                  'wooden floor')

    def run():
        timer = StepTimer()
        timer.start()
        results = pipe.validation(video, conditions, src_prompt,
                                  editing_config)
        timer.stop(results['swap'])
        return timer.times[-1], results

    t_warm, _ = run()                               # compile + run
    print(f'# blended compile+run {t_warm:.1f}s', file=sys.stderr)
    # min of 2: the axon tunnel has large run-to-run variance (CLAUDE.md)
    times = []
    for _ in range(2):
        elapsed, results = run()                    # steady-state
        assert len(results['swap']) == FRAMES
        print(f'# blended steady-state {elapsed:.2f}s', file=sys.stderr)
        times.append(elapsed)
    elapsed = min(times)
    print(json.dumps({
        'metric': f'wall-clock {FRAMES}-frame {SIZE}x{SIZE} BLENDED swap '
                  f'({STEPS}-step inversion w/ attention store + '
                  f'{STEPS}-step edit w/ cross replace + latent blend), '
                  '1 chip',
        'value': round(elapsed, 3),
        'unit': 's',
        'vs_baseline': None,
    }), flush=True)


def bench_atlas_step():
    """Informational line: the atlas train step at production scale
    (768x448, 72 frames, 10k points, full 8-term loss, fp32) — the other
    heavy workload the reference ships (50k iterations per video). Runs
    FIRST so its 1.6 GB of random video data is freed before the swap
    pipeline's params go on device. Opt out: VS_BENCH_ATLAS=0."""
    from videoswap_tpu.atlas.imlp import imlp_from_opt
    from videoswap_tpu.atlas.trainer import AtlasTrainer
    from videoswap_tpu.utils.config import load_config

    opt = load_config('options/train_atlas/atlas_swan.yml')
    nets = {name: imlp_from_opt(cfg)
            for name, cfg in opt['models'].items()
            if name != 'FG_UV_Mapping_Inverse'}
    rs = np.random.RandomState(3)
    f, h, w = 72, 448, 768
    shp = (f, h, w)
    data = {
        'video': rs.rand(*shp, 3).astype(np.float32),
        'mask': (rs.rand(*shp) > 0.7).astype(np.float32),
        'dx': rs.randn(*shp, 3).astype(np.float32) * 0.05,
        'dy': rs.randn(*shp, 3).astype(np.float32) * 0.05,
        'flows': rs.randn(*shp, 2).astype(np.float32),
        'flows_rev': rs.randn(*shp, 2).astype(np.float32),
        'flow_masks': np.ones(shp, np.float32),
        'flow_masks_rev': np.ones(shp, np.float32),
    }
    data = {k: jnp.asarray(v) for k, v in data.items()}
    trainer = AtlasTrainer(nets=nets, data=data, train_opt=opt['train'],
                           larger_dim=max(h, w), num_frames=f)
    params = trainer.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.init_opt_state(params)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    params, opt_state, ld = trainer.step(params, opt_state, key, 1)
    float(ld['total_loss'])
    print(f'# atlas compile+1 {time.time() - t0:.1f}s', file=sys.stderr)
    # UNTIMED warmup: the first post-compile execution window on axon runs
    # ~5x slow for ~15-25 s (backend post-compile work rides the tunnel;
    # measured 686 -> 145 ms across consecutive windows of the SAME
    # executable, /tmp A/B 2026-08-19). Drain it before timing.
    gs = 2
    for _ in range(15):
        params, opt_state, ld = trainer.step(
            params, opt_state, jax.random.fold_in(key, gs), gs)
        gs += 1
    float(ld['total_loss'])
    per = float('inf')
    for _ in range(2):                     # min of 2 windows
        n = 15
        t0 = time.time()
        for _ in range(n):
            params, opt_state, ld = trainer.step(
                params, opt_state, jax.random.fold_in(key, gs), gs)
            gs += 1
        s = float(ld['total_loss'])
        per = min(per, (time.time() - t0) / n * 1e3)
    assert np.isfinite(s)
    print(f'# atlas step {per:.1f} ms', file=sys.stderr)
    print(json.dumps({
        'metric': 'atlas train step 768x448x72f 10k-pt full 8-term loss, '
                  '1 chip (informational; Pallas hash-grad kernel)',
        'value': round(per, 1),
        'unit': 'ms',
        'vs_baseline': None,
    }), flush=True)


def main():
    t_setup = time.time()
    if os.environ.get('VS_BENCH_ATLAS', '1') != '0':
        bench_atlas_step()
    pipe = build_pipeline()
    rs = np.random.RandomState(0)
    conditions = {
        'pred_tracks': (rs.rand(FRAMES, POINTS, 2) * SIZE).astype(
            np.float32),
        'point_embedding': rs.randn(POINTS, 1280).astype(np.float32),
        'point_name2id': {f'p{i}': i for i in range(POINTS)},
        'index_list': None,
    }
    kwargs = dict(
        prompt='a <catA1> <catA2> with a red bell sitting on a wooden floor',
        video_length=FRAMES, height=SIZE, width=SIZE,
        num_inference_steps=STEPS, guidance_scale=7.5,
        negative_prompt='worst quality, low quality, deformed',
        conditions=conditions, t2i_guidance_scale=0.5,
        t2i_start=0.0, t2i_end=0.5, output_type='np',
        rng=jax.random.PRNGKey(0),
    )
    print(f'# setup {time.time() - t_setup:.1f}s', file=sys.stderr)

    # production (blended) path first; headline line LAST (driver-parsed)
    bench_blended_swap(pipe, conditions)

    t0 = time.time()
    video = pipe.sample(**kwargs)                  # compile + run
    print(f'# compile+run {time.time() - t0:.1f}s', file=sys.stderr)
    assert np.isfinite(video).all()

    # min of 3 steady-state runs: tunnel variance between identical runs
    # is larger than any remaining optimization win (CLAUDE.md)
    times = []
    for _ in range(3):
        t0 = time.time()
        video = pipe.sample(**kwargs)              # steady-state
        times.append(time.time() - t0)
        print(f'# steady-state {times[-1]:.2f}s', file=sys.stderr)
    elapsed = min(times)
    assert video.shape == (1, FRAMES, SIZE, SIZE, 3)

    # ---- DPM-Solver++(2M) 20-step lever (informational): same initial
    # latents, 20 solver steps vs the 50-step DDIM output just measured.
    # Shipped profile: options/test_videoswap/animal/
    # 2001_catheadturn_T05_Iter100/2001_catheadturn_dpmpp20.yml. Opt out:
    # VS_BENCH_DPM=0.
    if os.environ.get('VS_BENCH_DPM', '1') != '0':
        from videoswap_tpu.utils.metrics import ssim, video_psnr
        dpm_kwargs = dict(kwargs, sampler='dpmpp_2m',
                          num_inference_steps=20)
        t0 = time.time()
        vid_dpm = pipe.sample(**dpm_kwargs)        # compile + run
        print(f'# dpm compile+run {time.time() - t0:.1f}s', file=sys.stderr)
        dpm_times = []
        for _ in range(2):
            t0 = time.time()
            vid_dpm = pipe.sample(**dpm_kwargs)
            dpm_times.append(time.time() - t0)
            print(f'# dpm steady-state {dpm_times[-1]:.2f}s',
                  file=sys.stderr)
        v50 = (video[0] + 1.0) / 2.0               # [-1,1] -> [0,1]
        v20 = (np.asarray(vid_dpm)[0] + 1.0) / 2.0
        psnr_v = video_psnr(np.clip(v50, 0, 1), np.clip(v20, 0, 1))
        ssim_v = float(np.mean([ssim(np.clip(v50[f], 0, 1),
                                     np.clip(v20[f], 0, 1))
                                for f in range(FRAMES)]))
        print(json.dumps({
            'metric': f'wall-clock {FRAMES}-frame {SIZE}x{SIZE} swap, '
                      '20 DPM-Solver++(2M) steps (informational; quality '
                      f'proximity to the {STEPS}-step DDIM output: '
                      f'PSNR {psnr_v:.2f} dB, SSIM {ssim_v:.4f})',
            'value': round(min(dpm_times), 3),
            'unit': 's',
            'vs_baseline': round(BASELINE_S / min(dpm_times), 3),
        }), flush=True)

    fps = FRAMES / elapsed
    print(f'# best {elapsed:.2f}s  ({fps:.2f} frames/s/chip)',
          file=sys.stderr)
    print(json.dumps({
        'metric': f'wall-clock {FRAMES}-frame {SIZE}x{SIZE} swap, '
                  f'{STEPS} DDIM steps + CFG + point adapter, 1 chip',
        'value': round(elapsed, 3),
        'unit': 's',
        'vs_baseline': round(BASELINE_S / elapsed, 3),
    }))


if __name__ == '__main__':
    main()
