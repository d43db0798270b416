"""Blended-path phase profile (VERDICT r03 weak #2): split the 25.8 s
production number — 50-step inversion w/ attention store + 50-step
cross-replace+blend edit — into its phases at bench shapes
(16f x 512^2, bf16), and compare against the assembled floor.

Phases:
  inv_store    pipe.invert with the edit's store filter (guidance 1 — the
               reference inverts WITHOUT CFG, pipeline_videoswap.py:658)
  inv_plain    pipe.invert without stores (isolates store overhead)
  bundle       host-side make_edit_bundle prep
  edit         50-step CFG sample with the edit bundle + latent blending
               (+ final VAE decode, as in production)
  plain        the headline 50-step CFG sample (comparison: BENCH 16.6 s)

Floor: inversion has no CFG, so its U-Net step costs about half the CFG
step; blended total ~= 0.5 * plain_loop + plain. Run:
  timeout 3000 python scripts/bench_blended_parts.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

os.makedirs('/root/.cache/jax_bench_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_bench_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import bench  # noqa: E402  (reuses the bench pipeline + shapes)
from videoswap_tpu.p2p import NO_CTRL, AttnCtrl  # noqa: E402
from videoswap_tpu.p2p.edit import (inversion_store_filter,  # noqa: E402
                                    make_edit_bundle, want_recompute_self)

FRAMES, SIZE, STEPS = bench.FRAMES, bench.SIZE, bench.STEPS


def timed(label, fn, n=2):
    out = fn()                                   # compile + post-compile
    print(f'# {label}: compile+run done', file=sys.stderr, flush=True)
    best = float('inf')
    for _ in range(n):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
        print(f'# {label}: {time.time() - t0:.2f}s', file=sys.stderr,
              flush=True)
    print(f'{label}: {best:.2f}s', flush=True)
    return best, out


def main():
    pipe = bench.build_pipeline()
    rs = np.random.RandomState(0)
    conditions = {
        'pred_tracks': (rs.rand(FRAMES, bench.POINTS, 2) * SIZE).astype(
            np.float32),
        'point_embedding': rs.randn(bench.POINTS, 1280).astype(np.float32),
        'point_name2id': {f'p{i}': i for i in range(bench.POINTS)},
        'index_list': None,
    }
    video = (rs.rand(1, FRAMES, SIZE, SIZE, 3) * 2 - 1).astype(np.float32)
    src_prompt = ('a kitten with a red bell around its neck sitting on a '
                  'wooden floor')
    editing_config = {
        'use_invertion_latents': True, 'use_blend': True,
        'num_inference_steps': STEPS, 'guidance_scale': 7.5,
        't2i_guidance_scale': 0.5, 't2i_start': 0.0, 't2i_end': 0.5,
        'editing_prompts': {'swap': {
            'replace': 'kitten -> white dog',
            'blend_cfg': {'cross_replace_steps': 0.3, 'blend_th': 0.3}}},
    }
    swap_cfg = editing_config['editing_prompts']['swap']
    target_prompt = src_prompt.replace('kitten', 'white dog')

    store_ctrl = AttnCtrl(mode='store', store_filter=inversion_store_filter(
        editing_config, pipe.tokenizer, SIZE, SIZE, video_length=FRAMES,
        num_steps=STEPS))
    recompute = want_recompute_self(editing_config, SIZE, SIZE, FRAMES,
                                    STEPS)
    print(f'# recompute_self={recompute}', file=sys.stderr)

    t_inv_store, (lat, per_step) = timed(
        'inv_store', lambda: _sync(pipe.invert(
            video, src_prompt, num_inference_steps=STEPS,
            store_ctrl=store_ctrl)))

    t_inv_plain, _ = timed(
        'inv_plain', lambda: _sync(pipe.invert(
            video, src_prompt, num_inference_steps=STEPS,
            store_ctrl=NO_CTRL)))

    def make_bundle():
        b = make_edit_bundle(
            pipe.tokenizer, src_prompt, target_prompt, num_steps=STEPS,
            video_length=FRAMES, height=SIZE, width=SIZE,
            inv_latents_per_step=per_step['latents'],
            inv_attn_store=per_step['attn'],
            blend_words=[['kitten'], ['white', 'dog']],
            blend_cfg=swap_cfg['blend_cfg'], do_cfg=True,
            recompute_self=recompute, inv_z0=per_step.get('z0'),
            inv_ts=per_step.get('ts'))
        jax.block_until_ready(jax.tree.leaves(b.xs))
        return b

    t_bundle, bundle = timed('bundle', make_bundle)

    kwargs = dict(video_length=FRAMES, height=SIZE, width=SIZE,
                  num_inference_steps=STEPS, guidance_scale=7.5,
                  conditions=conditions, t2i_guidance_scale=0.5,
                  t2i_start=0.0, t2i_end=0.5, output_type='np',
                  rng=jax.random.PRNGKey(0))
    t_edit, _ = timed('edit', lambda: pipe.sample(
        prompt=target_prompt, latents=lat, edit_bundle=bundle, **kwargs))

    t_plain, _ = timed('plain', lambda: pipe.sample(
        prompt=target_prompt, **kwargs))

    total = t_inv_store + t_bundle + t_edit
    print(f'\nassembled blended total: {total:.2f}s '
          f'(inv_store {t_inv_store:.2f} + bundle {t_bundle:.2f} '
          f'+ edit {t_edit:.2f})')
    print(f'store overhead in inversion: '
          f'{t_inv_store - t_inv_plain:+.2f}s')
    print(f'edit overhead over plain CFG sample: '
          f'{t_edit - t_plain:+.2f}s')
    # floor: inversion has no CFG -> its unet loop ~ half the CFG loop;
    # decode rides only the edit phase
    print(f'floor estimate 0.5*plain_loop + plain = '
          f'{0.5 * t_plain + t_plain:.2f}s (plain={t_plain:.2f})')


def _sync(pair):
    lat, per = pair
    jax.block_until_ready(lat)
    float(np.asarray(lat.astype('float32')).sum())     # force axon fetch
    return lat, per


if __name__ == '__main__':
    main()
