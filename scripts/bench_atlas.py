"""Layered-neural-atlas training benchmark at production scale.

The reference fits an atlas with 50,000 iterations of 10,000-point batches
on an A100 (options/train_atlas/atlas_swan.yml mirrors its shipped swan
config; /root/reference/train_atlas.py:127-267). It publishes no wall-clock
number. This measures OUR jitted step at the same scale (768x448, 72
frames, full 8-term loss + inverse-mapping step, fp32) two ways:

- host loop: one dispatch per iteration (reference-style driver);
- scanned:   `AtlasTrainer.run_steps` — one dispatch per 100 iterations
             (what train_atlas.py now does between log boundaries).

Prints per-iter ms for both and the implied 50k-iter wall-clock.
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

RES_X, RES_Y, FRAMES = 768, 448, 72
CHUNK = 100            # iterations per scanned dispatch (= print_freq)
TOTAL_ITER = 50000


def main():
    from videoswap_tpu.atlas.trainer import AtlasTrainer
    from videoswap_tpu.utils.config import load_config

    opt = load_config('options/train_atlas/atlas_swan.yml')
    from train_atlas import build_nets
    nets = build_nets(opt['models'])

    rs = np.random.RandomState(0)
    shp = (FRAMES, RES_Y, RES_X)
    data = {
        'video': rs.rand(*shp, 3).astype(np.float32),
        'mask': (rs.rand(*shp) > 0.7).astype(np.float32),
        'dx': rs.randn(*shp, 3).astype(np.float32) * 0.05,
        'dy': rs.randn(*shp, 3).astype(np.float32) * 0.05,
        'flows': rs.randn(*shp, 2).astype(np.float32),
        'flow_masks': (rs.rand(*shp) > 0.1).astype(np.float32),
        'flows_rev': rs.randn(*shp, 2).astype(np.float32),
        'flow_masks_rev': (rs.rand(*shp) > 0.1).astype(np.float32),
    }
    data = {k: jnp.asarray(v) for k, v in data.items()}

    trainer = AtlasTrainer(nets=nets, data=data, train_opt=opt['train'],
                           larger_dim=max(RES_X, RES_Y), num_frames=FRAMES)
    params = trainer.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.init_opt_state(params)

    # ---- host loop (one dispatch per iteration, reference-style) --------
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    rng, k1, k2 = jax.random.split(rng, 3)
    params, opt_state, ld = trainer.step(params, opt_state, k1, 1)
    params, opt_state, inv_loss = trainer.inverse_step(params, opt_state, k2)
    print(f'# step compile+run {time.time() - t0:.1f}s '
          f'loss={float(ld["total_loss"]):.3f}', flush=True)
    n = 50
    t0 = time.time()
    for i in range(n):
        rng, k1, k2 = jax.random.split(rng, 3)
        params, opt_state, ld = trainer.step(params, opt_state, k1, i + 2)
        params, opt_state, _ = trainer.inverse_step(params, opt_state, k2)
    float(ld['total_loss'])   # sync
    ms_loop = (time.time() - t0) / n * 1e3
    print(f'host-loop   {ms_loop:7.2f} ms/iter  '
          f'(50k iters ~{ms_loop * TOTAL_ITER / 1e3:.0f}s)', flush=True)

    # ---- scanned: CHUNK iterations per dispatch -------------------------
    t0 = time.time()
    rng, k = jax.random.split(rng)
    params, opt_state, ld = trainer.run_steps(params, opt_state, k,
                                              100, CHUNK)
    float(ld['total_loss'])
    print(f'# run_steps({CHUNK}) compile+run {time.time() - t0:.1f}s',
          flush=True)
    reps = 5
    t0 = time.time()
    for i in range(reps):
        rng, k = jax.random.split(rng)
        params, opt_state, ld = trainer.run_steps(
            params, opt_state, k, 200 + i * CHUNK, CHUNK)
    float(ld['total_loss'])
    ms_scan = (time.time() - t0) / (reps * CHUNK) * 1e3
    print(f'scanned     {ms_scan:7.2f} ms/iter  '
          f'(50k iters ~{ms_scan * TOTAL_ITER / 1e3:.0f}s, '
          f'{ms_loop / ms_scan:.1f}x over host loop)', flush=True)


if __name__ == '__main__':
    main()
