"""Verification drive: exercise the subpixel upsamplers end-to-end on the
real chip through the public pipeline surface (256^2, 8 frames, 4 DDIM
steps -> U-Net Upsample3D x3 per step + VAE decoder upsamplers), then A/B
the same graph with VS_NO_SUBPIXEL=1 semantics via direct module calls.

Run: timeout 1200 python scripts/drive_subpixel.py
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


def main():
    print(f'devices: {jax.devices()}', flush=True)

    # 1) numeric A/B of the two paths on-device at a real U-Net shape
    from videoswap_tpu.models.resnet3d import Upsample3D
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 32, 32, 640) * 0.3, jnp.bfloat16)
    mod = Upsample3D(640, dtype=jnp.bfloat16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    fast = jax.jit(mod.apply)(params, x)
    os.environ['VS_NO_SUBPIXEL'] = '1'
    slow = jax.jit(lambda p, a: mod.apply(p, a))(params, x)
    os.environ.pop('VS_NO_SUBPIXEL')
    f32 = np.asarray(fast, np.float32)
    s32 = np.asarray(slow, np.float32)
    err = np.abs(f32 - s32).max() / (np.abs(s32).max() + 1e-9)
    print(f'upsample3d subpixel-vs-naive rel err {err:.4g}', flush=True)
    assert err < 0.05, err

    # 2) drive the public pipeline: 8-frame 256^2 sample, 4 DDIM steps
    import bench as benchmod
    benchmod.FRAMES, benchmod.SIZE, benchmod.STEPS = 8, 256, 4
    pipe = benchmod.build_pipeline()
    conditions = {
        'pred_tracks': (rs.rand(8, 10, 2) * 256).astype(np.float32),
        'point_embedding': rs.randn(10, 1280).astype(np.float32),
        'point_name2id': {f'p{i}': i for i in range(10)},
        'index_list': None,
    }
    t0 = time.time()
    video = pipe.sample(
        prompt='a cat on a wooden floor', video_length=8, height=256,
        width=256, num_inference_steps=4, guidance_scale=7.5,
        negative_prompt='low quality', conditions=conditions,
        t2i_guidance_scale=0.5, t2i_start=0.0, t2i_end=0.5,
        output_type='np', rng=jax.random.PRNGKey(0))
    print(f'pipeline sample ok {time.time()-t0:.1f}s shape={video.shape} '
          f'finite={np.isfinite(video).all()}', flush=True)
    assert video.shape == (1, 8, 256, 256, 3)
    assert np.isfinite(video).all()
    print('DRIVE OK', flush=True)


if __name__ == '__main__':
    main()
