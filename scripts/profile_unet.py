"""Ablation profiler for the full-size CFG U-Net step on the real chip.

Times the bench-shape U-Net forward (B=2 CFG, 16 frames, 64x64 latents,
bf16) with whole subsystems stubbed out, so the per-family cost comes from
deltas against the full model. Methodology per CLAUDE.md: host loop with a
data dependency between iterations (output fed back as input), scalar fetch
to sync, several warmups; axon dispatch overhead ~4-5 ms is ~1.5% at this
step size.

Usage: python scripts/profile_unet.py [variant ...]
Variants: full nomotion nospatial noself nocross noffn skeleton
(default: all). Prints one line per variant: name, ms/step.
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

B, F, HW = 2, 16, 64
WARMUP, ITERS = 3, 10


def patch(variant):
    """Monkeypatch model classes for the requested ablation. Returns a
    cleanup fn. Params are re-initialized per variant, so dropping modules
    from the graph is safe."""
    import videoswap_tpu.models.attention_blocks as ab

    orig_run = ab.BasicTransformerBlock._run_attn
    orig_tfm = ab.Transformer3DModel.__call__

    if variant == 'nospatial':
        ab.Transformer3DModel.__call__ = (
            lambda self, x, text, ctrl=None: x)
    elif variant in ('noself', 'nocross'):
        kind = 'self' if variant == 'noself' else 'cross'

        def run(self, attn, h, context, site, tokens, ctrl,
                _orig=orig_run, _kind=kind):
            if site.kind == _kind:
                return jnp.zeros_like(h)
            return _orig(self, attn, h, context, site, tokens, ctrl)
        ab.BasicTransformerBlock._run_attn = run
    elif variant == 'noffn':
        import videoswap_tpu.models.layers as lyr
        orig_ffn = lyr.FeedForward.__call__
        lyr.FeedForward.__call__ = lambda self, x: jnp.zeros_like(x)
        # FeedForward is shared with the motion modules: with it patched
        # out no 'ff' params exist, so the fused temporal kernel (which
        # reads raw params) must be routed to the layer-wise path
        os.environ['FT_DISABLE'] = '1'

        def cleanup():
            lyr.FeedForward.__call__ = orig_ffn
            os.environ.pop('FT_DISABLE', None)
        return cleanup

    def cleanup():
        ab.BasicTransformerBlock._run_attn = orig_run
        ab.Transformer3DModel.__call__ = orig_tfm
    return cleanup


def run_variant(variant: str) -> float:
    cleanup = patch(variant) if variant not in ('full', 'nomotion',
                                                'skeleton') else (lambda: 0)
    if variant == 'skeleton':
        cleanup = patch('nospatial')
    try:
        from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
        cfg = UNet3DConfig(use_motion_module=variant not in (
            'nomotion', 'skeleton'))
        model = AnimateDiffUNet3DModel(cfg=cfg, dtype=jnp.bfloat16)

        rs = np.random.RandomState(0)
        sample = jnp.asarray(rs.randn(B, F, HW, HW, 4), jnp.bfloat16)
        t = jnp.array([500, 500])
        text = jnp.asarray(rs.randn(B, 77, 768), jnp.bfloat16)

        params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, t, text)

        @jax.jit
        def step(params, x):
            eps = model.apply(params, x, t, text)
            # feed eps back: keeps iterations dependent, same shape/dtype
            return (x * np.float32(0.98) - eps * np.float32(0.1)).astype(
                jnp.bfloat16)

        x = sample
        for _ in range(WARMUP):
            x = step(params, x)
        float(jnp.sum(x))
        t0 = time.time()
        for _ in range(ITERS):
            x = step(params, x)
        float(jnp.sum(x))
        ms = (time.time() - t0) / ITERS * 1e3
        return ms
    finally:
        cleanup()


def main():
    variants = sys.argv[1:] or ['full', 'nomotion', 'nospatial', 'noself',
                                'nocross', 'noffn', 'skeleton']
    results = {}
    for v in variants:
        t0 = time.time()
        ms = run_variant(v)
        results[v] = ms
        print(f'{v:10s} {ms:8.1f} ms/step   (incl. compile {time.time()-t0:.0f}s)',
              flush=True)
    if 'full' in results:
        base = results['full']
        for v, ms in results.items():
            if v != 'full':
                print(f'delta {v:10s} {base - ms:8.1f} ms')


if __name__ == '__main__':
    main()
