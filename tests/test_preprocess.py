"""Preprocessing stack: DIFT features/correspondence, native tracker,
pyramidal optical flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.preprocess.dift import SDFeaturizer, dift_query
from videoswap_tpu.preprocess.flow import (compute_bidirectional_flow,
                                           pyramid_flow)


def test_dift_query_correspondence():
    """Synthetic features: the best match of a source point's feature is
    where the same feature appears in the target map."""
    rs = np.random.RandomState(0)
    src = rs.randn(16, 16, 8).astype(np.float32)
    tgt = rs.randn(16, 16, 8).astype(np.float32)
    tgt[10, 3] = src[5, 7]  # plant the correspondence
    (bx, by), conf, vec = dift_query(src, (16, 16), (7, 5), tgt, (16, 16))
    assert (bx, by) == (3, 10)
    assert conf > 0.99
    np.testing.assert_allclose(vec, tgt[10, 3], atol=1e-5)
    # confidence at a wrong target point is low
    _, conf_wrong, _ = dift_query(src, (16, 16), (7, 5), tgt, (16, 16),
                                  target_xy=(0, 0))
    assert conf_wrong < 0.8


def test_pyramid_flow_recovers_translation():
    """A 3-pixel x-shift must produce flow ~ (+3, 0) in textured areas."""
    rs = np.random.RandomState(0)
    base = rs.rand(64, 96).astype(np.float32)
    img0 = np.stack([base] * 3, -1)
    img1 = np.roll(img0, 3, axis=1)
    flow = np.asarray(pyramid_flow(jnp.asarray(img0), jnp.asarray(img1),
                                   levels=3, iters=20))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - 3) < 1.0, \
        f'median flow x {np.median(inner[..., 0])}'
    assert abs(np.median(inner[..., 1])) < 1.0


def test_bidirectional_flow_format():
    rs = np.random.RandomState(1)
    f0 = rs.rand(32, 32, 3).astype(np.float32)
    f1 = np.roll(f0, 2, axis=0)
    out = compute_bidirectional_flow(f0, f1)
    assert out.shape == (2, 32, 32, 2)
    assert np.isfinite(out).all()


@pytest.fixture(scope='module')
def tiny_featurizer():
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from videoswap_tpu.models.vae import AutoencoderKL
    from videoswap_tpu.schedulers import make_schedule
    from videoswap_tpu.utils.tokenizer import HashTokenizer

    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig(
        block_out_channels=(8, 8, 16, 16), attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4, motion_heads=2,
        use_motion_module=False))
    vae = AutoencoderKL(block_out_channels=(4, 4, 8, 8), norm_groups=4)
    text_encoder = CLIPTextModel(cfg=CLIPTextConfig(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=16))
    k = jax.random.PRNGKey(0)
    params = {
        'unet': jax.jit(unet.init)(k, jnp.zeros((1, 1, 8, 8, 4)),
                                   jnp.array([0]), jnp.zeros((1, 77, 16))),
        'vae': jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3))),
        'text_encoder': jax.jit(text_encoder.init)(
            k, jnp.zeros((1, 77), jnp.int32)),
    }
    return SDFeaturizer(unet=unet, vae=vae, text_encoder=text_encoder,
                        tokenizer=HashTokenizer(), sched=make_schedule(),
                        params=params, ensemble_size=2)


def test_dift_featurizer_shapes(tiny_featurizer):
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32) * 2 - 1
    ft = tiny_featurizer.forward(img, 'photo of a cat')
    # up_block_1 output at latent/4 = 2x2 for 8x8 latents, 16 channels
    assert ft.ndim == 3 and ft.shape[-1] == 16
    assert np.isfinite(ft).all()


def test_dift_tracker_follows_blob(tiny_featurizer):
    """The native tracker with a strong locality prior should keep tracks
    in-bounds and roughly follow a moving bright blob even with random
    U-Net weights (features are still spatially localized via the VAE)."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    frames = []
    for i in range(3):
        img = np.zeros((64, 64, 3), np.float32) - 1
        cx = 16 + 8 * i
        img[24:40, cx - 8:cx + 8] = 1.0
        frames.append(img)
    tracker = DIFTTracker(tiny_featurizer, locality_sigma=0.1)
    tracks = tracker.track(frames, 0, np.asarray([[16.0, 32.0]]), 'blob')
    assert tracks.shape == (3, 1, 2)
    assert (tracks >= 0).all() and (tracks < 64).all()


class _PatchFeaturizer:
    """Deterministic stand-in featurizer: 5x5 patch descriptors of the
    frame itself. Isolates the TRACKER math (cosine argmax + locality
    prior + backward tracking) from the SD feature extractor."""

    def forward(self, image: np.ndarray, prompt: str) -> np.ndarray:
        g = image.mean(-1)
        h, w = g.shape
        pad = np.pad(g, 2, mode='edge')
        feats = np.stack([pad[dy:dy + h, dx:dx + w]
                          for dy in range(5) for dx in range(5)], axis=-1)
        # mean-center per pixel: cosine becomes ZNCC-like (raw all-positive
        # patches have ~0.75 baseline cosine, which would defeat the
        # tracker's occlusion confidence gate; real DIFT features are
        # roughly zero-centered)
        feats = feats - feats.mean(-1, keepdims=True)
        return feats.astype(np.float32)


def test_dift_tracker_recovers_known_translation():
    """Synthetic-motion video: a textured image translated by a known
    (dx, dy) per frame; the tracker must recover every point within 1.5 px
    — including frames BEFORE the keyframe (backward tracking,
    reference extract_semantic_point.py:104-108)."""
    from videoswap_tpu.preprocess.tracker import DIFTTracker
    rs = np.random.RandomState(0)
    base = rs.rand(64, 80, 3).astype(np.float32)
    shifts = [(-4, -2), (-2, -1), (0, 0), (3, 1), (6, 2)]   # keyframe idx 2
    frames = [np.roll(np.roll(base, dy, axis=0), dx, axis=1)
              for dx, dy in shifts]

    points = np.asarray([[30.0, 25.0], [50.0, 40.0], [20.0, 45.0]])
    tracker = DIFTTracker(_PatchFeaturizer(), locality_sigma=0.15)
    tracks = tracker.track(frames, 2, points, 'texture')

    for fi, (dx, dy) in enumerate(shifts):
        expected = points + np.asarray([dx, dy])
        err = np.abs(tracks[fi] - expected).max()
        assert err <= 1.5, f'frame {fi}: max err {err}, got {tracks[fi]}'
