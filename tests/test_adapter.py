import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.models import AdapterConfig, SparsePointAdapter
from videoswap_tpu.models.adapter import bilinear_splat, local_loss_mask


def _ref_splat(feat, tracks, valid, h, w, rate):
    """Straight re-statement of the reference bilinear_interpolation
    semantics (adapter_model.py:25-47) as a numpy loop."""
    f, p = tracks.shape[:2]
    out = np.zeros((f, h, w, feat.shape[-1]), np.float32)
    for fi in range(f):
        for pi in range(p):
            if not valid[fi, pi]:
                continue
            px, py = tracks[fi, pi] / rate
            x1, y1 = int(np.floor(px)), int(np.floor(py))
            x2, y2 = x1 + 1, y1 + 1
            xf, yf = px - x1, py - y1
            x1c, x2c = np.clip([x1, x2], 0, w - 1)
            y1c, y2c = np.clip([y1, y2], 0, h - 1)
            out[fi, y1c, x1c] += feat[pi] * (1 - xf) * (1 - yf)
            out[fi, y1c, x2c] += feat[pi] * xf * (1 - yf)
            out[fi, y2c, x1c] += feat[pi] * (1 - xf) * yf
            out[fi, y2c, x2c] += feat[pi] * xf * yf
    return out


def test_bilinear_splat_matches_loop_reference(rng):
    k1, k2 = jax.random.split(rng)
    f, p, h, w, c = 3, 5, 8, 10, 4
    feat = jax.random.normal(k1, (p, c))
    tracks = jax.random.uniform(k2, (f, p, 2)) * jnp.array([w * 8, h * 8])
    # hide one point in one frame
    tracks = tracks.at[1, 2].set(jnp.array([-1.0, -1.0]))
    valid = (tracks[..., 0] >= 0) & (tracks[..., 1] >= 0)
    out = bilinear_splat(feat, tracks, valid, h, w, 8)
    ref = _ref_splat(np.asarray(feat), np.asarray(tracks), np.asarray(valid),
                     h, w, 8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_local_loss_mask_semantics():
    h = w = 16
    tracks = jnp.array([[[40.0, 40.0]], [[-1.0, -1.0]]])  # f=2, p=1
    valid = (tracks[..., 0] >= 0) & (tracks[..., 1] >= 0)
    m = np.asarray(local_loss_mask(tracks, valid, h, w, 8, radius=2))
    # point at 40/8=5 -> box [3,7) x [3,7)
    assert m[5, 5] == 1 and m[3, 3] == 1 and m[6, 6] == 1
    assert m[7, 7] == 0 and m[2, 3] == 0
    assert m.sum() == 16


def test_adapter_forward_shapes(rng):
    cfg = AdapterConfig(embedding_channels=16, channels=(8, 16, 16, 16),
                        mid_dim=8)
    adapter = SparsePointAdapter(cfg=cfg)
    tracks = jax.random.uniform(rng, (2, 3, 2)) * 64
    emb = jax.random.normal(rng, (3, 16))
    params = adapter.init(jax.random.PRNGKey(0), tracks, (64, 64), emb)
    states, mask = adapter.apply(params, tracks, (64, 64), emb,
                                 loss_type='local')
    assert [s.shape for s in states] == [
        (2, 8, 8, 8), (2, 4, 4, 16), (2, 2, 2, 16), (2, 1, 1, 16)]
    assert mask.shape == (2, 8, 8, 1)
    # dropout mask: all points dropped -> zero residuals
    states0 = adapter.apply(params, tracks, (64, 64), emb,
                            point_mask=jnp.zeros(3, bool))
    assert all(float(jnp.abs(s).max()) == 0 for s in states0)


def test_adapter_jits_under_scan(rng):
    cfg = AdapterConfig(embedding_channels=16, channels=(8, 16, 16, 16),
                        mid_dim=8)
    adapter = SparsePointAdapter(cfg=cfg)
    tracks = jax.random.uniform(rng, (2, 3, 2)) * 64
    emb = jax.random.normal(rng, (3, 16))
    params = adapter.init(jax.random.PRNGKey(0), tracks, (64, 64), emb)
    out = jax.jit(lambda p, t, e: adapter.apply(p, t, (64, 64), e))(
        params, tracks, emb)
    assert len(out) == 4
