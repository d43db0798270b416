"""Quality metrics: golden values from the closed-form definitions."""

import numpy as np

from videoswap_tpu.utils.metrics import (psnr, ssim, temporal_consistency,
                                         video_psnr)


def test_psnr_known_values():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float('inf')
    # uniform error e: psnr = 10 log10(1 / e^2) = -20 log10 e
    b = a + 0.1
    np.testing.assert_allclose(psnr(a, b), 20.0, rtol=1e-12)
    np.testing.assert_allclose(psnr(a, b, data_range=2.0),
                               20.0 + 10 * np.log10(4), rtol=1e-12)


def test_ssim_identity_and_symmetry():
    rs = np.random.RandomState(0)
    a = rs.rand(32, 32, 3)
    assert ssim(a, a) == 1.0
    b = np.clip(a + rs.randn(32, 32, 3) * 0.1, 0, 1)
    s = ssim(a, b)
    assert 0 < s < 1
    np.testing.assert_allclose(s, ssim(b, a), rtol=1e-12)


def test_ssim_constant_shift():
    """Constant images differing by d: luminance term only,
    ssim = (2 m1 m2 + c1) / (m1^2 + m2^2 + c1)."""
    a = np.full((16, 16), 0.5)
    b = np.full((16, 16), 0.6)
    c1 = 0.01 ** 2
    expected = (2 * 0.5 * 0.6 + c1) / (0.5 ** 2 + 0.6 ** 2 + c1)
    np.testing.assert_allclose(ssim(a, b), expected, rtol=1e-10)


def test_ssim_orders_degradations():
    rs = np.random.RandomState(1)
    a = rs.rand(48, 48)
    small = np.clip(a + rs.randn(48, 48) * 0.02, 0, 1)
    big = np.clip(a + rs.randn(48, 48) * 0.2, 0, 1)
    assert ssim(a, small) > ssim(a, big)
    assert psnr(a, small) > psnr(a, big)


def test_video_metrics():
    rs = np.random.RandomState(2)
    v = rs.rand(4, 16, 16, 3)
    assert video_psnr(v, v) == float('inf')
    w = np.clip(v + 0.05, 0, 1)
    assert 20 < video_psnr(v, w) < 30
    static = np.repeat(v[:1], 4, axis=0)
    assert temporal_consistency(static) == float('inf')
    assert temporal_consistency(v) < 20  # iid noise frames flicker hard
