"""Native (C++) frame preprocessor: build, parity vs PIL and vs the
numpy oracle, fused crop+normalize, dataset wiring, and fallback."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from videoswap_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native backend failed to build')


@pytest.mark.parametrize('out_hw', [(64, 64), (40, 100), (150, 200)])
def test_resample_matches_pil_and_oracle(out_hw):
    rs = np.random.RandomState(0)
    img = (rs.rand(77, 123, 3) * 255).astype(np.uint8)
    oh, ow = out_hw
    got = native.preprocess_frame(img, resize=(oh, ow))
    # PIL BILINEAR uses the same triangle-filter geometry but 8-bit
    # fixed-point coefficients: agreement within 1 LSB
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR),
                     np.float32) / 255.0
    assert np.abs(got - ref).max() <= 1.001 / 255
    # the float-precision numpy restatement must match exactly
    oracle = native.resample_triangle_np(img, oh, ow) / 255.0
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_identity_resize_is_exact():
    rs = np.random.RandomState(1)
    img = (rs.rand(32, 48, 3) * 255).astype(np.uint8)
    got = native.preprocess_frame(img, resize=(32, 48))
    np.testing.assert_allclose(got, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_fused_crop_normalize_matches_pil_chain():
    rs = np.random.RandomState(2)
    img = (rs.rand(90, 140, 3) * 255).astype(np.uint8)
    r = Image.fromarray(img).resize((100, 80), Image.BILINEAR)
    left, top = (100 - 64) // 2, (80 - 48) // 2
    ref = np.asarray(r.crop((left, top, left + 64, top + 48)),
                     np.float32) / 255.0
    ref = (ref - 0.5) / 0.5
    got = native.preprocess_frame(img, resize=(80, 100), crop=(48, 64),
                                  mean=[0.5] * 3, std=[0.5] * 3)
    assert got.shape == (48, 64, 3)
    assert np.abs(got - ref).max() <= 2.002 / 255  # 1 LSB / std
    # fused == unfused native steps exactly
    unfused = native.preprocess_frame(img, resize=(80, 100), crop=(48, 64))
    np.testing.assert_allclose(got, (unfused - 0.5) / 0.5, atol=1e-6)


def test_shorter_side_resize_semantics():
    # torchvision int-size semantics: shorter side -> size, aspect kept
    assert native.resize_shape(77, 123, 64) == (64, 102)
    assert native.resize_shape(123, 77, 64) == (102, 64)
    assert native.resize_shape(50, 50, 64) == (64, 64)


def test_dataset_native_matches_python_path(tmp_path):
    from scripts.make_smoke_dataset import make
    from videoswap_tpu.data.frame_point_dataset import \
        SingleVideoPointDataset
    make(str(tmp_path), frames=4, size=64)
    opt = {
        'path': str(tmp_path / 'frames'),
        'tap_path': str(tmp_path / 'TAP.pth'),
        'prompt': 'smoke',
        'num_frames': 2, 'total_frames': 4,
        'video_transform': [
            {'type': 'Resize', 'size': 48},
            {'type': 'CenterCrop', 'size': 48},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5, 0.5, 0.5],
             'std': [0.5, 0.5, 0.5]},
        ],
    }
    ds_native = SingleVideoPointDataset(dict(opt))
    ds_python = SingleVideoPointDataset(dict(opt, no_native_loader=True))
    assert ds_native.pixels.shape == ds_python.pixels.shape
    assert ds_native.pixels.dtype == np.float32
    # within PIL's fixed-point rounding, scaled by 1/std
    assert np.abs(ds_native.pixels - ds_python.pixels).max() <= 2.1 / 255


def test_non_canonical_chain_falls_back(tmp_path):
    from videoswap_tpu.data.frame_point_dataset import _native_chain
    assert _native_chain([
        {'type': 'Resize', 'size': 48},
        {'type': 'ToTensor'},
        {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]}]) is not None
    # wrong order / unknown transform -> python path
    assert _native_chain([
        {'type': 'ToTensor'}, {'type': 'Resize', 'size': 48}]) is None
    assert _native_chain([
        {'type': 'T2I_Preprocess', 'height': 8, 'width': 8}]) is None
    assert _native_chain([{'type': 'Resize', 'size': 48},
                          {'type': 'ToTensor'}]) is None  # no Normalize


def test_env_disable(monkeypatch):
    import importlib
    import videoswap_tpu.native as nat
    monkeypatch.setenv('VS_NO_NATIVE', '1')
    monkeypatch.setattr(nat, '_TRIED', False)
    monkeypatch.setattr(nat, '_LIB', None)
    assert not nat.available()
    monkeypatch.delenv('VS_NO_NATIVE')
    monkeypatch.setattr(nat, '_TRIED', False)
    assert nat.available()
    importlib.reload(nat)
