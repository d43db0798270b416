"""Weights-present auto tier (VERDICT r03 #8): whenever real public
checkpoints are found on disk, converter + parity + behavior checks run
against them automatically; otherwise each test SKIPS with the path it
looked at. Readiness-for-weights is therefore continuously proven — drop
the files into pretrained_models/ (or set the VS_* env vars) and rerun.

Checkpoints covered:
  SD-1.5 diffusers dir        pretrained_models/chilloutmix (or $VS_SD_DIR)
  AnimateDiff motion modules  pretrained_models/mm_sd_v14.ckpt
  OpenPose body               pretrained_models/body_pose_model.pth
  UniMatch flow               gmflow-scale2-regrefine6*.pth
  CoTracker v1                cotracker_stride_4_wind_8.pth
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _path(env: str, default: str) -> str:
    return os.environ.get(env, default)


def _require(path: str):
    if not os.path.exists(path):
        pytest.skip(f'real checkpoint not on disk: {path}')
    return path


SD_DIR = _path('VS_SD_DIR', 'pretrained_models/chilloutmix')
MM_CKPT = _path('VS_MM_CKPT', 'pretrained_models/mm_sd_v14.ckpt')
POSE_CKPT = _path('VS_OPENPOSE_CKPT',
                  'pretrained_models/body_pose_model.pth')


def test_sd15_unet_vae_text_convert_and_forward():
    pre = _require(SD_DIR)
    _require(os.path.join(pre, 'unet', 'diffusion_pytorch_model.bin'))
    from videoswap_tpu.builders import build_models
    models = build_models(
        {'models': {}, 'path': {'pretrained_model_path': pre}}, '.',
        init_frames=1, init_size=64)
    out = jax.jit(models['unet'].apply)(
        models['params']['unet'], jnp.zeros((1, 1, 8, 8, 4)),
        jnp.array([500]), jnp.zeros((1, 77, 768)))
    assert np.isfinite(np.asarray(out)).all()


def test_motion_module_convert():
    _require(MM_CKPT)
    from videoswap_tpu.models import converters
    sd = converters.load_torch_file(MM_CKPT)
    assert any('motion_modules' in k or 'temporal' in k for k in sd)


def test_openpose_real_checkpoint():
    path = _require(POSE_CKPT)
    from videoswap_tpu.preprocess.pose import NativePoseDetector
    det = NativePoseDetector.from_checkpoint(path)
    img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8)
    out = det.detect_poses(img)          # random noise: likely no people
    assert isinstance(out, list)


def test_unimatch_real_checkpoint():
    from videoswap_tpu.preprocess.flow import find_unimatch_checkpoint
    ckpt = find_unimatch_checkpoint()
    if ckpt is None:
        pytest.skip('no gmflow-scale2-regrefine6 checkpoint on disk')
    from videoswap_tpu.preprocess.unimatch import UniMatchWrapper
    wrapper = UniMatchWrapper.from_checkpoint(ckpt)
    rs = np.random.RandomState(0)
    base = (rs.rand(64, 96, 3) * 255).astype(np.float32)
    # 3px-shifted copy: real weights must recover the shift closely
    shifted = np.roll(base, 3, axis=1)
    flow = wrapper.compute_flow(base, shifted)
    interior = flow[0, 16:-16, 16:-16]
    assert abs(float(np.median(interior[..., 0])) - 3.0) < 1.0
    assert abs(float(np.median(interior[..., 1]))) < 1.0
    # backward direction mirrors it
    assert abs(float(np.median(flow[1, 16:-16, 16:-16, 0])) + 3.0) < 1.0


def test_cotracker_real_checkpoint():
    from videoswap_tpu.preprocess.cotracker_native import (
        NativeCoTrackerPredictor, find_cotracker_checkpoint)
    ckpt = find_cotracker_checkpoint()
    if ckpt is None:
        pytest.skip('no cotracker_stride_4_wind_8 checkpoint on disk')
    predictor = NativeCoTrackerPredictor.from_checkpoint(ckpt)
    rs = np.random.RandomState(1)
    frame = (rs.rand(128, 160, 3) * 255).astype(np.float32)
    video = np.stack([np.roll(frame, 2 * i, axis=1) for i in range(10)])
    queries = np.array([[[0.0, 40.0, 60.0], [0.0, 100.0, 80.0]]],
                       np.float32)
    tracks, vis = predictor(video, queries, backward_tracking=True)
    # points ride the 2px/frame horizontal roll
    dx = np.diff(tracks[0, :, :, 0], axis=0)
    assert abs(float(np.median(dx)) - 2.0) < 1.0
    assert np.isfinite(tracks).all()


def test_readiness_report_runs(tmp_path, capsys):
    """scripts/validate_real_weights.py: the one-command PASS/SKIP/FAIL
    report. On a weightless machine every artifact SKIPs (exit 0); a
    present-but-corrupt artifact must FAIL (exit 1), not crash."""
    import sys
    sys.path.insert(0, 'scripts')
    import validate_real_weights as vrw

    out_json = tmp_path / 'report.json'
    rc = vrw.main(['--json', str(out_json)])
    report = __import__('json').load(open(out_json))
    assert set(report) == {n for n, _ in vrw.CHECKS}
    if all(r['status'] == 'SKIP' for r in report.values()):
        assert rc == 0

    # corrupt ED-LoRA checkpoint -> FAIL + nonzero exit
    bad = tmp_path / 'edlora_model-latest.pth'
    bad.write_bytes(b'not a torch file')
    os.environ['VS_EDLORA_CKPT'] = str(bad)
    try:
        rc = vrw.main(['--only', 'edlora_concepts'])
    finally:
        del os.environ['VS_EDLORA_CKPT']
    assert rc == 1
    assert 'FAIL' in capsys.readouterr().out
