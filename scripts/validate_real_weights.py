"""Real-artifact readiness report: one command that runs every weight
converter + parity/behavior check against whatever checkpoints exist under
the conventional paths and prints a per-artifact PASS/SKIP/FAIL table.

The artifact list mirrors the reference's download script
(/root/reference/scripts/prepare_dataset_model.sh): SD-1.5 diffusers dir
("chilloutmix"), its tokenizer, AnimateDiff mm_sd_v14 motion modules,
VideoSwap adapter checkpoints, ED-LoRA concept checkpoints, OpenPose body
model, UniMatch (gmflow-scale2-regrefine6) flow, CoTracker v1, and a CLIP
image tower for the metrics surface. Every check is the same code path the
framework uses in production (builders/converters/predictors) — a PASS
here means the artifact will load and behave when train.py/test.py run.

Usage:
    python scripts/validate_real_weights.py [--json out.json]

Paths can be overridden with the same VS_* env vars tests/test_real_weights.py
uses (VS_SD_DIR, VS_MM_CKPT, VS_OPENPOSE_CKPT, VS_EDLORA_CKPT, VS_CLIP_DIR,
VS_ADAPTER_CKPT). Exit code: 1 if any check FAILs (a present-but-broken
artifact); SKIPs are expected on weightless machines.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class Skip(Exception):
    pass


def _need(path, what: str):
    if not path or not os.path.exists(path):
        raise Skip(f'{what} not on disk: {path}')
    return path


def _first(pattern_list):
    for pat in pattern_list:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[0]
    return None


SD_DIR = os.environ.get('VS_SD_DIR', 'pretrained_models/chilloutmix')


# ---------------------------------------------------------------- checks
def check_sd15():
    _need(os.path.join(SD_DIR, 'unet', 'diffusion_pytorch_model.bin'),
          'SD-1.5 diffusers dir')
    import jax
    import jax.numpy as jnp

    from videoswap_tpu.builders import build_models
    models = build_models(
        {'models': {}, 'path': {'pretrained_model_path': SD_DIR}}, '.',
        init_frames=1, init_size=64)
    out = jax.jit(models['unet'].apply)(
        models['params']['unet'], jnp.zeros((1, 1, 8, 8, 4)),
        jnp.array([500]), jnp.zeros((1, 77, 768)))
    assert np.isfinite(np.asarray(out)).all(), 'non-finite unet output'
    img = jax.jit(lambda p, x: models['vae'].apply(
        p, x, method=type(models['vae']).encode_video))(
        models['params']['vae'], jnp.zeros((1, 1, 64, 64, 3)))
    assert np.isfinite(np.asarray(img)).all(), 'non-finite vae latents'
    return 'unet+vae+text converted strictly; tiny forward finite'


def check_tokenizer():
    _need(os.path.join(SD_DIR, 'tokenizer'), 'CLIPTokenizer dir')
    from videoswap_tpu.utils.tokenizer import load_tokenizer
    tok = load_tokenizer(SD_DIR)
    assert type(tok).__name__ == 'CLIPTokenizer', type(tok).__name__
    ids = tok(['a photo of a cat'], padding='max_length', max_length=77,
              truncation=True).input_ids
    assert np.asarray(ids).shape == (1, 77)
    n0 = len(tok)
    tok.add_tokens(['<readiness_tok_0>'])
    tid = tok.convert_tokens_to_ids('<readiness_tok_0>')
    assert tid >= n0, 'added token did not extend the vocab'
    return f'real CLIPTokenizer; vocab {n0}, added-token id {tid}'


def check_motion_module():
    path = os.environ.get('VS_MM_CKPT', 'pretrained_models/mm_sd_v14.ckpt')
    _need(path, 'AnimateDiff motion checkpoint')
    import jax
    import jax.numpy as jnp

    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.models import converters
    sd = converters.load_torch_file(path)
    assert any('motion_modules' in k or 'temporal' in k for k in sd), \
        'no motion keys in checkpoint'
    # convert into the full-size 3D U-Net (motion keys consumed, zero
    # missing motion params) — the exact overlay build_models performs
    unet = AnimateDiffUNet3DModel(cfg=UNet3DConfig())
    k = jax.random.PRNGKey(0)
    params = jax.jit(unet.init)(k, jnp.zeros((1, 1, 8, 8, 4)),
                                jnp.array([0]), jnp.zeros((1, 77, 768)))
    p, missing, unused = converters.convert_unet(sd, params['params'])
    n_motion_missing = sum('motion' in '/'.join(map(str, m))
                           for m in missing)
    assert n_motion_missing == 0, \
        f'{n_motion_missing} motion params missing from the checkpoint'
    return f'motion overlay ok ({len(sd)} torch keys, 0 motion-missing)'


def check_adapter():
    path = os.environ.get('VS_ADAPTER_CKPT') or _first([
        'pretrained_models/VideoSwap_Model/**/adapter.pth',
        'experiments/pretrained_models/VideoSwap_Model/**/adapter.pth'])
    _need(path, 'trained SparsePointAdapter checkpoint')
    import jax
    import jax.numpy as jnp

    from videoswap_tpu.builders import load_adapter_checkpoint
    from videoswap_tpu.models import (AdapterConfig, SparsePointAdapter)
    adapter = SparsePointAdapter(cfg=AdapterConfig())
    params = jax.jit(lambda k, t, e: adapter.init(k, t, (512, 512), e))(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 2)), jnp.zeros((2, 1280)))
    loaded = load_adapter_checkpoint(path, params['params'])
    assert jax.tree_util.tree_structure(loaded) == \
        jax.tree_util.tree_structure(params['params'])
    return f'adapter checkpoint round-trips: {path}'


def check_edlora():
    path = os.environ.get('VS_EDLORA_CKPT') or _first([
        'pretrained_models/ED-LoRA/**/*.pth',
        'experiments/pretrained_models/ED-LoRA/**/*.pth'])
    _need(path, 'ED-LoRA checkpoint')
    from videoswap_tpu.models import converters
    sd = converters.load_torch_file(path)
    if 'params' in sd:
        sd = sd['params']
    assert 'new_concept_embedding' in sd, 'schema: new_concept_embedding'
    assert any(k.endswith('.lora_up.weight') for k in sd.get('unet', {})), \
        'schema: unet lora factors'
    emb = next(iter(sd['new_concept_embedding'].values()))
    shape = tuple(getattr(emb, 'shape', np.asarray(emb).shape))
    assert shape[-1] == 768, f'embedding dim {shape}'
    detail = f'schema ok ({list(sd["new_concept_embedding"])}, emb {shape})'
    # with SD weights present, also merge into the real text encoder
    if os.path.isdir(os.path.join(SD_DIR, 'text_encoder')):
        from videoswap_tpu.builders import build_models
        from videoswap_tpu.edlora import merge_lora_into_params
        models = build_models(
            {'models': {}, 'path': {'pretrained_model_path': SD_DIR}}, '.',
            init_frames=1, init_size=64)
        _, n = merge_lora_into_params(
            models['params']['text_encoder']['params'],
            sd.get('text_encoder', {}), 'text_encoder', 0.6,
            key_map=converters.clip_key_map)
        detail += f'; merged {n} text-encoder LoRAs into real SD weights'
    return detail


def check_openpose():
    path = os.environ.get('VS_OPENPOSE_CKPT',
                          'pretrained_models/body_pose_model.pth')
    _need(path, 'OpenPose body checkpoint')
    from videoswap_tpu.preprocess.pose import NativePoseDetector
    det = NativePoseDetector.from_checkpoint(path)
    img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8)
    out = det.detect_poses(img)
    return f'strict convert + decode ran (noise image -> {len(out)} people)'


def check_unimatch():
    from videoswap_tpu.preprocess.flow import find_unimatch_checkpoint
    ckpt = find_unimatch_checkpoint()
    _need(ckpt, 'UniMatch gmflow-scale2-regrefine6 checkpoint')
    from videoswap_tpu.preprocess.unimatch import UniMatchWrapper
    wrapper = UniMatchWrapper.from_checkpoint(ckpt)
    rs = np.random.RandomState(0)
    base = (rs.rand(64, 96, 3) * 255).astype(np.float32)
    shifted = np.roll(base, 3, axis=1)
    flow = wrapper.compute_flow(base, shifted)
    med = float(np.median(flow[0, 16:-16, 16:-16, 0]))
    assert abs(med - 3.0) < 1.0, f'3px shift recovered as {med:.2f}px'
    return f'strict convert; 3px shift -> median flow {med:.2f}px'


def check_cotracker():
    from videoswap_tpu.preprocess.cotracker_native import (
        NativeCoTrackerPredictor, find_cotracker_checkpoint)
    ckpt = find_cotracker_checkpoint()
    _need(ckpt, 'CoTracker stride4-wind8 checkpoint')
    predictor = NativeCoTrackerPredictor.from_checkpoint(ckpt)
    rs = np.random.RandomState(1)
    frame = (rs.rand(128, 160, 3) * 255).astype(np.float32)
    video = np.stack([np.roll(frame, 2 * i, axis=1) for i in range(10)])
    queries = np.array([[[0.0, 40.0, 60.0], [0.0, 100.0, 80.0]]],
                       np.float32)
    tracks, _ = predictor(video, queries, backward_tracking=True)
    dx = float(np.median(np.diff(tracks[0, :, :, 0], axis=0)))
    assert abs(dx - 2.0) < 1.0, f'2px/frame roll tracked as {dx:.2f}px'
    return f'strict convert; 2px/frame roll -> median dx {dx:.2f}px'


def check_clip_scorer():
    path = os.environ.get('VS_CLIP_DIR',
                          'pretrained_models/clip-vit-large-patch14')
    _need(os.path.join(path, 'config.json'), 'CLIP image-tower dir')
    import jax

    from videoswap_tpu.builders import build_clip_scorer
    from videoswap_tpu.models.clip_vision import preprocess_frames
    model, params = build_clip_scorer(path)
    pix = preprocess_frames(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32),
        image_size=model.vision_cfg.image_size)
    emb = jax.jit(lambda p, x: model.apply(p, x, method='image_embeds'))(
        params, pix)
    assert np.isfinite(np.asarray(emb)).all()
    return 'image tower loads; embeds finite'


CHECKS = [
    ('sd15_chilloutmix', check_sd15),
    ('clip_tokenizer', check_tokenizer),
    ('mm_sd_v14_motion', check_motion_module),
    ('videoswap_adapter', check_adapter),
    ('edlora_concepts', check_edlora),
    ('openpose_body', check_openpose),
    ('unimatch_gmflow', check_unimatch),
    ('cotracker_v1', check_cotracker),
    ('clip_image_tower', check_clip_scorer),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--json', default=None,
                    help='also write the report as JSON')
    ap.add_argument('--only', nargs='*', default=None,
                    help='subset of check names')
    args = ap.parse_args(argv)

    report = {}
    for name, fn in CHECKS:
        if args.only and name not in args.only:
            continue
        try:
            detail = fn()
            report[name] = {'status': 'PASS', 'detail': detail}
        except Skip as s:
            report[name] = {'status': 'SKIP', 'detail': str(s)}
        except Exception:
            report[name] = {'status': 'FAIL',
                            'detail': traceback.format_exc(limit=3)
                            .strip().splitlines()[-1]}
        print(f'{report[name]["status"]:4s} {name:20s} '
              f'{report[name]["detail"]}', flush=True)

    counts = {s: sum(1 for r in report.values() if r['status'] == s)
              for s in ('PASS', 'SKIP', 'FAIL')}
    print(f'== {counts["PASS"]} pass / {counts["SKIP"]} skip / '
          f'{counts["FAIL"]} fail', flush=True)
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(report, f, indent=2)
    return 1 if counts['FAIL'] else 0


if __name__ == '__main__':
    sys.exit(main())
