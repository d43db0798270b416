"""Preprocessing A: semantic point extraction -> TAP.pth.

Parity: /root/reference/extract_semantic_point.py — humans: OpenPose
keypoints per frame (thirdparty controlnet_aux when present, else the
native JAX OpenPose body model, preprocess/pose.py) with averaged-DIFT
embeddings and confidence filtering at 0.7; objects/animals: keyframe
annotation JSON propagated by a tracker (thirdparty co-tracker when
present, else the native DIFT tracker), embeddings from the keyframe DIFT
feature with cosine-confidence filtering at 0.35 (drifting frames marked
[-1, -1]).

Writes the reference TAP.pth format:
{pred_tracks [F,P,2], point_name2id, point_embedding [P,1280]}
(:229), consumable by either framework.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from pathlib import Path

import numpy as np
from PIL import Image

from videoswap_tpu.builders import build_models
from videoswap_tpu.preprocess.dift import SDFeaturizer, dift_query
from videoswap_tpu.preprocess.tracker import (DIFTTracker,
                                              load_thirdparty_cotracker)
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import get_logger
from videoswap_tpu.utils.vis_util import OPENPOSE_NAME2ID


def _load_frames(frame_dir: str) -> tuple[list, list[np.ndarray]]:
    paths = sorted(Path(frame_dir).iterdir())
    pil = [Image.open(p).convert('RGB') for p in paths]
    arrs = [np.asarray(p, np.float32) / 127.5 - 1.0 for p in pil]
    return pil, arrs


def _build_pose_detector(pose_ckpt: str | None):
    """thirdparty controlnet_aux when present (reference behavior), else
    the native JAX OpenPose body model from a local body_pose_model.pth
    (videoswap_tpu/preprocess/pose.py) — same gated-import pattern as the
    tracker/flow fallbacks."""
    try:
        from controlnet_aux import OpenposeDetector  # type: ignore
        return OpenposeDetector.from_pretrained('lllyasviel/Annotators')
    except ImportError:
        pass
    except Exception as e:  # noqa: BLE001 — from_pretrained needs network;
        # in a no-egress environment it raises a non-ImportError even when
        # controlnet_aux is installed. Fall through to the native detector.
        get_logger().info(f'controlnet_aux unavailable ({e}); '
                          'falling back to native OpenPose')
    from videoswap_tpu.preprocess.pose import NativePoseDetector
    pose_ckpt = pose_ckpt or os.environ.get(
        'VS_OPENPOSE_CKPT', 'pretrained_models/body_pose_model.pth')
    if not osp.isfile(pose_ckpt):
        raise RuntimeError(
            'human keypoint extraction needs either controlnet_aux or a '
            f'local OpenPose body checkpoint (looked at {pose_ckpt}; set '
            '--pose_ckpt or VS_OPENPOSE_CKPT), or use --is_human false '
            'with a keyframe annotation')
    return NativePoseDetector.from_checkpoint(pose_ckpt)


def propagate_human_keypoint(frame_dir: str,
                             detector=None,
                             pose_ckpt: str | None = None) -> dict:
    """OpenPose 18-keypoint tracks per frame (reference :34-77)."""
    if detector is None:
        detector = _build_pose_detector(pose_ckpt)
    pil, _ = _load_frames(frame_dir)
    tracks = np.full((len(pil), 18, 2), -1.0, np.float32)
    for fi, img in enumerate(pil):
        pose = detector.detect_poses(np.asarray(img))
        if pose:
            kps = pose[0].body.keypoints
            w, h = img.size
            for ki, kp in enumerate(kps[:18]):
                if kp is not None:
                    tracks[fi, ki] = (kp.x * w, kp.y * h)
    return {'pred_tracks': tracks, 'point_name2id': dict(OPENPOSE_NAME2ID)}


def _native_cotracker_ckpt():
    from videoswap_tpu.preprocess.cotracker_native import \
        find_cotracker_checkpoint
    return find_cotracker_checkpoint()


def propagate_general_keypoint(frame_dir: str, annotation_path: str,
                               featurizer: SDFeaturizer,
                               category: str) -> dict:
    """Keyframe JSON {name: [y, x]} -> tracks (reference :80-111)."""
    with open(annotation_path) as f:
        anno = json.load(f)
    keyframe_idx = int(osp.splitext(osp.basename(annotation_path))[0])
    names = [k for k, v in anno.items() if len(v)]
    points_xy = np.asarray([[anno[k][1], anno[k][0]] for k in names],
                           np.float32)

    _, arrs = _load_frames(frame_dir)
    cotracker = load_thirdparty_cotracker()
    if cotracker is not None:
        get_logger().info('tracking with thirdparty co-tracker')
        import torch
        video = torch.from_numpy(
            (np.stack(arrs) / 2 + 0.5) * 255).permute(0, 3, 1, 2)[None]
        queries = torch.tensor(
            [[keyframe_idx, x, y] for x, y in points_xy])[None].float()
        pred, _ = cotracker()(video, queries=queries,
                              backward_tracking=True)
        tracks = pred[0].numpy().astype(np.float32)
    elif _native_cotracker_ckpt() is not None:
        # the native CoTracker v1 port (flax graph + converter), selected
        # automatically whenever the public checkpoint is on disk
        from videoswap_tpu.preprocess.cotracker_native import \
            NativeCoTrackerPredictor
        ckpt = _native_cotracker_ckpt()
        get_logger().info(f'tracking with native co-tracker ({ckpt})')
        predictor = NativeCoTrackerPredictor.from_checkpoint(ckpt)
        video = (np.stack(arrs) / 2 + 0.5) * 255
        queries = np.asarray(
            [[keyframe_idx, x, y] for x, y in points_xy],
            np.float32)[None]
        pred, _ = predictor(video, queries, backward_tracking=True)
        tracks = pred[0].astype(np.float32)
    else:
        get_logger().info('tracking with native DIFT tracker')
        tracker = DIFTTracker(featurizer)
        tracks = tracker.track(arrs, keyframe_idx, points_xy, category)
    return {'pred_tracks': tracks,
            'point_name2id': {n: i for i, n in enumerate(names)}}


def extract_point_embedding(tap_dict: dict, frame_dir: str,
                            keyframe_annotation_path: str | None,
                            featurizer: SDFeaturizer, category: str,
                            is_human: bool) -> dict:
    prompt_cat = category
    _, arrs = _load_frames(frame_dir)
    tracks = np.asarray(tap_dict['pred_tracks'], np.float32)
    f, p = tracks.shape[:2]
    feats = [featurizer.forward(a, f'photo of a {prompt_cat}')
             for a in arrs]
    emb = None
    count = np.zeros(p)

    if is_human:
        for fi, a in enumerate(arrs):
            h, w = a.shape[:2]
            from videoswap_tpu.preprocess.dift import _resize_feat
            ft = np.asarray(_resize_feat(feats[fi], h, w))
            if emb is None:
                emb = np.zeros((p, ft.shape[-1]), np.float32)
            for pi in range(p):
                x, y = tracks[fi, pi]
                if x >= 0 and y >= 0:
                    emb[pi] += ft[int(round(y)) % h, int(round(x)) % w]
                    count[pi] += 1
    else:
        threshold = 0.35
        key_idx = int(osp.splitext(
            osp.basename(keyframe_annotation_path))[0])
        h, w = arrs[0].shape[:2]
        for fi in range(f):
            for pi in range(p):
                sx, sy = tracks[key_idx, pi]
                tx, ty = tracks[fi, pi]
                if tx >= w or ty >= h or tx < 0 or ty < 0:
                    tracks[fi, pi] = (-1, -1)
                    continue
                _, conf, vec = dift_query(
                    feats[key_idx], (h, w), (sx, sy), feats[fi], (h, w),
                    target_xy=(tx, ty))
                if emb is None:
                    emb = np.zeros((p, len(vec)), np.float32)
                if conf >= threshold:
                    emb[pi] += vec
                    count[pi] += 1
                else:
                    tracks[fi, pi] = (-1, -1)
    count = np.maximum(count, 1)
    tap_dict['pred_tracks'] = tracks
    tap_dict['point_embedding'] = (emb / count[:, None]).astype(np.float32)
    return tap_dict


def save_tap(tap: dict, path: str) -> None:
    import torch
    out = {}
    for k, v in tap.items():
        out[k] = torch.from_numpy(np.asarray(v)) \
            if isinstance(v, np.ndarray) else v
    torch.save(out, path)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--frame_dir', type=str, required=True)
    parser.add_argument('--is_human', type=str, default='false')
    parser.add_argument('--keyframe_annotation', type=str, default=None)
    parser.add_argument('--subject_category', type=str, default='object')
    parser.add_argument('--model_opt', type=str, default=None,
                        help='YAML with models/path blocks (for SD weights)')
    parser.add_argument('--pose_ckpt', type=str, default=None,
                        help='OpenPose body_pose_model.pth for the native '
                             'human-keypoint path (no controlnet_aux)')
    args = parser.parse_args()

    opt = load_config(args.model_opt) if args.model_opt else {'models': {}}
    models = build_models(opt, os.path.abspath('.'))
    featurizer = SDFeaturizer(
        unet=models['unet'], vae=models['vae'],
        text_encoder=models['text_encoder'], tokenizer=models['tokenizer'],
        sched=models['sched'], params=models['params'])

    is_human = args.is_human.lower() in ('1', 'true', 'yes')
    if is_human:
        tap = propagate_human_keypoint(args.frame_dir,
                                       pose_ckpt=args.pose_ckpt)
    else:
        tap = propagate_general_keypoint(
            args.frame_dir, args.keyframe_annotation, featurizer,
            args.subject_category)
    tap = extract_point_embedding(tap, args.frame_dir,
                                  args.keyframe_annotation, featurizer,
                                  args.subject_category, is_human)
    out_path = os.path.join(os.path.dirname(args.frame_dir), 'TAP.pth')
    save_tap(tap, out_path)
    print(f'saved {out_path}')
