"""Single-video + semantic-point dataset.

Parity: /root/reference/videoswap/data/frame_point_dataset.py —
`num_frames` selected at a fixed stride from the first `total_frames`
frames of a directory (`select_frame_idx`, :13-22), transform chain applied
once and cached, TAP.pth conditions sub-indexed by the same frame
selection, `dataset_enlarge_ratio` faking the epoch length.

Output layout is channels-last: pixels (F, H, W, 3) float32 in [-1, 1];
`pred_tracks` (F, P, 2) float32 (x, y) in transformed-image pixels;
`point_embedding` (P, E) float32. TAP.pth is the reference's torch tensor
dict — loaded via torch (CPU) and converted to numpy.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from videoswap_tpu.utils.registry import DATASET_REGISTRY

from .transforms import Compose


def select_frame_idx(begin: int, end: int, n: int) -> list[int]:
    if n <= 1:
        return [begin]
    # reference uses (end-begin)//(n-1), which overflows for short videos
    # (e.g. end=4, n=2 -> [0, 4]); (end-begin-1)//(n-1) matches it on the
    # shipped 64-frame/16-sample configs (both give stride 4) and stays
    # in-range everywhere.
    interval = max((end - begin - 1) // (n - 1), 1)
    return [int(begin + i * interval) for i in range(n)]


def _native_chain(transforms: list[dict]):
    """If the transform chain is the canonical Resize -> [CenterCrop] ->
    ToTensor -> Normalize pipeline, return kwargs for the fused native
    (C++) preprocessor; else None (python path)."""
    kw = {}
    expect = iter(['Resize', 'CenterCrop', 'ToTensor', 'Normalize'])
    for t in transforms:
        for name in expect:
            if t['type'] == name:
                break
        else:
            return None
        if t['type'] == 'Resize':
            kw['resize'] = t['size']
        elif t['type'] == 'CenterCrop':
            kw['crop'] = t['size']
        elif t['type'] == 'Normalize':
            kw['mean'], kw['std'] = t['mean'], t['std']
    return kw if ('resize' in kw and 'mean' in kw) else None


def load_tap_file(tap_path: str) -> dict:
    import torch
    tap = torch.load(tap_path, map_location='cpu', weights_only=False)
    out = {}
    for k, v in tap.items():
        out[k] = v.numpy() if hasattr(v, 'numpy') else v
    return out


@DATASET_REGISTRY.register()
class SingleVideoPointDataset:

    def __init__(self, opt: dict):
        self.opt = opt
        frame_paths = sorted(Path(opt['path']).iterdir())
        self.select_id = select_frame_idx(
            0, min(len(frame_paths), opt['total_frames']), opt['num_frames'])
        self.video = [frame_paths[i] for i in self.select_id]
        self.prompt = opt['prompt']
        self.num_video = opt.get('dataset_enlarge_ratio', 1)

        from videoswap_tpu import native
        nkw = _native_chain(opt['video_transform'])
        if nkw is not None and native.available() \
                and not opt.get('no_native_loader'):
            # fused C++ resample+crop+normalize (videoswap_tpu/native):
            # one pass per frame, float32 accumulation (vs PIL's 8-bit
            # fixed point — agrees within 1 LSB, tests/test_native.py)
            raw = [np.asarray(Image.open(p).convert('RGB'), np.uint8)
                   for p in self.video]
            self.pixels = native.preprocess_frames(raw, **nkw)
        else:
            transform = Compose(opt['video_transform'])
            frames = [transform(Image.open(p).convert('RGB'))
                      for p in self.video]
            self.pixels = np.stack(frames).astype(np.float32)  # (F,H,W,3)
        self.size_y, self.size_x = self.pixels.shape[1:3]

        self.condition = (self.get_conditions(opt['tap_path'])
                          if opt.get('tap_path') else None)

    def __len__(self):
        return self.num_video

    def get_frames(self) -> list[Image.Image]:
        """PIL frames after the geometric transforms only."""
        geo = Compose([t for t in self.opt['video_transform']
                       if t['type'] not in ('ToTensor', 'Normalize')])
        return [geo(Image.open(p).convert('RGB')) for p in self.video]

    def get_conditions(self, tap_path: str | None = None) -> dict | None:
        if tap_path is None:
            return self.condition
        tap = load_tap_file(tap_path)
        tracks = np.asarray(tap['pred_tracks'], dtype=np.float32)
        emb = np.asarray(tap['point_embedding'], dtype=np.float32)
        assert tracks.shape[1] == emb.shape[0]
        return {
            'pred_tracks': tracks[self.select_id],
            'point_embedding': emb,
            'point_name2id': tap.get('point_name2id', {}),
            'img_size': (self.size_x, self.size_y),
        }

    def __getitem__(self, index: int) -> dict:
        batch = {'pixels': self.pixels, 'prompt': self.prompt}
        if self.condition is not None:
            batch.update(self.condition)
        return batch


def infinite_batches(dataset):
    """The reference wraps a DataLoader in an epoch-cycling yielder
    (train.py data yielder); one video, so a plain cycle suffices."""
    while True:
        for i in range(len(dataset)):
            yield dataset[i]
