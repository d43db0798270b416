"""Concept-image dataset for ED-LoRA subject finetuning.

The VideoSwap reference consumes ED-LoRA checkpoints trained by
Mix-of-Show on a handful of captioned subject images; this dataset is
that input surface: a directory of images, each paired with a caption
containing the concept name (e.g. 'a photo of a catA1 on the grass').
Captions come from `<stem>.txt` sidecar files, a `captions_file`
(one line per image, sorted order), or a single `caption_template`.

Output per item: {'pixels': (H, W, 3) float32 in [-1, 1], 'caption': str}.
Resize(shorter side) + CenterCrop(resolution) + normalize, reusing the
registered transform chain so geometry matches the video datasets.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from videoswap_tpu.utils.registry import DATASET_REGISTRY

from .transforms import Compose

_IMG_EXTS = {'.png', '.jpg', '.jpeg', '.webp', '.bmp'}


@DATASET_REGISTRY.register()
class ConceptImageDataset:

    def __init__(self, opt: dict):
        self.opt = opt
        root = Path(opt['image_dir'])
        self.paths = sorted(p for p in root.iterdir()
                            if p.suffix.lower() in _IMG_EXTS)
        if not self.paths:
            raise FileNotFoundError(f'no images under {root}')

        res = int(opt.get('resolution', 512))
        self.transform = Compose(opt.get('image_transform', [
            {'type': 'Resize', 'size': res},
            {'type': 'CenterCrop', 'size': res},
            {'type': 'ToTensor'},
            {'type': 'Normalize', 'mean': [0.5, 0.5, 0.5],
             'std': [0.5, 0.5, 0.5]},
        ]))

        self.captions = self._load_captions(opt)
        self.pixels = np.stack([
            np.asarray(self.transform(Image.open(p).convert('RGB')),
                       np.float32)
            for p in self.paths])                     # (N, H, W, 3)

    def _load_captions(self, opt: dict) -> list[str]:
        if opt.get('captions_file'):
            lines = [ln.strip() for ln in
                     Path(opt['captions_file']).read_text().splitlines()
                     if ln.strip()]
            if len(lines) != len(self.paths):
                raise ValueError(
                    f'captions_file has {len(lines)} lines for '
                    f'{len(self.paths)} images')
            return lines
        sidecars = [p.with_suffix('.txt') for p in self.paths]
        if all(s.is_file() for s in sidecars):
            return [s.read_text().strip() for s in sidecars]
        template = opt.get('caption_template')
        if template is None:
            raise ValueError('need captions_file, per-image .txt sidecars, '
                             'or caption_template')
        return [template] * len(self.paths)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        return {'pixels': self.pixels[index],
                'caption': self.captions[index]}
