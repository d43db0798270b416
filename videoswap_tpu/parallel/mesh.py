"""Device mesh construction.

The reference's only multi-device story is accelerate-DDP gradient
all-reduce over NCCL (SURVEY.md §2.12/§5.8). The TPU-native design is a
`jax.sharding.Mesh` with three axes:

- `dp`   data parallel (videos / batch)
- `sp`   sequence parallel over the FRAME axis `f` of (B, F, H, W, C):
         convs and spatial attention are frame-local, so frame sharding is
         embarrassingly parallel; the temporal (motion-module) attention
         mixes frames, where GSPMD inserts the all-to-all over ICI
         (Ulysses-style; SURVEY.md §5.7)
- `tp`   tensor parallel over attention heads / FFN hidden (Megatron-style
         kernel sharding via `param_sharding_rules`)

Collectives are inserted by XLA from sharding annotations — no explicit
NCCL/MPI translation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


class MeshAxes(NamedTuple):
    dp: str = 'dp'
    sp: str = 'sp'
    tp: str = 'tp'


AXES = MeshAxes()


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over (dp, sp, tp). Default: all devices on `sp` (the natural
    single-video axis), dp=tp=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n, 1)
    assert int(np.prod(shape)) == n, f'mesh {shape} != {n} devices'
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)
