"""YAML config loading.

The reference uses OmegaConf (`train.py:26`, `test.py:134`) purely as a YAML
loader + `to_container(resolve=True)`; there is no interpolation in any shipped
config. We therefore load with pyyaml directly and keep the same public
surface: a nested dict of plain Python types, `~` -> None, `!!float` floats.
"""

from __future__ import annotations

import os
from typing import Any

import yaml


def load_config(path: str) -> dict:
    with open(path, 'r') as f:
        cfg = yaml.safe_load(f)
    if cfg is None:
        cfg = {}
    if not isinstance(cfg, dict):
        raise ValueError(f'Config root must be a mapping: {path}')
    return cfg


def dump_config(cfg: dict) -> str:
    return yaml.safe_dump(cfg, sort_keys=False)


def cfg_get(cfg: dict, dotted: str, default: Any = None) -> Any:
    """Fetch `a.b.c` from nested dicts, returning `default` when missing."""
    node: Any = cfg
    for key in dotted.split('.'):
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def resolve_path(root_path: str, p: str | None) -> str | None:
    """Paths in configs are relative to the repo/experiment root."""
    if p is None:
        return None
    if os.path.isabs(p):
        return p
    return os.path.join(root_path, p)
