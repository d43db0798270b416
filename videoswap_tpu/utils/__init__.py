from .config import cfg_get, dump_config, load_config, resolve_path
from .registry import (DATASET_REGISTRY, MODEL_REGISTRY, PIPELINE_REGISTRY,
                       TRANSFORM_REGISTRY, Registry)

__all__ = [
    'Registry', 'DATASET_REGISTRY', 'MODEL_REGISTRY', 'PIPELINE_REGISTRY',
    'TRANSFORM_REGISTRY', 'load_config', 'dump_config', 'cfg_get',
    'resolve_path',
]
