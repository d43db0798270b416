from .concept_dataset import ConceptImageDataset
from .frame_point_dataset import SingleVideoPointDataset
from .transforms import build_transform

from videoswap_tpu.utils.registry import DATASET_REGISTRY


def build_dataset(opt: dict):
    opt = dict(opt)
    ds_type = opt.pop('type')
    return DATASET_REGISTRY.get(ds_type)(opt)


__all__ = ['ConceptImageDataset', 'SingleVideoPointDataset',
           'build_transform', 'build_dataset']
