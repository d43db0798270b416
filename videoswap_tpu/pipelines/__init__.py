from .videoswap_pipeline import VideoSwapPipeline
from .trainer import VideoSwapTrainer

from videoswap_tpu.utils.registry import PIPELINE_REGISTRY  # noqa: F401

__all__ = ['VideoSwapPipeline', 'VideoSwapTrainer']
