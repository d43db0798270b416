from .dift import SDFeaturizer, dift_query
from .tracker import DIFTTracker
from .flow import pyramid_flow, compute_bidirectional_flow
from .pose import NativePoseDetector, OpenPoseBody, convert_openpose_body

__all__ = ['SDFeaturizer', 'dift_query', 'DIFTTracker', 'pyramid_flow',
           'compute_bidirectional_flow', 'NativePoseDetector',
           'OpenPoseBody', 'convert_openpose_body']
