from .dift import SDFeaturizer, dift_query
from .tracker import DIFTTracker
from .flow import pyramid_flow, compute_bidirectional_flow

__all__ = ['SDFeaturizer', 'dift_query', 'DIFTTracker', 'pyramid_flow',
           'compute_bidirectional_flow']
