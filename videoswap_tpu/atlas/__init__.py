from .imlp import IMLP, hash_encode, positional_encode
from .losses import (alpha_bce_loss, gradient_loss, optical_flow_alpha_loss,
                     optical_flow_loss, rigidity_loss, sparsity_loss)

__all__ = [
    'IMLP', 'hash_encode', 'positional_encode', 'gradient_loss',
    'rigidity_loss', 'optical_flow_loss', 'optical_flow_alpha_loss',
    'sparsity_loss', 'alpha_bce_loss',
]
