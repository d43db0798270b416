"""videoswap_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for customized
video subject swapping with semantic point correspondence.

Re-implements the full capability surface of showlab/VideoSwap (CVPR 2024,
reference at /root/reference) with a TPU-first design:

- SD-1.5 U-Net inflated to 3D with AnimateDiff temporal motion modules,
  written in flax.linen with channels-last (B, F, H, W, C) layout.
- DDIM inversion + sampling as `jax.lax.scan` loops with HBM-resident latents.
- SparsePointAdapter implemented as a vectorized bilinear scatter-add
  (replaces the per-point Python loops of the reference's adapter_model.py).
- Prompt-to-prompt attention control via functional "attention taps"
  (captured/edited attention probabilities threaded through scan carries),
  replacing the reference's runtime `Attention.processor` monkey-patching.
- Pallas flash-attention kernels for the spatial/cross/temporal attention.
- Device-mesh parallelism (`jax.sharding` + pjit): data / frame(sequence) /
  model(tensor) axes, with XLA-inserted collectives over ICI.
"""

__version__ = '0.1.0'
