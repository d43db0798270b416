"""Subpixel (phase-decomposed) nearest-upsample + 3x3 conv.

The reference's Upsample3D (reference resnet.py:21-69) nearest-upsamples
2x and then runs a 3x3 conv on the 4x-area tensor. On TPU that shape is
wasteful twice over: the upsampled tensor is materialized to HBM before
the conv reads it back, and the conv does 9 taps per output over an input
where each value is repeated 4 times.

Because nearest upsampling makes x_up[p] = x[p // 2], the 3x3 conv over
the upsampled grid collapses, per output phase (p mod 2, q mod 2), into a
2x2 conv over the LOW-res input whose taps are sums of the original 3x3
taps.  With padding=1 on the upsampled grid, output row 2i+a reads input
rows i + (a+k-1)//2 for kernel row k in {0,1,2}:

    a=0: offsets (-1, 0, 0)  ->  2-tap kernel [w0, w1+w2], pad (1, 0)
    a=1: offsets ( 0, 0, 1)  ->  2-tap kernel [w0+w1, w2], pad (0, 1)

and independently per axis, giving four 2x2 phase kernels.  The four
phase outputs interleave (depth-to-space) into the 2x upsampled result.
This is the SAME arithmetic (tap sums are computed in the fp32 param
dtype before the cast to the compute dtype), with 4*4=16 tap-area units
instead of 9*4=36 — 2.25x fewer MXU FLOPs — and no 4x HBM intermediate.

Used by the U-Net's three upsamplers (~2.2 TFLOP of the 21.8-TFLOP CFG
step) and the VAE decoder's three upsamplers (~11 of ~40 TFLOP per
16-frame decode).  Set VS_NO_SUBPIXEL=1 to force the naive path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DN = ('NHWC', 'HWIO', 'NHWC')

# Tap groups per phase: phase a's 2 taps gather these original kernel rows.
_GROUPS = (((0,), (1, 2)),      # a = 0: offsets (-1, 0)
           ((0, 1), (2,)))      # a = 1: offsets (0, +1)
_PADS = ((1, 0), (0, 1))        # zero-padding per phase (lo, hi)


def subpixel_enabled() -> bool:
    return os.environ.get('VS_NO_SUBPIXEL', '') != '1'


def _phase_kernel(kernel: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> the (2,2,Cin,Cout) kernel for output phase (a,b).

    Tap sums happen in the kernel's own (param, fp32) dtype so the only
    new rounding vs the naive conv is the final cast to the compute dtype.
    """
    rows, cols = _GROUPS[a], _GROUPS[b]
    return jnp.stack([
        jnp.stack([sum(kernel[k, l] for k in rows[p] for l in cols[q])
                   for q in range(2)], axis=0)
        for p in range(2)], axis=0)


def subpixel_upsample_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray,
                           dtype: jnp.dtype) -> jnp.ndarray:
    """(N, h, w, Cin) -> (N, 2h, 2w, Cout); == nearest-2x then conv3x3(pad 1).

    `kernel` is the ORIGINAL (3, 3, Cin, Cout) conv kernel in param dtype;
    `bias` is (Cout,).
    """
    n, h, w, _ = x.shape
    x = x.astype(dtype)
    phases = []
    for a in range(2):
        row = []
        for b in range(2):
            k_ab = _phase_kernel(kernel, a, b).astype(dtype)
            y = jax.lax.conv_general_dilated(
                x, k_ab, window_strides=(1, 1),
                padding=(_PADS[a], _PADS[b]), dimension_numbers=_DN)
            row.append(y + bias.astype(dtype))
        phases.append(row)
    # interleave: out[:, 2i+a, 2j+b] = phases[a][b][:, i, j]
    stacked = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    cout = stacked.shape[-1]
    return stacked.reshape(n, 2 * h, 2 * w, cout)


def naive_upsample_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, dtype: jnp.dtype,
                        out_hw: tuple[int, int]) -> jnp.ndarray:
    """Reference semantics: nearest-upsample to out_hw (ceil repeat + crop,
    reference resnet.py:38-56) then 3x3 conv, pad 1.  Used for ragged
    output sizes and the VS_NO_SUBPIXEL ablation."""
    _, h, w, _ = x.shape
    th, tw = out_hw
    x = jnp.repeat(jnp.repeat(x, (th + h - 1) // h, axis=1),
                   (tw + w - 1) // w, axis=2)[:, :th, :tw]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DN)
    return y + bias.astype(dtype)
