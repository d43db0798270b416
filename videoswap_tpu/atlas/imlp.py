"""Coordinate MLPs for the Layered Neural Atlas.

Parity: /root/reference/videoswap/atlas/implicit_neural_networks.py —
`IMLP`/`IMLP_Hash` with pe_type in {none, encoding, hash_encoding} and an
8-layer ReLU MLP with optional skip connections and tanh output. The
reference's CUDA tinycudann pieces map to TPU as:

- tcnn HashGrid (16 levels, 2 feats, 2^19 table, base 16, scale 1.38,
  implicit_neural_networks.py:117-130) -> `hash_encode`: a pure-JAX
  multiresolution hash grid (per-level gather + bilinear interpolation,
  dense indexing for levels whose grid fits the table, spatial-hash
  otherwise — same scheme as tcnn). XLA fuses the gathers; the atlas
  batch (10k points) keeps the MXU busy in the MLP.
- tcnn FullyFusedMLP -> the same 'origin' MLP; "fully fused" on TPU is
  XLA's job (small matmuls fuse into one kernel chain).

Perf history (v5e): through round 2 the training-time bottleneck was the
TABLE-GRADIENT SCATTER, ~42 ns/row independent of XLA formulation — one
big scatter-add, segment_sum, and sorted-segment_sum all tie (sorting
adds cost). Round 3 replaces it with a Pallas one-hot-matmul kernel
(ops/hash_table_grad.py) via hash_encode's custom VJP: the scatter
becomes dense MXU contractions whose MAC count is exactly
table_entries x rows x feats. Forward gathers stay on XLA (~8x cheaper
per row than the old scatter). Batching evals (one apply over
concatenated point sets, see atlas/trainer.py) does not change the
row count — it is fixed by tcnn parity (points x levels x 4 corners).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash_table_grad import hash_table_grad, hash_table_grad_xla

HASH_PRIMES = (1, 2654435761, 805459861)


def positional_encode(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Fourier features ordered like the reference's positionalEncoding_vec
    (implicit_neural_networks.py:12-16): per frequency j, all sin(x_i b_j)
    then all cos(x_i b_j)."""
    b = jnp.asarray([(2.0 ** j) * math.pi for j in range(num_freqs)],
                    dtype=x.dtype)
    proj = x[..., :, None] * b[None, :]                # [N, D, J]
    feat = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-2)
    # [N, 2D, J] -> [N, J, 2D] -> [N, J*2D]
    feat = jnp.swapaxes(feat, -1, -2)
    return feat.reshape(*x.shape[:-1], -1)


def _level_resolutions(n_levels: int, base_resolution: int,
                       per_level_scale: float) -> list[int]:
    return [int(math.floor(base_resolution * per_level_scale ** lv))
            for lv in range(n_levels)]


_CORNERS = ((0, 0), (1, 0), (0, 1), (1, 1))


def _level_geometry(x: jnp.ndarray, res: int, table_size: int):
    """Per-corner indices and bilinear weights for one level.

    Returns idx4 [4, N] int32, w4 [4, N] fp32, frac [N, 2] fp32. The index
    formula must match between forward and the custom backward, so both
    call this single helper. Dense levels use modular wrap; finer levels
    use the tcnn-style uint32 spatial hash."""
    pos = x[:, :2].astype(jnp.float32) * res
    c0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - c0
    idxs, ws = [], []
    dense = (res + 1) ** 2 <= table_size
    for dx, dy in _CORNERS:
        cx = c0[:, 0] + dx
        cy = c0[:, 1] + dy
        if dense:                          # dense level (tcnn-style)
            idx = (cx % (res + 1)) + (cy % (res + 1)) * (res + 1)
        else:                              # spatial hash (uint32 wrap)
            ux = cx.astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[0])
            uy = cy.astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[1])
            idx = ((ux ^ uy) % jnp.uint32(table_size)).astype(jnp.int32)
        w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
             * jnp.where(dy, frac[:, 1], 1 - frac[:, 1]))
        idxs.append(idx)
        ws.append(w)
    return jnp.stack(idxs), jnp.stack(ws), frac


def _hash_encode_impl(x: jnp.ndarray, table: jnp.ndarray,
                      base_resolution: int,
                      per_level_scale: float) -> jnp.ndarray:
    n_levels, table_size, _ = table.shape
    outs = []
    for lv, res in enumerate(_level_resolutions(
            n_levels, base_resolution, per_level_scale)):
        idx4, w4, _ = _level_geometry(x, res, table_size)
        acc = 0.0
        for c in range(4):
            acc = acc + table[lv][idx4[c]] * w4[c][:, None]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hash_encode(x, table, base_resolution, per_level_scale):
    return _hash_encode_impl(x, table, base_resolution, per_level_scale)


def _hash_encode_fwd(x, table, base_resolution, per_level_scale):
    out = _hash_encode_impl(x, table, base_resolution, per_level_scale)
    return out, (x, table)


def _hash_encode_bwd(base_resolution, per_level_scale, res_, g):
    """d_table via the Pallas one-hot-matmul kernel (ops/hash_table_grad):
    autodiff would emit a scatter-add that serializes at ~42 ns/row on TPU
    and dominated the atlas train step. d_x is the analytic bilinear
    derivative (cheap gathers)."""
    x, table = res_
    n_levels, table_size, nf = table.shape
    use_kernel = jax.default_backend() == 'tpu'
    g32 = g.astype(jnp.float32)
    d_tab_levels = []
    dpos = jnp.zeros((x.shape[0], 2), jnp.float32)
    for lv, res in enumerate(_level_resolutions(
            n_levels, base_resolution, per_level_scale)):
        idx4, w4, frac = _level_geometry(x, res, table_size)
        g_lv = g32[:, lv * nf:(lv + 1) * nf]              # [N, F]
        # table cotangent: R = 4N weighted rows scattered by index
        rows_val = (w4[:, :, None] * g_lv[None]).reshape(-1, nf)  # [4N, F]
        if use_kernel:
            d_tab = hash_table_grad(idx4.reshape(-1), rows_val.T,
                                    table_size)
        else:
            d_tab = hash_table_grad_xla(idx4.reshape(-1), rows_val.T,
                                        table_size)
        d_tab_levels.append(d_tab)
        # input cotangent: dw_c/dfrac with w_c = u_c(fx) v_c(fy)
        s_c = jnp.einsum('cnf,nf->cn', table[lv][idx4].astype(jnp.float32),
                         g_lv)                            # [4, N]
        fx, fy = frac[:, 0], frac[:, 1]
        u = jnp.stack([1 - fx, fx, 1 - fx, fx])           # per corner
        v = jnp.stack([1 - fy, 1 - fy, fy, fy])
        sgn_x = jnp.asarray([-1.0, 1.0, -1.0, 1.0])[:, None]
        sgn_y = jnp.asarray([-1.0, -1.0, 1.0, 1.0])[:, None]
        dfx = jnp.sum(sgn_x * v * s_c, axis=0)
        dfy = jnp.sum(sgn_y * u * s_c, axis=0)
        dpos = dpos + float(res) * jnp.stack([dfx, dfy], axis=-1)
    d_table = jnp.stack(d_tab_levels).astype(table.dtype)
    d_x = jnp.zeros(x.shape, jnp.float32).at[:, :2].set(dpos)
    return d_x.astype(x.dtype), d_table


_hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


def hash_encode(x: jnp.ndarray, table: jnp.ndarray, *,
                base_resolution: int = 16,
                per_level_scale: float = 1.38,
                custom_vjp: bool = True) -> jnp.ndarray:
    """Multiresolution hash encoding for 2-D inputs.

    x: [N, 2] (the atlas UV, roughly in [0, 1] / [-1, 0] quadrants —
    out-of-range coordinates hash fine, matching tcnn behavior);
    table: [L, T, F] learned features. Returns [N, L*F].

    custom_vjp=True routes the table gradient through the Pallas
    one-hot-matmul kernel on TPU (ops/hash_table_grad.py) instead of the
    serialization-bound XLA scatter; False keeps plain autodiff (used by
    gradient-parity tests)."""
    if not custom_vjp:
        return _hash_encode_impl(x, table, base_resolution, per_level_scale)
    return _hash_encode(x, table, base_resolution, per_level_scale)


class IMLP(nn.Module):
    """pe_type: 'none' | 'encoding' | 'hash_encoding'; 8-layer ReLU MLP
    with skip connections and tanh output."""
    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    pe_type: str = 'none'
    pe_dim: int = 10
    skip_layers: Sequence[int] = ()
    mlp_layers: int = 8
    use_tanh: bool = True
    hash_levels: int = 16
    hash_feats: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.38
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pe_type == 'hash_encoding':
            table = self.param(
                'hash_table',
                lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                -1e-4, 1e-4),
                (self.hash_levels, 2 ** self.log2_hashmap_size,
                 self.hash_feats))
            x = hash_encode(x, table,
                            base_resolution=self.base_resolution,
                            per_level_scale=self.per_level_scale)
        elif self.pe_type == 'encoding':
            x = positional_encode(x, self.pe_dim)

        inp = x
        for i in range(self.mlp_layers):
            if i > 0:
                x = nn.relu(x)
            if i in tuple(self.skip_layers):
                x = jnp.concatenate([x, inp], axis=-1)
            out_dim = (self.output_dim if i == self.mlp_layers - 1
                       else self.hidden_dim)
            x = nn.Dense(out_dim, dtype=self.dtype, name=f'hidden_{i}')(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x


def imlp_from_opt(opt: dict) -> IMLP:
    """Build from the reference YAML model blocks (IMLP_Hash kwargs).

    The hash-grid hyperparameters are hardcoded in the reference
    (implicit_neural_networks.py:117-130: 16 levels x 2 feats, 2^19 table,
    base 16, scale 1.38) — those are our defaults — but unlike the
    reference we also honor YAML overrides for them."""
    return IMLP(
        input_dim=opt['input_dim'],
        output_dim=opt['output_dim'],
        hidden_dim=opt.get('hidden_dim', 256),
        pe_type=opt.get('pe_type', 'none'),
        pe_dim=opt.get('pe_dim', 10),
        skip_layers=tuple(opt.get('skip_layers', []) or []),
        mlp_layers=opt.get('mlp_layers', 8),
        use_tanh=opt.get('use_tanh', True),
        hash_levels=opt.get('n_levels', opt.get('hash_levels', 16)),
        hash_feats=opt.get('n_features_per_level', opt.get('hash_feats', 2)),
        log2_hashmap_size=opt.get('log2_hashmap_size', 19),
        base_resolution=opt.get('base_resolution', 16),
        per_level_scale=opt.get('per_level_scale', 1.38),
    )
