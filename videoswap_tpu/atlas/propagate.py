"""Point-drag displacement propagation through the atlas.

Parity: /root/reference/propagate_point_displacement.py:19-146 — a user
edits named point positions on one keyframe; the keyframe displacement maps
to canonical UV via the local Jacobian of the FG mapping (finite
differences, compute_Wm :19-32), then the inverse mapping's Jacobian maps
the UV delta back to every frame; alpha gates visibility; the edited
`pred_tracks` replace the TAP file's tracks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import losses


def compute_wm(xyt: jnp.ndarray, fn, deltax: float, deltay: float
               ) -> jnp.ndarray:
    """Finite-difference Jacobian rows: [N, 2, out_dim]."""
    dx = xyt.at[:, 0].add(deltax)
    dy = xyt.at[:, 1].add(deltay)
    base = fn(xyt)
    jac_x = (fn(dx) - base) / deltax
    jac_y = (fn(dy) - base) / deltay
    return jnp.stack([jac_x, jac_y], axis=1)


def propagate_point(x, y, target_x, target_y, t, num_frames: int,
                    fg_map, fg_inv, norm_s, norm_t):
    """Per-frame displacement (normalized coords) of a dragged point
    (reference propogate_point :35-56)."""
    xyt = jnp.asarray([[norm_s(x), norm_s(y), norm_t(t)]], jnp.float32)
    uv = fg_map(xyt)                                   # [1, 2]

    wm = compute_wm(xyt, fg_map, deltax=0.1, deltay=0.05)  # [1, 2, 2]
    dxdy = jnp.asarray([[[norm_s(target_x) - norm_s(x),
                          norm_s(target_y) - norm_s(y)]]], jnp.float32)
    delta_uv = jnp.einsum('bij,bjk->bik', dxdy, wm)    # [1, 1, 2]

    frames_t = norm_t(jnp.arange(num_frames, dtype=jnp.float32))[:, None]
    uvt = jnp.concatenate(
        [jnp.broadcast_to(uv, (num_frames, 2)), frames_t], axis=-1)
    wm_inv = compute_wm(uvt, fg_inv, deltax=0.1, deltay=0.05)[..., :2]
    delta_uv_all = jnp.broadcast_to(delta_uv, (num_frames, 1, 2))
    delta_xy = jnp.einsum('bij,bjk->bik', delta_uv_all, wm_inv)
    return delta_xy[:, 0, :]                           # [F, 2]


def propagate_point_sequence(source_points: dict, target_points: dict,
                             keyframe_t: int, pred_tracks: np.ndarray,
                             point_name2id: dict, fg_map, fg_inv, f_alpha,
                             larger_dim: int, num_frames: int,
                             norm_s, norm_t) -> np.ndarray:
    """Rewrite pred_tracks for every edited point (reference :76-126).
    source/target points: {name: [y, x]} (the reference's json layout)."""
    tracks = np.array(pred_tracks, np.float32)
    for name, v in source_points.items():
        if name not in target_points or len(v) == 0:
            continue
        point_idx = point_name2id[name]
        tracks[:, point_idx, :] = -1.0

        sy, sx = v
        ty, tx = target_points[name]

        src_xyt = jnp.asarray(
            [[norm_s(sx), norm_s(sy), norm_t(keyframe_t)]], jnp.float32)
        uv = fg_map(src_xyt)
        frames_t = norm_t(jnp.arange(num_frames, dtype=jnp.float32))[:, None]
        uvt = jnp.concatenate(
            [jnp.broadcast_to(uv, (num_frames, 2)), frames_t], axis=-1)
        base_xyt = fg_inv(uvt)                          # [F, 3]

        delta_xy = propagate_point(sx, sy, tx, ty, keyframe_t, num_frames,
                                   fg_map, fg_inv, norm_s, norm_t)
        warp_xy = np.asarray(base_xyt[:, :2] + delta_xy)
        alpha = np.asarray(losses.scaled_alpha(f_alpha(base_xyt)))[:, 0]

        vis = alpha > 0.5
        px = np.round((warp_xy[:, 0] + 1) / 2 * larger_dim)
        py = np.round((warp_xy[:, 1] + 1) / 2 * larger_dim)
        tracks[vis, point_idx, 0] = px[vis]
        tracks[vis, point_idx, 1] = py[vis]
    return tracks


def bind_nets(nets: dict, params: dict):
    """(apply closures) for fg_map / fg_inv / f_alpha."""
    fg = jax.jit(lambda x: nets['FG_UV_Mapping'].apply(
        params['FG_UV_Mapping'], x))
    inv = jax.jit(lambda x: nets['FG_UV_Mapping_Inverse'].apply(
        params['FG_UV_Mapping_Inverse'], x))
    al = jax.jit(lambda x: nets['F_Alpha'].apply(params['F_Alpha'], x))
    return fg, inv, al
