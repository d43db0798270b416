"""Layered-neural-atlas losses as pure functions.

Parity: /root/reference/videoswap/atlas/loss_utils.py and the loss assembly
in train_atlas.py:164-249. All functions take the coordinate batch as
integer pixel coords (x, y, f) [N] plus normalization closures, and the
atlas nets as (apply_fn, params) pairs bound by the trainer. Data-dependent
torch.where selections become masked means (identical expectations).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return (values * m).sum() / jnp.maximum(m.sum(), 1.0)


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a finite gradient at 0 (jnp.linalg.norm's gradient is
    NaN there, and masked-out entries would still poison the backward pass
    through 0 * NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def scaled_alpha(raw: jnp.ndarray) -> jnp.ndarray:
    """tanh output -> (0.001, 0.991): the reference's log-safety squeeze
    (train_atlas.py:152-155)."""
    return (0.5 * (raw + 1.0)) * 0.99 + 0.001


def atlas_rgb(f_atlas, uv: jnp.ndarray, layer: str) -> jnp.ndarray:
    """FG colors sampled from quadrant +0.5, BG from -0.5
    (train_atlas.py:157-160)."""
    shift = 0.5 if layer == 'fg' else -0.5
    return (f_atlas(uv * 0.5 + shift) + 1.0) * 0.5


def reconstruct_rgb(fg_uv, bg_uv, alpha, f_atlas):
    rgb_fg = atlas_rgb(f_atlas, fg_uv, 'fg')
    rgb_bg = atlas_rgb(f_atlas, bg_uv, 'bg')
    return rgb_fg * alpha + rgb_bg * (1.0 - alpha), rgb_fg, rgb_bg


def rgb_loss(rgb_out: jnp.ndarray, rgb_gt: jnp.ndarray) -> jnp.ndarray:
    return (jnp.linalg.norm(rgb_out - rgb_gt, axis=-1) ** 2).mean()


def alpha_bce_loss(alpha: jnp.ndarray, alpha_gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(-alpha_gt * jnp.log(alpha)
                    - (1 - alpha_gt) * jnp.log(1 - alpha))


def sparsity_loss(rgb_fg: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Penalize FG atlas colors where alpha ~ 0 (train_atlas.py:193-196)."""
    ghost = rgb_fg * (1.0 - alpha)
    return (jnp.linalg.norm(ghost, axis=-1) ** 2).mean()


def gradient_loss_pre(rgb_out, rgb_out_x1, rgb_out_y1, dx_gt, dy_gt):
    """Gradient loss from precomputed shifted reconstructions — the batched
    trainer evaluates all nets once over concatenated point sets and feeds
    the slices here (same math as `gradient_loss`)."""
    d_out_x = rgb_out_x1 - rgb_out
    d_out_y = rgb_out_y1 - rgb_out
    return jnp.mean(jnp.linalg.norm(dx_gt - d_out_x, axis=-1) ** 2
                    + jnp.linalg.norm(dy_gt - d_out_y, axis=-1) ** 2)


def gradient_loss(xyf, rgb_out, dx_gt, dy_gt, fg_map, bg_map, f_alpha,
                  f_atlas, norm_s, norm_t):
    """Finite-difference image-gradient reconstruction (loss_utils.py:5-48).

    xyf: [N, 3] int coords; dx_gt/dy_gt: [N, 3] precomputed I(x+1)-I(x),
    I(y+1)-I(y)."""
    x, y, f = xyf[:, 0], xyf[:, 1], xyf[:, 2]

    def xyt(px, py):
        return jnp.stack([norm_s(px), norm_s(py), norm_t(f)], axis=-1)

    p_x1 = xyt(x + 1, y)
    p_y1 = xyt(x, y + 1)
    out = {}
    for tag, p in (('x', p_x1), ('y', p_y1)):
        a = scaled_alpha(f_alpha(p))
        rgb, _, _ = reconstruct_rgb(fg_map(p), bg_map(p), a, f_atlas)
        out[tag] = rgb
    return gradient_loss_pre(rgb_out, out['x'], out['y'], dx_gt, dy_gt)


def rigidity_loss_all(uv, uv_xm, uv_ym, derivative_amount: int,
                      larger_dim: int,
                      uv_mapping_scale: float) -> jnp.ndarray:
    """Per-point rigidity values (reference loss_utils.py:109-110
    `return_all=True` — used by the evaluation's per-pixel loss videos)."""
    scale = larger_dim / 2.0 / uv_mapping_scale / derivative_amount
    du_dx = (uv[:, 0] - uv_xm[:, 0]) * scale
    du_dy = (uv[:, 0] - uv_ym[:, 0]) * scale
    dv_dx = (uv[:, 1] - uv_xm[:, 1]) * scale
    dv_dy = (uv[:, 1] - uv_ym[:, 1]) * scale

    # JtJ entries
    a = du_dx ** 2 + dv_dx ** 2 + 0.001
    b = du_dx * du_dy + dv_dx * dv_dy
    c = b
    dd = du_dy ** 2 + dv_dy ** 2 + 0.001

    jtj_norm = jnp.sqrt(a ** 2 + b ** 2 + c ** 2 + dd ** 2)
    det = a * dd - b * c
    inv_norm = jtj_norm / jnp.maximum(jnp.abs(det), 1e-9)
    return jtj_norm + inv_norm


def rigidity_loss_pre(uv, uv_xm, uv_ym, derivative_amount: int,
                      larger_dim: int,
                      uv_mapping_scale: float) -> jnp.ndarray:
    """Rigidity from precomputed shifted UV evals (same math as
    `rigidity_loss`; used by the batched trainer step)."""
    return rigidity_loss_all(uv, uv_xm, uv_ym, derivative_amount,
                             larger_dim, uv_mapping_scale).mean()


def rigidity_loss(xyf, uv, uv_map, derivative_amount: int, larger_dim: int,
                  uv_mapping_scale: float, norm_s, norm_t) -> jnp.ndarray:
    """Jacobian-close-to-rotation loss (loss_utils.py:52-112)."""
    x, y, f = xyf[:, 0], xyf[:, 1], xyf[:, 2]
    d = derivative_amount
    p_ym = jnp.stack([norm_s(x), norm_s(y - d), norm_t(f)], axis=-1)
    p_xm = jnp.stack([norm_s(x - d), norm_s(y), norm_t(f)], axis=-1)
    return rigidity_loss_pre(uv, uv_map(p_xm), uv_map(p_ym), d,
                             larger_dim, uv_mapping_scale)


def _flow_match_coords(xyf, flows, direction: int, norm_s, norm_t):
    """coords moved by the (forward:+1 / backward:-1) flow at each point."""
    x, y, f = xyf[:, 0], xyf[:, 1], xyf[:, 2]
    fl = flows[f, y, x]                        # [N, 2]
    mx = x.astype(jnp.float32) + fl[:, 0]
    my = y.astype(jnp.float32) + fl[:, 1]
    mf = (f + direction).astype(jnp.float32)
    return jnp.stack([norm_s(mx), norm_s(my), norm_t(mf)], axis=-1)


def optical_flow_loss_pre(uv, uv_match_f, uv_match_b, valid_f, valid_b,
                          larger_dim: int, uv_mapping_scale: float,
                          alpha=None) -> jnp.ndarray:
    """Flow loss from precomputed flow-matched UV evals (same math as
    `optical_flow_loss`; used by the batched trainer step)."""
    unit = larger_dim / 2.0 / uv_mapping_scale
    total = 0.0
    for uv_match, valid in ((uv_match_f, valid_f), (uv_match_b, valid_b)):
        err = safe_norm(uv_match - uv) * unit
        if alpha is not None:
            err = err * alpha[:, 0]
        total = total + masked_mean(err, valid) * 0.5
    return total


def optical_flow_loss(xyf, uv, uv_map, flows, flow_masks, flows_rev,
                      flow_masks_rev, larger_dim: int,
                      uv_mapping_scale: float, norm_s, norm_t,
                      alpha=None) -> jnp.ndarray:
    """UV consistency along forward+backward flow (loss_utils.py:132-153).

    flows: [F, H, W, 2] (forward maps f->f+1; reverse maps f->f-1);
    masks: [F, H, W] consistency masks."""
    x, y, f = xyf[:, 0], xyf[:, 1], xyf[:, 2]
    match_f = _flow_match_coords(xyf, flows, 1, norm_s, norm_t)
    match_b = _flow_match_coords(xyf, flows_rev, -1, norm_s, norm_t)
    return optical_flow_loss_pre(
        uv, uv_map(match_f), uv_map(match_b),
        flow_masks[f, y, x], flow_masks_rev[f, y, x],
        larger_dim, uv_mapping_scale, alpha=alpha)


def optical_flow_loss_all(uv, uv_match_f, valid_f, larger_dim: int,
                          uv_mapping_scale: float, alpha=None):
    """Per-point forward-flow UV error (reference loss_utils.py:116-130
    `get_optical_flow_loss_all`): zero where the flow-consistency mask is
    off, scaled by alpha and the pixel unit."""
    unit = larger_dim / (2.0 * uv_mapping_scale)
    err = safe_norm(uv_match_f - uv)
    err = jnp.where(valid_f > 0, err, 0.0)
    if alpha is not None:
        err = err * alpha[:, 0]
    return err * unit


def flow_alpha_loss_all(alpha, a_match_f, valid_f) -> jnp.ndarray:
    """Per-point forward-flow alpha error (reference loss_utils.py:237-257
    `get_optical_flow_alpha_loss_all`)."""
    err = jnp.abs(alpha - a_match_f)[:, 0]
    return jnp.where(valid_f > 0, err, 0.0)


def optical_flow_alpha_loss_pre(alpha, a_match_f, a_match_b, valid_f,
                                valid_b) -> jnp.ndarray:
    """Alpha flow loss from precomputed flow-matched alpha evals (same
    math as `optical_flow_alpha_loss`; used by the batched trainer)."""
    total = 0.0
    for a_match, valid in ((a_match_f, valid_f), (a_match_b, valid_b)):
        err = jnp.abs(alpha - a_match)[:, 0]
        total = total + masked_mean(err, valid) * 0.5
    return total


def optical_flow_alpha_loss(xyf, alpha, f_alpha, flows, flow_masks,
                            flows_rev, flow_masks_rev, norm_s,
                            norm_t) -> jnp.ndarray:
    """Alpha consistency along the flow (loss_utils.py:212-233)."""
    x, y, f = xyf[:, 0], xyf[:, 1], xyf[:, 2]
    match_f = _flow_match_coords(xyf, flows, 1, norm_s, norm_t)
    match_b = _flow_match_coords(xyf, flows_rev, -1, norm_s, norm_t)
    return optical_flow_alpha_loss_pre(
        alpha, scaled_alpha(f_alpha(match_f)),
        scaled_alpha(f_alpha(match_b)),
        flow_masks[f, y, x], flow_masks_rev[f, y, x])
