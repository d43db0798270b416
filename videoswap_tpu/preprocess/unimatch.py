"""Native UniMatch (GMFlow scale2 + regrefine6) optical flow in flax.

The reference's flow preprocessing runs the learned UniMatch model from a
thirdparty checkout (`/root/reference/scripts/extract_flow.py:31-43`:
feature_channels=128, num_scales=2, upsample_factor=4, num_head=1,
ffn_dim_expansion=4, num_transformer_layers=6, reg_refine=True, task=flow;
inference knobs attn_type='swin', attn_splits=[2,8], corr_radius=[-1,4],
prop_radius=[-1,1], num_reg_refine=6, pred_bidir_flow=True). This module
is that inference graph rebuilt TPU-first (channels-last, one jit), plus a
converter for the public
`gmflow-scale2-regrefine6-mixdata-train320x576-*.pth` checkpoint key set —
the `preprocess/pose.py` pattern: runnable the moment weights land on
disk, no torch/CUDA in the loop.

Architecture reconstructed from the published model (Xu et al., GMFlow
CVPR 2022 + Unifying Flow/Stereo/Depth TPAMI 2023; code structure of
github.com/autonomousvision? no — github.com/haofeixu/unimatch):

  backbone            CNNEncoder: 7x7/2 conv + InstanceNorm, 3 residual
                      layers (64,96,128; strides 1,2,1 for 2 scales),
                      1x1 conv, weight-shared trident conv producing the
                      1/4 and 1/8 branches
  transformer         6 x (self-attn + cross-attn-ffn) blocks, nhead=1,
                      swin-windowed with alternating half-window shifts,
                      bidirectional via the [f0;f1] <-> [f1;f0] batch trick
  matching            scale 0 (1/8): global correlation softmax (bidir =
                      corr and its transpose); scale 1 (1/4): local 9x9
                      correlation softmax on the flow-warped feature
  feature_flow_attn   SelfAttnPropagation: flow as value under feature
                      self-attention (global at scale 0, 3x3 local at 1)
  refine              6 iterations of RAFT-style update at 1/4: 9x9 local
                      correlation at the current flow, SepConvGRU, flow
                      head, convex-upsample mask (x4)

Numerical conventions matched to torch: align_corners=True bilinear
everywhere (`resize_ac`, `grid_sample` zeros padding), ImageNet
normalization of 0..255 inputs, biased InstanceNorm variance, exact GELU.
Parity is tested against a literal torch restatement of this layout on
random weights (tests/test_unimatch.py), and the converter against the
checkpoint-shaped key set; real-weight validation auto-runs when the
checkpoint exists (tests/test_real_weights.py).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# inference config pinned by the reference wrapper (extract_flow.py:44-53)
ATTN_SPLITS = (2, 8)
CORR_RADIUS = (-1, 4)
PROP_RADIUS = (-1, 1)
NUM_REG_REFINE = 6
UPSAMPLE_FACTOR = 4
PADDING_FACTOR = 32
MAX_LONG_EDGE = 768

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# torch-matched primitives
# ---------------------------------------------------------------------------


def resize_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics
    (src = dst * (in-1)/(out-1)); x is (..., H, W, C)."""
    h, w = x.shape[-3], x.shape[-2]
    ys = (jnp.arange(out_h) * ((h - 1) / (out_h - 1))
          if out_h > 1 else jnp.zeros((1,)))
    xs = (jnp.arange(out_w) * ((w - 1) / (out_w - 1))
          if out_w > 1 else jnp.zeros((1,)))
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[:, None, None]
    wx = (xs - x0).astype(x.dtype)[None, :, None]
    r0 = x[..., y0, :, :]
    r1 = x[..., y1, :, :]
    top = r0[..., x0, :] * (1 - wx) + r0[..., x1, :] * wx
    bot = r1[..., x0, :] * (1 - wx) + r1[..., x1, :] * wx
    return top * (1 - wy) + bot * wy


def grid_sample(img: jnp.ndarray, x: jnp.ndarray,
                y: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample(mode=bilinear, padding_mode=zeros,
    align_corners=True) in PIXEL coordinates. img (B, H, W, C);
    x, y (B, ...) -> (B, ..., C)."""
    h, w = img.shape[1], img.shape[2]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    def tap(xi, yi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = jax.vmap(lambda im, a, b: im[b, a])(img, xc, yc)
        return v * valid[..., None]

    x0, y0 = x0f, y0f
    x1, y1 = x0 + 1, y0 + 1
    return (tap(x0, y0) * (1 - wx) * (1 - wy) + tap(x1, y0) * wx * (1 - wy)
            + tap(x0, y1) * (1 - wx) * wy + tap(x1, y1) * wx * wy)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=False): per-sample per-channel over
    (H, W), biased variance."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def coords_grid(b: int, h: int, w: int) -> jnp.ndarray:
    """(B, H, W, 2) pixel coordinates in (x, y) order."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    return jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h, w, 2))


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.unfold(k=3, pad=1): (B, H, W, C) -> (B, H, W, 9, C), taps in
    torch's (C, kh, kw) row-major tap order (dy, dx)."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    taps = [pad[:, dy:dy + h, dx:dx + w] for dy in range(3)
            for dx in range(3)]
    return jnp.stack(taps, axis=3)


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR sine embedding, normalize=True, scale=2pi -> (H, W, 2F)
    with the y block first (gmflow position.py)."""
    scale = 2 * math.pi
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y_embed = y_embed / (h + 1e-6) * scale * jnp.ones((h, w))
    x_embed = x_embed / (w + 1e-6) * scale * jnp.ones((h, w))
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def split_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*k*k, H/k, W/k, C), window-major row order."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    bkk, hh, ww, c = x.shape
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hh, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hh, k * ww, c)


def shift_window_attn_mask(h: int, w: int, win_h: int, win_w: int,
                           shift_h: int, shift_w: int) -> np.ndarray:
    """Swin shifted-window mask: (K*K, win, win), 0 same-region /
    -100 cross-region (gmflow geometry.generate_shift_window_attn_mask)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -shift_h),
               slice(-shift_h, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -shift_w),
                   slice(-shift_w, None)):
            img[hs, ws] = cnt
            cnt += 1
    k = w // win_w
    wins = img.reshape(k, win_h, k, win_w).transpose(0, 2, 1, 3).reshape(
        k * k, win_h * win_w)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# modules (names mirror the torch checkpoint keys)
# ---------------------------------------------------------------------------


class TridentConv(nn.Module):
    """Weight-shared 3x3 conv applied at multiple strides (the backbone's
    MultiScaleTridentConv, bias-free). One kernel parameter named so the
    torch key is `backbone.trident_conv.weight`."""
    features: int

    @nn.compact
    def __call__(self, x, stride: int):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features))
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(stride, stride),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], name='conv1')(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    name='conv2')(y)
        y = nn.relu(instance_norm(y))
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name='downsample_0')(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """Backbone for num_output_scales=2: returns [f_1/8, f_1/4]
    (coarsest first, the order unimatch.extract_feature consumes)."""
    output_dim: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    name='conv1')(x)
        x = nn.relu(instance_norm(x))
        x = ResidualBlock(64, name='layer1_0')(x)
        x = ResidualBlock(64, name='layer1_1')(x)
        x = ResidualBlock(96, stride=2, has_downsample=True,
                          name='layer2_0')(x)
        x = ResidualBlock(96, name='layer2_1')(x)
        x = ResidualBlock(128, stride=1, has_downsample=True,
                          name='layer3_0')(x)
        x = ResidualBlock(128, name='layer3_1')(x)
        x = nn.Conv(self.output_dim, (1, 1), name='conv2')(x)
        # weight-shared trident conv: stride-1 (1/4) and stride-2 (1/8)
        trident = TridentConv(self.output_dim, name='trident_conv')
        f_quarter = trident(x, 1)
        f_eighth = trident(x, 2)
        return [f_eighth, f_quarter]


class TransformerLayer(nn.Module):
    d_model: int = 128
    no_ffn: bool = False
    ffn_expansion: int = 4

    @nn.compact
    def __call__(self, source, target, h, w, splits, with_shift, attn_mask):
        q = nn.Dense(self.d_model, name='q_proj')(source)
        k = nn.Dense(self.d_model, name='k_proj')(target)
        v = nn.Dense(self.d_model, name='v_proj')(target)
        c = self.d_model
        b = source.shape[0]
        if splits > 1:
            win_h, win_w = h // splits, w // splits
            qg = q.reshape(b, h, w, c)
            kg = k.reshape(b, h, w, c)
            vg = v.reshape(b, h, w, c)
            if with_shift:
                sh, sw = win_h // 2, win_w // 2
                qg = jnp.roll(qg, (-sh, -sw), axis=(1, 2))
                kg = jnp.roll(kg, (-sh, -sw), axis=(1, 2))
                vg = jnp.roll(vg, (-sh, -sw), axis=(1, 2))
            qs = split_windows(qg, splits).reshape(-1, win_h * win_w, c)
            ks = split_windows(kg, splits).reshape(-1, win_h * win_w, c)
            vs = split_windows(vg, splits).reshape(-1, win_h * win_w, c)
            scores = jnp.einsum('bqc,bkc->bqk', qs, ks) / (c ** 0.5)
            if with_shift:
                scores = scores + jnp.tile(attn_mask, (b, 1, 1))
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum('bqk,bkc->bqc', probs, vs)
            out = merge_windows(out.reshape(-1, win_h, win_w, c), splits)
            if with_shift:
                out = jnp.roll(out, (win_h // 2, win_w // 2), axis=(1, 2))
            message = out.reshape(b, h * w, c)
        else:
            scores = jnp.einsum('bqc,bkc->bqk', q, k) / (c ** 0.5)
            message = jnp.einsum('bqk,bkc->bqc',
                                 jax.nn.softmax(scores, -1), v)
        message = nn.Dense(self.d_model, name='merge')(message)
        message = nn.LayerNorm(name='norm1')(message)
        if not self.no_ffn:
            m = jnp.concatenate([source, message], axis=-1)
            m = nn.Dense(2 * self.d_model * self.ffn_expansion,
                         use_bias=False, name='mlp_0')(m)
            m = jax.nn.gelu(m, approximate=False)
            m = nn.Dense(self.d_model, use_bias=False, name='mlp_2')(m)
            message = nn.LayerNorm(name='norm2')(m)
        return source + message


class TransformerBlock(nn.Module):
    d_model: int = 128
    ffn_expansion: int = 4

    @nn.compact
    def __call__(self, source, target, h, w, splits, with_shift, attn_mask):
        source = TransformerLayer(self.d_model, no_ffn=True,
                                  name='self_attn')(
            source, source, h, w, splits, with_shift, attn_mask)
        source = TransformerLayer(self.d_model,
                                  ffn_expansion=self.ffn_expansion,
                                  name='cross_attn_ffn')(
            source, target, h, w, splits, with_shift, attn_mask)
        return source


class FeatureTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 128
    ffn_expansion: int = 4

    @nn.compact
    def __call__(self, feature0, feature1, splits):
        # (B, H, W, C) pair -> both directions via the [f0;f1]/[f1;f0] trick
        b, h, w, c = feature0.shape
        mask = None
        if splits > 1:
            mask = jnp.asarray(shift_window_attn_mask(
                h, w, h // splits, w // splits,
                h // splits // 2, w // splits // 2))
        concat0 = jnp.concatenate([feature0, feature1], 0).reshape(
            2 * b, h * w, c)
        concat1 = jnp.concatenate([feature1, feature0], 0).reshape(
            2 * b, h * w, c)
        for i in range(self.num_layers):
            with_shift = splits > 1 and i % 2 == 1
            concat0 = TransformerBlock(
                self.d_model, self.ffn_expansion, name=f'layers_{i}')(
                concat0, concat1, h, w, splits, with_shift, mask)
            concat1 = jnp.concatenate(
                [concat0[b:], concat0[:b]], axis=0)
        f0 = concat0[:b].reshape(b, h, w, c)
        f1 = concat0[b:].reshape(b, h, w, c)
        return f0, f1


class SelfAttnPropagation(nn.Module):
    """Flow propagation: feature self-attention with the flow as value.
    Note the torch quirk kept for weight parity: in the global path the
    key projection is applied to the ALREADY q-projected features."""
    in_channels: int = 128

    @nn.compact
    def __call__(self, feature, flow, local_radius: int):
        b, h, w, c = feature.shape
        if local_radius <= 0:
            q = nn.Dense(self.in_channels, name='q_proj')(
                feature.reshape(b, h * w, c))
            k = nn.Dense(self.in_channels, name='k_proj')(q)
            v = flow.reshape(b, h * w, flow.shape[-1])
            scores = jnp.einsum('bqc,bkc->bqk', q, k) / (c ** 0.5)
            out = jnp.einsum('bqk,bkd->bqd',
                             jax.nn.softmax(scores, -1), v)
            return out.reshape(b, h, w, -1)
        assert local_radius == 1, 'reference config uses radius 1'
        q = nn.Dense(self.in_channels, name='q_proj')(feature)  # (B,H,W,C)
        kmap = nn.Dense(self.in_channels, name='k_proj')(feature)
        k_win = unfold3x3(kmap)                     # (B, H, W, 9, C)
        v_win = unfold3x3(flow)                     # (B, H, W, 9, D)
        scores = jnp.einsum('bhwc,bhwkc->bhwk', q, k_win) / (c ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum('bhwk,bhwkd->bhwd', probs, v_win)


class BasicMotionEncoder(nn.Module):
    corr_channels: int = 81
    flow_dim: int = 2

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), name='convc1')(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)],
                              name='convc2')(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=[(3, 3), (3, 3)],
                              name='convf1')(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                              name='convf2')(flo))
        out = nn.relu(nn.Conv(128 - self.flow_dim, (3, 3),
                              padding=[(1, 1), (1, 1)], name='conv')(
            jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], -1)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], -1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (1, 5),
                               padding=[(0, 0), (2, 2)], name='convz1')(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (1, 5),
                               padding=[(0, 0), (2, 2)], name='convr1')(hx))
        q = jnp.tanh(nn.Conv(self.hidden_dim, (1, 5),
                             padding=[(0, 0), (2, 2)], name='convq1')(
            jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
        hx = jnp.concatenate([h, x], -1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (5, 1),
                               padding=[(2, 2), (0, 0)], name='convz2')(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (5, 1),
                               padding=[(2, 2), (0, 0)], name='convr2')(hx))
        q = jnp.tanh(nn.Conv(self.hidden_dim, (5, 1),
                             padding=[(2, 2), (0, 0)], name='convq2')(
            jnp.concatenate([r * h, x], -1)))
        return (1 - z) * h + z * q


class BasicUpdateBlock(nn.Module):
    corr_channels: int = 81
    downsample_factor: int = 4
    flow_dim: int = 2

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_channels, self.flow_dim,
                                    name='encoder')(flow, corr)
        inp = jnp.concatenate([inp, motion], -1)
        net = SepConvGRU(name='gru')(net, inp)
        d = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            name='flow_head_conv1')(net))
        delta = nn.Conv(self.flow_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        name='flow_head_conv2')(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            name='mask_0')(net))
        mask = nn.Conv(self.downsample_factor ** 2 * 9, (1, 1),
                       name='mask_2')(m)
        return net, mask, delta


# ---------------------------------------------------------------------------
# matching / propagation math
# ---------------------------------------------------------------------------


def global_correlation_softmax_bidir(f0, f1):
    """(B,H,W,C) pair -> bidirectional flow (2B,H,W,2): forward then
    backward (correlation transpose), reference pred_bidir_flow=True."""
    b, h, w, c = f0.shape
    corr = jnp.einsum('bpc,bqc->bpq', f0.reshape(b, -1, c),
                      f1.reshape(b, -1, c)) / (c ** 0.5)
    corr = jnp.concatenate([corr, corr.transpose(0, 2, 1)], axis=0)
    grid = coords_grid(1, h, w).reshape(1, -1, 2)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum('bpq,bqd->bpd', prob,
                                jnp.broadcast_to(grid, (2 * b, h * w, 2)))
    return correspondence.reshape(2 * b, h, w, 2) - coords_grid(2 * b, h, w)


def _window_offsets(radius: int) -> jnp.ndarray:
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing='ij')
    return jnp.stack([dx.reshape(-1), dy.reshape(-1)], -1)  # (K^2, 2) (x,y)


def local_correlation_softmax(f0, f1, radius: int):
    """Local matching: softmax over a (2r+1)^2 window, out-of-image
    candidates masked out; returns residual flow (f1 pre-warped)."""
    b, h, w, c = f0.shape
    grid = coords_grid(b, h, w)                       # (B,H,W,2)
    offs = _window_offsets(radius)                    # (K,2)
    sample = grid[:, :, :, None, :] + offs            # (B,H,W,K,2)
    valid = ((sample[..., 0] >= 0) & (sample[..., 0] < w)
             & (sample[..., 1] >= 0) & (sample[..., 1] < h))
    window = grid_sample(f1, sample[..., 0], sample[..., 1])  # (B,H,W,K,C)
    corr = jnp.einsum('bhwc,bhwkc->bhwk', f0, window) / (c ** 0.5)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum('bhwk,bhwkd->bhwd', prob, sample)
    return correspondence - grid


def local_correlation_with_flow(f0, f1, flow, radius: int):
    """(B,H,W,(2r+1)^2) correlation volume at flow-shifted windows
    (refine input; no masking, zero padding)."""
    b, h, w, c = f0.shape
    grid = coords_grid(b, h, w)
    offs = _window_offsets(radius)
    sample = (grid + flow)[:, :, :, None, :] + offs
    window = grid_sample(f1, sample[..., 0], sample[..., 1])
    return jnp.einsum('bhwc,bhwkc->bhwk', f0, window) / (c ** 0.5)


def flow_warp(feature, flow):
    b, h, w, _ = feature.shape
    grid = coords_grid(b, h, w) + flow
    return grid_sample(feature, grid[..., 0], grid[..., 1])


def upsample_flow_with_mask(flow, mask, factor: int):
    """RAFT convex upsampling; mask (B,H,W,9*f*f), flow (B,H,W,2)."""
    b, h, w, _ = flow.shape
    # torch layout: view(b, 1, 9, f, f, h, w) from channels (9*f*f)
    m = mask.transpose(0, 3, 1, 2).reshape(b, 9, factor, factor, h, w)
    m = jax.nn.softmax(m, axis=1)
    taps = unfold3x3(factor * flow)                   # (B,H,W,9,2)
    taps = taps.transpose(0, 3, 4, 1, 2)              # (B,9,2,H,W)
    up = (m[:, :, None] * taps[:, :, :, None, None]).sum(1)
    # (B,2,f,f,H,W) -> (B, H, f, W, f, 2) -> (B, H*f, W*f, 2)
    up = up.transpose(0, 4, 2, 5, 3, 1)
    return up.reshape(b, h * factor, w * factor, 2)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class UniMatchFlow(nn.Module):
    """GMFlow scale2 + regrefine6, bidirectional flow. Input: two
    (B, H, W, 3) images in 0..255 (H, W multiples of 32). Output
    (2B, H, W, 2) pixel flow — forward then backward halves."""
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_expansion: int = 4
    num_reg_refine: int = NUM_REG_REFINE

    @nn.compact
    def __call__(self, img0, img1):
        b = img0.shape[0]
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        norm = lambda im: (im / 255.0 - mean) / std   # noqa: E731
        feats = CNNEncoder(self.feature_channels, name='backbone')(
            jnp.concatenate([norm(img0), norm(img1)], axis=0))
        f0_list = [f[:b] for f in feats]
        f1_list = [f[b:] for f in feats]

        transformer = FeatureTransformer(
            self.num_transformer_layers, self.feature_channels,
            self.ffn_expansion, name='transformer')
        flow_attn = SelfAttnPropagation(self.feature_channels,
                                        name='feature_flow_attn')

        flow = None
        for scale_idx in range(2):
            f0, f1 = f0_list[scale_idx], f1_list[scale_idx]
            if scale_idx > 0:
                # bidirectional: batch doubled after the global matching
                f0, f1 = (jnp.concatenate([f0, f1], 0),
                          jnp.concatenate([f1, f0], 0))
            f0_ori, f1_ori = f0, f1
            if scale_idx > 0:
                h2, w2 = f0.shape[1], f0.shape[2]
                flow = resize_ac(flow, h2, w2) * 2
                f1 = flow_warp(f1, flow)

            splits = ATTN_SPLITS[scale_idx]
            hh, ww = f0.shape[1], f0.shape[2]
            pos = position_embedding_sine(hh // splits, ww // splits,
                                          self.feature_channels // 2)
            pos = jnp.tile(pos, (splits, splits, 1)) if splits > 1 else pos
            f0 = f0 + pos
            f1 = f1 + pos

            f0, f1 = transformer(f0, f1, splits)

            if CORR_RADIUS[scale_idx] == -1:
                flow_pred = global_correlation_softmax_bidir(f0, f1)
            else:
                flow_pred = local_correlation_softmax(
                    f0, f1, CORR_RADIUS[scale_idx])
            flow = flow_pred if flow is None else flow + flow_pred

            if scale_idx == 0:
                f0 = jnp.concatenate([f0, f1], 0)    # bidir propagation
            flow = flow_attn(f0, flow, PROP_RADIUS[scale_idx])

            if scale_idx == 1:
                proj = nn.Conv(256, (1, 1), name='refine_proj')(f0)
                net, inp = jnp.split(proj, 2, axis=-1)
                net = jnp.tanh(net)
                inp = nn.relu(inp)
                refine = BasicUpdateBlock(
                    corr_channels=(2 * 4 + 1) ** 2,
                    downsample_factor=UPSAMPLE_FACTOR, name='refine')
                for _ in range(self.num_reg_refine):
                    corr = local_correlation_with_flow(
                        f0_ori, f1_ori, flow, radius=4)
                    net, up_mask, delta = refine(net, inp, corr, flow)
                    flow = flow + delta
                flow = upsample_flow_with_mask(flow, up_mask,
                                               UPSAMPLE_FACTOR)
        return flow


# ---------------------------------------------------------------------------
# checkpoint converter + wrapper
# ---------------------------------------------------------------------------

# flax leaf-name fragments that differ from torch attribute paths
_KEY_SUBS = (
    ('flow_head_conv1', 'flow_head.conv1'),
    ('flow_head_conv2', 'flow_head.conv2'),
    ('mask_0', 'mask.0'),
    ('mask_2', 'mask.2'),
    ('downsample_0', 'downsample.0'),
)


def unimatch_key_map(key: str) -> str:
    for a, b in _KEY_SUBS:
        key = key.replace(a, b)
    return key


def convert_unimatch(torch_sd: dict, flax_params: dict) -> dict:
    """gmflow-scale2-regrefine6 checkpoint ({'model': state_dict} or a raw
    state dict) -> flax params. Strict: every flax param must be fed."""
    from videoswap_tpu.models import converters
    if 'model' in torch_sd and isinstance(torch_sd['model'], dict):
        torch_sd = torch_sd['model']
    torch_sd = {k[len('module.'):] if k.startswith('module.') else k: v
                for k, v in torch_sd.items()}
    params, missing, unused = converters.convert_state_dict(
        torch_sd, flax_params, key_map=unimatch_key_map, strict=True)
    return params


def expected_checkpoint_keys() -> list:
    """The key set of the public checkpoint (converter fixture)."""
    model = UniMatchFlow()
    varshapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 64, 64, 3)))
    from flax import traverse_util

    from videoswap_tpu.models import converters
    keys = []
    for path in traverse_util.flatten_dict(varshapes['params']):
        spath = tuple(str(p) for p in path)
        keys.append(unimatch_key_map(
            converters.flax_path_to_torch_key(spath)))
    return sorted(keys)


class UniMatchWrapper:
    """The reference wrapper protocol (extract_flow.py:55-133): resize
    long edge to <=768 (area), transpose when H>W (the model is trained
    width>height), bilinear-resize to a multiple of 32, run bidir,
    resize flow back with component rescaling. compute_flow(img0, img1)
    -> (2, H, W, 2) float32 (forward, backward)."""

    def __init__(self, params, num_reg_refine: int = NUM_REG_REFINE):
        self.model = UniMatchFlow(num_reg_refine=num_reg_refine)
        self.params = params
        self._jitted = {}

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> 'UniMatchWrapper':
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=False)
        model = UniMatchFlow()
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)),
                                jnp.zeros((1, 64, 64, 3)))
        template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                shapes)
        return cls(convert_unimatch(sd, template['params']), **kw)

    def _fn(self, shape):
        if shape not in self._jitted:
            self._jitted[shape] = jax.jit(
                lambda p, a, b: self.model.apply({'params': p}, a, b))
        return self._jitted[shape]

    def compute_flow(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        img0 = np.asarray(img0, np.float32)
        img1 = np.asarray(img1, np.float32)
        if img0.max() <= 1.5:                  # accept [0,1] inputs too
            img0, img1 = img0 * 255.0, img1 * 255.0
        h, w = img0.shape[:2]
        factor = max(h, w) / MAX_LONG_EDGE
        if factor > 1:
            nh, nw = int(h // factor), int(w // factor)
            img0 = np.asarray(resize_ac(jnp.asarray(img0), nh, nw))
            img1 = np.asarray(resize_ac(jnp.asarray(img1), nh, nw))
        else:
            nh, nw = h, w
        transpose = nh > nw
        if transpose:
            img0, img1 = img0.transpose(1, 0, 2), img1.transpose(1, 0, 2)
            nh, nw = nw, nh
        ih = int(np.ceil(nh / PADDING_FACTOR)) * PADDING_FACTOR
        iw = int(np.ceil(nw / PADDING_FACTOR)) * PADDING_FACTOR
        a = resize_ac(jnp.asarray(img0)[None], ih, iw)
        bb = resize_ac(jnp.asarray(img1)[None], ih, iw)
        flow = self._fn((ih, iw))(self.params, a, bb)   # (2, ih, iw, 2)
        if (ih, iw) != (nh, nw):
            flow = resize_ac(flow, nh, nw)
            flow = flow * jnp.asarray([nw / iw, nh / ih])
        out = np.asarray(flow, np.float32)
        if transpose:
            # the reference only transposes the SPATIAL axes back
            # (extract_flow.py:128-129) without swapping the (x, y) flow
            # components — kept verbatim for parity (only portrait videos
            # hit this branch; the shipped datasets are all landscape)
            out = out.transpose(0, 2, 1, 3)
        if factor > 1:
            fh = np.stack([np.asarray(resize_ac(jnp.asarray(f), h, w))
                           for f in out])
            out = fh * np.asarray([w / out.shape[2], h / out.shape[1]])
        return out
