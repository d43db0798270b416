"""Native CoTracker v1 (stride 4, window 8) point tracker in flax.

The reference tracks non-human subjects with `CoTrackerPredictor`
(`/root/reference/extract_semantic_point.py:86-108`, checkpoint
`cotracker_stride_4_wind_8.pth`, queries [t, x, y], backward_tracking).
That model lives in a git-ignored thirdparty checkout; this module is the
inference graph rebuilt TPU-first with a converter for the public
checkpoint key set — the `preprocess/pose.py` / `preprocess/unimatch.py`
pattern.

Architecture reconstructed from the published model (Karaev et al.,
"CoTracker: It is Better to Track Together", arXiv 2307.07635; code
structure of facebookresearch/co-tracker v1):

  fnet           BasicEncoder stride 4: 7x7/2 conv + InstanceNorm, four
                 residual layers (64,96,128,128 at strides 1,2,2,2), all
                 four resampled to 1/4 (align-corners bilinear), concat
                 -> 3x3 conv(256) + IN + 1x1 conv(128)
  corr           4-level avg-pool pyramid; per-track (2*3+1)^2 bilinear
                 samples per level around the current coords -> 196 dims
  updateformer   Linear(456->384); 6 time-attention blocks over the
                 window axis interleaved 1:1 with 6 space-attention
                 blocks over the track axis (pre-LN without affine, timm
                 attention qkv+proj, tanh-GELU MLP x4); Linear(384->130)
  heads          GroupNorm(1)+Linear+GELU feature updater; Linear(128->1)
                 visibility logits
  input (456)    130 flow sincos embedding (64/axis, linear pips
                 frequencies, coords catted) + 196 correlation + 128
                 track feature + [track_mask, vis] (2)
  pos embeds     456-dim MAE-style 2D sincos grid embedding sampled at
                 the tracks' window-start coords + 456-dim 1D time
                 embedding

Sliding-window inference (window 8, stride 4, 6 iterations/window,
video resized to 384x512) follows the v1 predictor protocol, including
backward tracking on the time-reversed video for frames before the query
(the reference always passes backward_tracking=True). The core iteration
graph is parity-tested against a literal torch restatement
(tests/test_cotracker_native.py); the converter is strict over the full
key set, so a checkpoint-layout mismatch fails loudly rather than
silently drifting; real-weight numerics auto-run when the checkpoint is
on disk (tests/test_real_weights.py).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .unimatch import grid_sample, instance_norm, resize_ac

WINDOW = 8
STRIDE = 4
LATENT_DIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 3
INPUT_DIM = 456
HIDDEN_SIZE = 384
NUM_HEADS = 8
DEPTH = 6
INTERP_SHAPE = (384, 512)
ITERS = 6


# ---------------------------------------------------------------------------
# feature encoder
# ---------------------------------------------------------------------------


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
            x = instance_norm(nn.Conv(self.planes, (1, 1),
                                      strides=self.stride,
                                      name='downsample_0')(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """(B, H, W, 3) in [-1, 1] -> (B, H/4, W/4, 128)."""
    output_dim: int = LATENT_DIM

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    name='conv1')(x)
        x = nn.relu(instance_norm(x))
        a = ResidualBlock(64, name='layer1_0')(x)
        a = ResidualBlock(64, name='layer1_1')(a)
        b = ResidualBlock(96, 2, True, name='layer2_0')(a)
        b = ResidualBlock(96, name='layer2_1')(b)
        c = ResidualBlock(128, 2, True, name='layer3_0')(b)
        c = ResidualBlock(128, name='layer3_1')(c)
        d = ResidualBlock(128, 2, True, name='layer4_0')(c)
        d = ResidualBlock(128, name='layer4_1')(d)
        ho, wo = h // STRIDE, w // STRIDE
        cat = jnp.concatenate(
            [resize_ac(t, ho, wo) for t in (a, b, c, d)], axis=-1)
        x = nn.Conv(self.output_dim * 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name='conv2')(cat)
        x = nn.relu(instance_norm(x))
        return nn.Conv(self.output_dim, (1, 1), name='conv3')(x)


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------


class AttnBlock(nn.Module):
    hidden: int = HIDDEN_SIZE
    heads: int = NUM_HEADS

    @nn.compact
    def __call__(self, x):
        # pre-LN without affine (torch elementwise_affine=False)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        b, n, c = h.shape
        dh = c // self.heads
        qkv = nn.Dense(3 * c, name='attn_qkv')(h)
        qkv = qkv.reshape(b, n, 3, self.heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * dh ** -0.5
        out = jnp.einsum('bhqk,bhkd->bhqd',
                         jax.nn.softmax(logits, -1), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, name='attn_proj')(out)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        h = nn.Dense(4 * c, name='mlp_fc1')(h)
        h = jax.nn.gelu(h, approximate=True)          # torch GELU(tanh)
        return x + nn.Dense(c, name='mlp_fc2')(h)


class UpdateFormer(nn.Module):
    depth: int = DEPTH

    @nn.compact
    def __call__(self, x):
        # x: (B, N, T, input_dim)
        b, n, t, _ = x.shape
        x = nn.Dense(HIDDEN_SIZE, name='input_transform')(x)
        for i in range(self.depth):
            xt = x.reshape(b * n, t, HIDDEN_SIZE)
            xt = AttnBlock(name=f'time_blocks_{i}')(xt)
            x = xt.reshape(b, n, t, HIDDEN_SIZE)
            xs = x.transpose(0, 2, 1, 3).reshape(b * t, n, HIDDEN_SIZE)
            xs = AttnBlock(name=f'space_blocks_{i}')(xs)
            x = xs.reshape(b, t, n, HIDDEN_SIZE).transpose(0, 2, 1, 3)
        return nn.Dense(LATENT_DIM + 2, name='flow_head')(x)


# ---------------------------------------------------------------------------
# embeddings (pips / MAE conventions)
# ---------------------------------------------------------------------------


def get_2d_embedding(xy, C: int = 64):
    """pips get_2d_embedding(cat_coords=True): linear frequencies
    arange(0, C, 2) * (1000/C); [.., 2] -> [.., 2 + 2C] (xy catted
    FIRST)."""
    x, y = xy[..., 0:1], xy[..., 1:2]
    div = (np.arange(0, C, 2, dtype=np.float32) * (1000.0 / C))
    div = jnp.asarray(div)
    pe_x = jnp.stack([jnp.sin(x * div), jnp.cos(x * div)], -1).reshape(
        *xy.shape[:-1], C)
    pe_y = jnp.stack([jnp.sin(y * div), jnp.cos(y * div)], -1).reshape(
        *xy.shape[:-1], C)
    return jnp.concatenate([xy, pe_x, pe_y], axis=-1)


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = np.einsum('m,d->md', pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)],
                          axis=1).astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, gh: int, gw: int) -> np.ndarray:
    """MAE grid embedding -> (gh, gw, embed_dim); the first half embeds
    the W mesh (MAE's meshgrid(w, h) order), kept verbatim for weight
    parity."""
    grid_w, grid_h = np.meshgrid(np.arange(gw, dtype=np.float32),
                                 np.arange(gh, dtype=np.float32))
    emb_a = _sincos_1d(embed_dim // 2, grid_w)
    emb_b = _sincos_1d(embed_dim // 2, grid_h)
    return np.concatenate([emb_a, emb_b], axis=1).reshape(gh, gw, embed_dim)


# ---------------------------------------------------------------------------
# core model
# ---------------------------------------------------------------------------


def _corr_pyramid(fmaps):
    """fmaps (S, H, W, C) -> list of avg-pooled levels."""
    pyr = [fmaps]
    x = fmaps
    for _ in range(CORR_LEVELS - 1):
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        pyr.append(x)
    return pyr


def _corr_sample(pyramid, ffeats, coords):
    """Correlation features: ffeats (S, N, C) dotted with each pyramid
    level, sampled on a (2r+1)^2 window around coords/2^i.
    coords (S, N, 2) in stride units. -> (S, N, L*(2r+1)^2)."""
    r = CORR_RADIUS
    k = 2 * r + 1
    # tap order kept identical to the torch restatement (RAFT's
    # stack(meshgrid(dy, dx)): first axis added to x)
    da, db = np.meshgrid(np.linspace(-r, r, k), np.linspace(-r, r, k),
                         indexing='ij')
    offs = jnp.asarray(np.stack([da.reshape(-1), db.reshape(-1)], -1),
                       jnp.float32)                    # (k^2, 2)
    out = []
    for i, fm in enumerate(pyramid):
        c = fm.shape[-1]
        corr = jnp.einsum('snc,shwc->snhw', ffeats, fm) / math.sqrt(c)
        s, n, hh, ww = corr.shape
        corr = corr.reshape(s * n, hh, ww, 1)
        ctr = coords.reshape(s * n, 1, 2) / (2 ** i)
        sample = ctr + offs[None]                      # (S*N, k^2, 2)
        vals = grid_sample(corr, sample[..., 0], sample[..., 1])
        out.append(vals.reshape(s, n, k * k))
    return jnp.concatenate(out, axis=-1)


class CoTrackerCore(nn.Module):
    """One window's iterative refinement (forward_iteration).

    fmaps (S, H/4, W/4, C); coords_init (S, N, 2) in PIXELS; feat_init
    (N, C); vis_init / track_mask (S, N). Returns (coords (S, N, 2)
    pixels, vis logits (S, N), ffeats (S, N, C))."""
    iters: int = ITERS

    def setup(self):
        self.fnet = BasicEncoder(name='fnet')
        self.updateformer = UpdateFormer(name='updateformer')
        # torch GroupNorm default eps 1e-5 (flax defaults to 1e-6)
        self.norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, name='gn')
        self.ffeat_updater_0 = nn.Dense(LATENT_DIM, name='ffeat_updater_0')
        self.vis_predictor_0 = nn.Dense(1, name='vis_predictor_0')

    def encode(self, frames):
        return self.fnet(frames)

    def init_all(self, frames, coords_init, feat_init, vis_init,
                 track_mask):
        """Init helper touching BOTH the encoder and the iteration graph
        (plain init would miss fnet — __call__ takes encoded fmaps)."""
        fmaps = self.fnet(frames)
        return self(fmaps, coords_init, feat_init, vis_init, track_mask)

    def __call__(self, fmaps, coords_init, feat_init, vis_init, track_mask):
        s, hh, ww, c = fmaps.shape
        n = coords_init.shape[1]
        coords = coords_init / STRIDE
        ffeats = jnp.broadcast_to(feat_init[None], (s, n, LATENT_DIM))
        pyramid = _corr_pyramid(fmaps)

        pos_grid = jnp.asarray(get_2d_sincos_pos_embed(INPUT_DIM, hh, ww))
        pos_embed = grid_sample(pos_grid[None], coords[None, 0, :, 0],
                                coords[None, 0, :, 1])[0]   # (N, 456)
        times_embed = jnp.asarray(_sincos_1d(
            INPUT_DIM, np.arange(s, dtype=np.float32)))     # (S, 456)

        extra = jnp.stack([track_mask.astype(jnp.float32),
                           vis_init.astype(jnp.float32)], -1)  # (S, N, 2)

        for _ in range(self.iters):
            fcorrs = _corr_sample(pyramid, ffeats, coords)  # (S, N, 196)
            flows = coords - coords[0:1]
            flows_cat = get_2d_embedding(flows)             # (S, N, 130)
            tr_in = jnp.concatenate([flows_cat, fcorrs, ffeats, extra], -1)
            x = tr_in + pos_embed[None] + times_embed[:, None]
            delta = self.updateformer(
                x.transpose(1, 0, 2)[None])                 # (1, N, S, 130)
            delta = delta[0].transpose(1, 0, 2)             # (S, N, 130)
            coords = coords + delta[..., :2]
            dfeat = self.norm(delta[..., 2:].reshape(-1, LATENT_DIM))
            # ffeat_updater = Sequential(Linear, nn.GELU()) — EXACT gelu
            # (the tanh approximation is only inside the AttnBlock MLPs)
            dfeat = jax.nn.gelu(self.ffeat_updater_0(dfeat),
                                approximate=False)
            ffeats = ffeats + dfeat.reshape(s, n, LATENT_DIM)
        vis = self.vis_predictor_0(ffeats.reshape(-1, LATENT_DIM))
        return coords * STRIDE, vis.reshape(s, n), ffeats


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------

def cotracker_key_map(key: str) -> str:
    key = key.replace('gn.', 'norm.')
    key = key.replace('attn_qkv', 'attn.qkv')
    key = key.replace('attn_proj', 'attn.proj')
    key = key.replace('mlp_fc1', 'mlp.fc1')
    key = key.replace('mlp_fc2', 'mlp.fc2')
    return key


def convert_cotracker(torch_sd: dict, flax_params: dict) -> dict:
    """cotracker_stride_4_wind_8.pth (possibly under 'model', with
    'module.' prefixes) -> flax params; strict over the full key set."""
    from videoswap_tpu.models import converters
    if 'model' in torch_sd and isinstance(torch_sd['model'], dict):
        torch_sd = torch_sd['model']
    torch_sd = {k[len('module.'):] if k.startswith('module.') else k: v
                for k, v in torch_sd.items()}
    params, _, _ = converters.convert_state_dict(
        torch_sd, flax_params, key_map=cotracker_key_map, strict=True)
    return params


def _template_shapes(model: CoTrackerCore):
    return jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((WINDOW, 32, 32, 3)), jnp.zeros((WINDOW, 3, 2)),
            jnp.zeros((3, LATENT_DIM)), jnp.zeros((WINDOW, 3)),
            jnp.zeros((WINDOW, 3)), method=CoTrackerCore.init_all),
        jax.random.PRNGKey(0))


def expected_checkpoint_keys() -> list:
    model = CoTrackerCore()
    shapes = _template_shapes(model)
    from flax import traverse_util

    from videoswap_tpu.models import converters
    keys = []
    for path in traverse_util.flatten_dict(shapes['params']):
        spath = tuple(str(p) for p in path)
        keys.append(cotracker_key_map(
            converters.flax_path_to_torch_key(spath)))
    return sorted(keys)


# ---------------------------------------------------------------------------
# predictor (sliding window + backward tracking)
# ---------------------------------------------------------------------------


class NativeCoTrackerPredictor:
    """CoTrackerPredictor-shaped surface for the reference call
    (extract_semantic_point.py:104-108): `predictor(video, queries,
    backward_tracking=True)` -> (tracks (1, T, N, 2), vis (1, T, N)).

    video (1, T, 3, H, W) float 0..255 (torch layout accepted) or
    (T, H, W, 3); queries (1, N, 3) [t, x, y]. The v1 protocol: resize to
    384x512, window 8 / stride 4 sliding, 6 iterations, window handoff by
    carrying the second half, backward tracking fills frames before the
    query from the time-reversed run."""

    def __init__(self, params):
        self.model = CoTrackerCore()
        self.params = params
        self._enc = jax.jit(lambda p, f: self.model.apply(
            p, f, method=CoTrackerCore.encode))
        self._iter = jax.jit(lambda p, *a: self.model.apply(p, *a))

    @classmethod
    def from_checkpoint(cls, path: str) -> 'NativeCoTrackerPredictor':
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=False)
        shapes = _template_shapes(CoTrackerCore())
        template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                shapes)
        return cls({'params': convert_cotracker(sd, template['params'])})

    def __call__(self, video, queries, backward_tracking: bool = True):
        video = np.asarray(video, np.float32)
        if video.ndim == 5:                      # (1, T, 3, H, W) torch
            video = video[0].transpose(0, 2, 3, 1)
        t, h, w = video.shape[:3]
        queries = np.asarray(queries, np.float32).reshape(-1, 3)
        ih, iw = INTERP_SHAPE
        frames = np.stack([np.asarray(resize_ac(jnp.asarray(f), ih, iw))
                           for f in video])
        q = queries.copy()
        q[:, 1] *= iw / w
        q[:, 2] *= ih / h

        tracks, vis = self._track(frames, q)
        if backward_tracking:
            inv_q = q.copy()
            inv_q[:, 0] = t - 1 - inv_q[:, 0]
            bt, bv = self._track(frames[::-1], inv_q)
            bt, bv = bt[::-1], bv[::-1]
            missing = (tracks == 0).all(-1)          # frames before query
            tracks = np.where(missing[..., None], bt, tracks)
            vis = np.where(missing, bv, vis)

        tracks[..., 0] *= w / iw
        tracks[..., 1] *= h / ih
        return tracks[None], vis[None]

    def _track(self, frames: np.ndarray, queries: np.ndarray):
        t = frames.shape[0]
        n = queries.shape[0]
        first = queries[:, 0].astype(int)
        tracks = np.zeros((t, n, 2), np.float32)
        vis = np.zeros((t, n), np.float32)
        track_mask_full = (np.arange(t)[:, None] >= first[None])

        norm = lambda f: 2 * (f / 255.0) - 1.0        # noqa: E731
        coords_init = None
        vis_init = np.full((WINDOW, n), 10.0, np.float32)
        feat_init = None
        active = None
        ind = 0
        while ind == 0 or ind < t - WINDOW // 2:
            seq = frames[ind:ind + WINDOW]
            s_local = seq.shape[0]
            if s_local < WINDOW:
                seq = np.concatenate(
                    [seq, np.repeat(seq[-1:], WINDOW - s_local, 0)], 0)
            fmaps = self._enc(self.params, jnp.asarray(norm(seq)))

            in_window = first < ind + WINDOW
            if not in_window.any():
                ind += WINDOW // 2
                continue
            if active is None or in_window.sum() > active.sum():
                # (re)initialize entering points: query coords + feature
                # sampled at the query frame/location
                new = in_window & (~active if active is not None
                                   else np.ones(n, bool))
                if coords_init is None:
                    coords_init = np.tile(queries[None, :, 1:],
                                          (WINDOW, 1, 1)).astype(np.float32)
                fidx = np.clip(first - ind, 0, WINDOW - 1)
                feats = np.asarray(grid_sample(
                    fmaps[fidx[new]],
                    jnp.asarray(queries[new, 1] / STRIDE)[:, None],
                    jnp.asarray(queries[new, 2] / STRIDE)[:, None]))[:, 0]
                if feat_init is None:
                    feat_init = np.zeros((n, LATENT_DIM), np.float32)
                feat_init[new] = feats
                # entering points start at their query coordinate across
                # the whole window (earlier carries tracked placeholders)
                coords_init[:, new] = queries[new, 1:][None]
                active = in_window.copy()

            tm = np.zeros((WINDOW, n), np.float32)
            tm[:s_local] = track_mask_full[ind:ind + s_local]
            tm[s_local:] = tm[s_local - 1:s_local]
            coords, v, _ = self._iter(
                self.params, fmaps, jnp.asarray(coords_init),
                jnp.asarray(feat_init), jnp.asarray(vis_init),
                jnp.asarray(tm))
            coords = np.asarray(coords)
            v = np.asarray(v)
            sl = slice(ind, ind + s_local)
            write = track_mask_full[sl]
            tracks[sl] = np.where(write[..., None], coords[:s_local],
                                  tracks[sl])
            vis[sl] = np.where(write, v[:s_local], vis[sl])

            half = WINDOW // 2
            coords_init = np.concatenate(
                [coords[half:], np.repeat(coords[-1:], half, 0)], 0)
            vis_init = np.concatenate(
                [(v[half:] > 0).astype(np.float32) * 10,
                 np.repeat((v[-1:] > 0).astype(np.float32) * 10, half, 0)],
                0)
            ind += half
        return tracks, 1 / (1 + np.exp(-vis))


_COTRACKER_CKPT_ENV = 'VS_COTRACKER_CKPT'


def find_cotracker_checkpoint() -> Optional[str]:
    import glob
    import os
    cands = [os.environ.get(_COTRACKER_CKPT_ENV, ''),
             'pretrained_models/cotracker_stride_4_wind_8.pth',
             'thirdparty/co-tracker/checkpoints/'
             'cotracker_stride_4_wind_8.pth']
    cands += sorted(glob.glob('pretrained_models/cotracker*.pth'))
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None
