"""Native human body-pose estimation (OpenPose COCO-18, two-branch CPM).

The reference's human preprocessing path runs controlnet_aux's
OpenposeDetector (`/root/reference/extract_semantic_point.py:38-54`) — a
CUDA pytorch-openpose "body" model — to produce per-frame 18-keypoint
tracks for TAP.pth. controlnet_aux is an external native dep (SURVEY.md
§2.11), not baked into this image, so this module is the TPU-native
replacement: the same two-branch multi-stage CPM graph as a channels-last
flax module (jitted; convs land on the MXU), a converter for the public
`body_pose_model.pth` checkpoint key set, and the Part-Affinity-Field
multi-person assembly (Cao et al., CVPR 2017) as host-side numpy — the
decode is tiny, irregular, per-person work that does not belong on the
accelerator.

Graph (matches the torch checkpoint layout so weights convert 1:1):
  model0      VGG-ish backbone: conv1_1..conv4_4_CPM (3x3, ReLU, 3 pools)
  model1_1/2  stage-1 branches: conv5_1..conv5_5 (PAF 38ch / heatmap 19ch)
  model{t}_{b} t=2..6: Mconv1..Mconv5 (7x7) + Mconv6/7 (1x1), input
              concat(paf, heat, backbone feat)

Detection protocol mirrors pytorch-openpose `Body.__call__` as shipped in
controlnet_aux: BGR input /256 - 0.5, scale search around boxsize 368,
pad-to-stride-8, bicubic map upsampling, gaussian-blurred peak extraction
(thre1=0.1), PAF line-integral limb scoring (thre2=0.05), greedy limb
assignment, subset assembly with the <4-parts / low-score person filter.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OpenPoseBodyConfig:
    """Channel plan. Defaults = the public COCO body_pose_model.pth."""
    backbone_channels: tuple = (64, 128, 256, 512)
    cpm_channels: int = 128          # conv4_4_CPM output / stage width
    stage1_mid: int = 512            # conv5_4_CPM 1x1 width
    n_stages: int = 6
    paf_channels: int = 38           # 19 limbs x (x, y)
    heat_channels: int = 19          # 18 keypoints + background


class _ConvStack(nn.Module):
    """Sequential named convs; spec = (name, out_ch, kernel, relu, pool)."""
    specs: tuple

    @nn.compact
    def __call__(self, x):
        for name, ch, k, relu, pool in self.specs:
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (k, k), padding='SAME', name=name)(x)
            if relu:
                x = nn.relu(x)
        return x


def _backbone_specs(cfg: OpenPoseBodyConfig) -> tuple:
    c1, c2, c3, c4 = cfg.backbone_channels
    return (
        ('conv1_1', c1, 3, True, False), ('conv1_2', c1, 3, True, False),
        ('conv2_1', c2, 3, True, True), ('conv2_2', c2, 3, True, False),
        ('conv3_1', c3, 3, True, True), ('conv3_2', c3, 3, True, False),
        ('conv3_3', c3, 3, True, False), ('conv3_4', c3, 3, True, False),
        ('conv4_1', c4, 3, True, True), ('conv4_2', c4, 3, True, False),
        ('conv4_3_CPM', c3, 3, True, False),
        ('conv4_4_CPM', cfg.cpm_channels, 3, True, False),
    )


def _stage1_specs(cfg: OpenPoseBodyConfig, branch: int) -> tuple:
    out = cfg.paf_channels if branch == 1 else cfg.heat_channels
    c = cfg.cpm_channels
    return (
        (f'conv5_1_CPM_L{branch}', c, 3, True, False),
        (f'conv5_2_CPM_L{branch}', c, 3, True, False),
        (f'conv5_3_CPM_L{branch}', c, 3, True, False),
        (f'conv5_4_CPM_L{branch}', cfg.stage1_mid, 1, True, False),
        (f'conv5_5_CPM_L{branch}', out, 1, False, False),
    )


def _stage_specs(cfg: OpenPoseBodyConfig, t: int, branch: int) -> tuple:
    out = cfg.paf_channels if branch == 1 else cfg.heat_channels
    c = cfg.cpm_channels
    return tuple(
        (f'Mconv{i}_stage{t}_L{branch}', c, 7, True, False)
        for i in range(1, 6)
    ) + (
        (f'Mconv6_stage{t}_L{branch}', c, 1, True, False),
        (f'Mconv7_stage{t}_L{branch}', out, 1, False, False),
    )


class OpenPoseBody(nn.Module):
    """Two-branch multi-stage CPM. Input (B, H, W, 3) BGR in [-0.5, 0.5]
    (the checkpoint's native colour order); H, W multiples of 8.
    Returns (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19))."""
    cfg: OpenPoseBodyConfig = OpenPoseBodyConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        feat = _ConvStack(_backbone_specs(cfg), name='model0')(x)
        paf = _ConvStack(_stage1_specs(cfg, 1), name='model1_1')(feat)
        heat = _ConvStack(_stage1_specs(cfg, 2), name='model1_2')(feat)
        for t in range(2, cfg.n_stages + 1):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = _ConvStack(_stage_specs(cfg, t, 1), name=f'model{t}_1')(inp)
            heat = _ConvStack(_stage_specs(cfg, t, 2),
                              name=f'model{t}_2')(inp)
        return paf, heat


def _scope_for_layer(conv: str) -> str:
    """Derive the module scope from a prefix-less layer name.

    The public `body_pose_model.pth` stores flat keys (`conv1_1.weight`,
    `Mconv7_stage6_L2.bias`) — pytorch-openpose/controlnet_aux strip the
    module scope via their `util.transfer` remap at load time. Layout:
    conv1_1..conv4_4_CPM -> model0; conv5_*_CPM_L{b} -> model1_{b};
    Mconv*_stage{t}_L{b} -> model{t}_{b}."""
    if conv.startswith('Mconv'):
        stage = conv.split('_stage')[1].split('_L')[0]
        branch = conv.rsplit('_L', 1)[1]
        return f'model{stage}_{branch}'
    if conv.startswith('conv5_'):
        return f"model1_{conv.rsplit('_L', 1)[1]}"
    return 'model0'


def convert_openpose_body(state_dict: dict) -> dict:
    """torch `body_pose_model.pth` state dict -> flax params.

    Accepts both layouts: scoped 3-part keys (`model0.conv1_1.weight`,
    `model3_2.Mconv4_stage3_L2.bias` — pytorch-openpose's Sequential-of-
    named-modules as constructed in code) and the prefix-less 2-part keys
    the public checkpoint actually ships (`conv1_1.weight`,
    `Mconv7_stage6_L2.bias`), whose scope is derived from the layer name.
    Conv weights are (O, I, KH, KW) -> flax (KH, KW, I, O)."""
    params: dict = {}
    for key, value in state_dict.items():
        v = np.asarray(value.numpy() if hasattr(value, 'numpy') else value)
        parts = key.split('.')
        if len(parts) == 3:
            scope, conv, kind = parts
        elif len(parts) == 2:
            conv, kind = parts
            scope = _scope_for_layer(conv)
        else:
            raise ValueError(f'unrecognized OpenPose checkpoint key: {key!r}')
        leaf = {'weight': 'kernel', 'bias': 'bias'}[kind]
        if kind == 'weight':
            v = v.transpose(2, 3, 1, 0)
        params.setdefault(scope, {}).setdefault(conv, {})[leaf] = jnp.asarray(
            v)
    return {'params': params}


# ---------------------------------------------------------------------------
# decode tables (Cao et al. CVPR'17, COCO layout) — parity-critical
# constants, same role as seq_aligner's NW scores
# ---------------------------------------------------------------------------

# limb endpoints as 0-indexed keypoint ids (paper's limbSeq minus 1)
LIMB_SEQ = np.array(
    [[1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7], [1, 8], [8, 9],
     [9, 10], [1, 11], [11, 12], [12, 13], [1, 0], [0, 14], [14, 16],
     [0, 15], [15, 17], [2, 16], [5, 17]])
# PAF (x, y) channel pair per limb (paper's mapIdx minus its 19-channel
# heatmap offset)
PAF_IDX = np.array(
    [[12, 13], [20, 21], [14, 15], [16, 17], [22, 23], [24, 25], [0, 1],
     [2, 3], [4, 5], [6, 7], [8, 9], [10, 11], [28, 29], [30, 31],
     [34, 35], [32, 33], [36, 37], [18, 19], [26, 27]])

N_KEYPOINTS = 18


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian blur (scipy-free) with edge replication."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img, ((radius, radius), (0, 0)), mode='edge')
    out = np.zeros_like(img)
    for i, kv in enumerate(k):
        out += kv * pad[i:i + img.shape[0]]
    pad = np.pad(out, ((0, 0), (radius, radius)), mode='edge')
    out = np.zeros_like(img)
    for i, kv in enumerate(k):
        out += kv * pad[:, i:i + img.shape[1]]
    return out


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1,
               sigma: float = 3.0) -> list:
    """Per-part peak lists [(x, y, score, global_id), ...] from an
    (H, W, 19) heatmap (the decode's first step)."""
    all_peaks = []
    peak_counter = 0
    for part in range(N_KEYPOINTS):
        m = heatmap[:, :, part]
        sm = _gaussian_blur(m.astype(np.float64), sigma)
        up = np.zeros_like(sm); up[1:] = sm[:-1]
        down = np.zeros_like(sm); down[:-1] = sm[1:]
        left = np.zeros_like(sm); left[:, 1:] = sm[:, :-1]
        right = np.zeros_like(sm); right[:, :-1] = sm[:, 1:]
        is_peak = ((sm >= up) & (sm >= down) & (sm >= left) & (sm >= right)
                   & (sm > thre1))
        ys, xs = np.nonzero(is_peak)
        peaks = [(int(x), int(y), float(m[y, x]), peak_counter + i)
                 for i, (x, y) in enumerate(zip(xs, ys))]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _limb_connections(paf: np.ndarray, cand_a: list, cand_b: list,
                      limb: int, img_h: int, thre2: float,
                      n_samples: int = 10) -> list:
    """Score every (a, b) candidate pair for one limb by the PAF line
    integral; greedily keep the best non-conflicting pairs."""
    px, py = PAF_IDX[limb]
    scored = []
    for ai, a in enumerate(cand_a):
        for bi, b in enumerate(cand_b):
            vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
            norm = max(np.hypot(*vec), 1e-8)
            u = vec / norm
            xs = np.linspace(a[0], b[0], n_samples)
            ys = np.linspace(a[1], b[1], n_samples)
            ix = np.clip(np.round(xs).astype(int), 0, paf.shape[1] - 1)
            iy = np.clip(np.round(ys).astype(int), 0, paf.shape[0] - 1)
            samples = paf[iy, ix, px] * u[0] + paf[iy, ix, py] * u[1]
            score = samples.mean() + min(0.5 * img_h / norm - 1, 0)
            if (samples > thre2).sum() > 0.8 * n_samples and score > 0:
                scored.append((ai, bi, score,
                               score + a[2] + b[2]))
    scored.sort(key=lambda s: s[2], reverse=True)
    used_a, used_b, conns = set(), set(), []
    for ai, bi, score, total in scored:
        if ai not in used_a and bi not in used_b:
            used_a.add(ai); used_b.add(bi)
            conns.append((cand_a[ai][3], cand_b[bi][3], score))
    return conns


def assemble_people(all_peaks: list, paf: np.ndarray,
                    thre2: float = 0.05) -> tuple:
    """PAF limb matching + person assembly.

    Returns (candidate (N, 4) array of all peaks, subsets: list of
    per-person arrays of 20 floats — 18 peak ids (-1 = missing), total
    score, part count) following the paper's greedy merge with the
    <4-parts or score/parts < 0.4 person filter."""
    candidate = np.array([p for part in all_peaks for p in part],
                         np.float64).reshape(-1, 4)
    img_h = paf.shape[0]
    subsets: list = []

    for limb in range(len(LIMB_SEQ)):
        ka, kb = LIMB_SEQ[limb]
        conns = _limb_connections(paf, all_peaks[ka], all_peaks[kb], limb,
                                  img_h, thre2)
        for ida, idb, score in conns:
            found = [s for s in subsets
                     if s[ka] == ida or s[kb] == idb]
            if len(found) == 1:
                s = found[0]
                if s[kb] != idb:
                    s[kb] = idb
                    s[19] += 1
                    s[18] += candidate[int(idb), 2] + score
                elif s[ka] < 0:
                    # the match was on kb; attach ka only if that slot is
                    # still unset — the reference decode never overwrites
                    # an assigned part here (doing so double-counted
                    # counts/scores on conflicting shoulder-ear evidence)
                    s[ka] = ida
                    s[19] += 1
                    s[18] += candidate[int(ida), 2] + score
            elif len(found) == 2:
                s1, s2 = found
                # disjoint people joined by this limb -> merge
                if not np.any((s1[:18] >= 0) & (s2[:18] >= 0)):
                    s1[:18] = np.where(s2[:18] >= 0, s2[:18], s1[:18])
                    s1[18] += s2[18] + score
                    s1[19] += s2[19]
                    # identity removal: list.remove compares with == which
                    # is ambiguous for arrays (caught driving the CLI)
                    subsets[:] = [s for s in subsets if s is not s2]
                else:
                    s1[kb] = idb
                    s1[19] += 1
                    s1[18] += candidate[int(idb), 2] + score
            else:
                s = np.full(20, -1.0)
                s[ka], s[kb] = ida, idb
                s[19] = 2
                s[18] = (candidate[int(ida), 2] + candidate[int(idb), 2]
                         + score)
                subsets.append(s)

    subsets = [s for s in subsets
               if s[19] >= 4 and s[18] / s[19] >= 0.4]
    return candidate, subsets


# ---------------------------------------------------------------------------
# detector (controlnet_aux-shaped surface)
# ---------------------------------------------------------------------------


@dataclass
class Keypoint:
    x: float
    y: float


@dataclass
class BodyResult:
    keypoints: list          # 18 entries, Keypoint (normalized) or None
    total_score: float


@dataclass
class PoseResult:
    body: BodyResult


@partial(jax.jit, static_argnums=(0,))
def _forward(model, params, x):
    paf, heat = model.apply(params, x)
    # upsample by the /8 stride on device (bicubic, like the torch path's
    # cv2 INTER_CUBIC) so only final-size maps come back over the wire
    b, h, w, _ = x.shape
    paf = jax.image.resize(paf, (b, h, w, paf.shape[-1]), 'cubic')
    heat = jax.image.resize(heat, (b, h, w, heat.shape[-1]), 'cubic')
    return paf, heat


class NativePoseDetector:
    """Drop-in for the controlnet_aux OpenposeDetector surface used by
    `extract_semantic_point.propagate_human_keypoint` (body only)."""

    STRIDE = 8

    def __init__(self, params, cfg: OpenPoseBodyConfig | None = None,
                 boxsize: int = 368, scale_search=(0.5,),
                 thre1: float = 0.1, thre2: float = 0.05):
        self.model = OpenPoseBody(cfg=cfg or OpenPoseBodyConfig())
        self.params = params
        self.boxsize = boxsize
        self.scale_search = tuple(scale_search)
        self.thre1 = thre1
        self.thre2 = thre2

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> 'NativePoseDetector':
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=True)
        return cls(convert_openpose_body(sd), **kw)

    def _maps(self, img_rgb: np.ndarray) -> tuple:
        """Scale-search forward pass; returns (paf, heatmap) at image
        resolution, averaged over scales."""
        h, w = img_rgb.shape[:2]
        bgr = img_rgb[:, :, ::-1].astype(np.float32)
        heat_acc = np.zeros((h, w, self.model.cfg.heat_channels), np.float32)
        paf_acc = np.zeros((h, w, self.model.cfg.paf_channels), np.float32)
        for scale in self.scale_search:
            s = scale * self.boxsize / h
            sh = max(int(round(h * s)), self.STRIDE)
            sw = max(int(round(w * s)), self.STRIDE)
            x = jax.image.resize(jnp.asarray(bgr), (sh, sw, 3), 'cubic')
            ph = (-sh) % self.STRIDE
            pw = (-sw) % self.STRIDE
            # pad value 128 in uint8 space == 0 after /256 - 0.5
            x = jnp.pad(x / 256.0 - 0.5, ((0, ph), (0, pw), (0, 0)))
            paf, heat = _forward(self.model, self.params, x[None])
            paf = paf[0, :sh, :sw]
            heat = heat[0, :sh, :sw]
            paf = jax.image.resize(paf, (h, w, paf.shape[-1]), 'cubic')
            heat = jax.image.resize(heat, (h, w, heat.shape[-1]), 'cubic')
            paf_acc += np.asarray(paf)
            heat_acc += np.asarray(heat)
        n = len(self.scale_search)
        return paf_acc / n, heat_acc / n

    def detect_poses(self, img_rgb: np.ndarray) -> list:
        """(H, W, 3) uint8/float RGB -> [PoseResult] (people, x/y
        normalized to [0, 1], None for undetected keypoints)."""
        h, w = img_rgb.shape[:2]
        paf, heat = self._maps(np.asarray(img_rgb))
        peaks = find_peaks(heat, self.thre1)
        candidate, subsets = assemble_people(peaks, paf, self.thre2)
        results = []
        for s in subsets:
            kps = []
            for k in range(N_KEYPOINTS):
                idx = int(s[k])
                if idx < 0:
                    kps.append(None)
                else:
                    x, y = candidate[idx, 0], candidate[idx, 1]
                    kps.append(Keypoint(x / w, y / h))
            results.append(PoseResult(BodyResult(kps, float(s[18]))))
        return results
