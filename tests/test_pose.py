"""Native OpenPose body model: torch parity, converter, PAF decode.

The reference's human path runs controlnet_aux's OpenposeDetector
(/root/reference/extract_semantic_point.py:38-54); preprocess/pose.py is
the native replacement. Parity here follows the repo pattern: the flax
graph is checked numerically against a literal torch restatement of the
pytorch-openpose body layout (same checkpoint key names), and the PAF
assembly is checked on synthetic two-person maps with known geometry.
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')
import jax  # noqa: E402

from videoswap_tpu.preprocess.pose import (  # noqa: E402
    LIMB_SEQ, N_KEYPOINTS, PAF_IDX, BodyResult, Keypoint,
    NativePoseDetector, OpenPoseBody, OpenPoseBodyConfig, PoseResult,
    assemble_people, convert_openpose_body, find_peaks)

TINY = OpenPoseBodyConfig(backbone_channels=(4, 6, 8, 12), cpm_channels=8,
                          stage1_mid=16, n_stages=2)


def _torch_body(cfg):
    """Literal torch restatement of the pytorch-openpose body graph the
    checkpoint was trained with (Sequential-of-named-modules: model0,
    model{t}_{1,2}) — the golden model for converter + graph parity."""
    import collections

    import torch.nn as torch_nn

    def block(specs, in_ch):
        layers = collections.OrderedDict()
        for name, ch, k, relu, pool in specs:
            if pool:
                layers[f'pool_{name}'] = torch_nn.MaxPool2d(2, 2)
            layers[name] = torch_nn.Conv2d(in_ch, ch, k, padding=k // 2)
            if relu:
                layers[f'relu_{name}'] = torch_nn.ReLU()
            in_ch = ch
        return torch_nn.Sequential(layers), in_ch

    from videoswap_tpu.preprocess.pose import (_backbone_specs,
                                               _stage1_specs, _stage_specs)

    class Body(torch_nn.Module):
        def __init__(self):
            super().__init__()
            self.model0, feat_ch = block(_backbone_specs(cfg), 3)
            self.model1_1, _ = block(_stage1_specs(cfg, 1), feat_ch)
            self.model1_2, _ = block(_stage1_specs(cfg, 2), feat_ch)
            stage_in = cfg.paf_channels + cfg.heat_channels + feat_ch
            for t in range(2, cfg.n_stages + 1):
                for b in (1, 2):
                    m, _ = block(_stage_specs(cfg, t, b), stage_in)
                    setattr(self, f'model{t}_{b}', m)

        def forward(self, x):
            import torch
            feat = self.model0(x)
            paf, heat = self.model1_1(feat), self.model1_2(feat)
            for t in range(2, cfg.n_stages + 1):
                inp = torch.cat([paf, heat, feat], dim=1)
                paf = getattr(self, f'model{t}_1')(inp)
                heat = getattr(self, f'model{t}_2')(inp)
            return paf, heat

    return Body()


@pytest.mark.parametrize('hw', [(32, 32), (24, 40)])
def test_torch_parity(hw):
    import torch
    torch.manual_seed(0)
    tm = _torch_body(TINY)
    # checkpoint-shaped state dict (ReLU/pool layers hold no params)
    sd = tm.state_dict()
    assert 'model0.conv1_1.weight' in sd
    assert f'model{TINY.n_stages}_2.Mconv7_stage{TINY.n_stages}_L2.bias' \
        in sd

    params = convert_openpose_body(sd)
    model = OpenPoseBody(cfg=TINY)
    h, w = hw
    x = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32) - 0.5
    paf_j, heat_j = jax.jit(model.apply)(params, jnp.asarray(x))

    with torch.no_grad():
        paf_t, heat_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(paf_j),
                               paf_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(heat_j),
                               heat_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)


def test_converter_prefixless_keys():
    """The public body_pose_model.pth ships prefix-less keys
    (`conv1_1.weight`, `Mconv7_stage6_L2.bias`) — pytorch-openpose strips
    the module scope via util.transfer at load. The converter must derive
    the scope from the layer name and produce the identical tree."""
    import torch
    torch.manual_seed(0)
    sd = _torch_body(TINY).state_dict()
    flat = {k.split('.', 1)[1]: v for k, v in sd.items()}
    assert 'conv1_1.weight' in flat and not any('.' not in k for k in flat)
    scoped = convert_openpose_body(sd)
    prefixless = convert_openpose_body(flat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        scoped, prefixless)
    # parity on the full-size layer-name set too (stage 6, conv5_* names)
    full = OpenPoseBodyConfig()
    from videoswap_tpu.preprocess.pose import _scope_for_layer
    assert _scope_for_layer('conv1_1') == 'model0'
    assert _scope_for_layer('conv4_4_CPM') == 'model0'
    assert _scope_for_layer('conv5_5_CPM_L1') == 'model1_1'
    assert _scope_for_layer('conv5_4_CPM_L2') == 'model1_2'
    assert _scope_for_layer(f'Mconv7_stage{full.n_stages}_L2') == \
        f'model{full.n_stages}_2'
    assert _scope_for_layer('Mconv1_stage2_L1') == 'model2_1'


def test_converter_matches_init_tree():
    import torch
    sd = _torch_body(TINY).state_dict()
    converted = convert_openpose_body(sd)
    model = OpenPoseBody(cfg=TINY)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(converted)}
    assert ref_paths == got_paths


def _put_gaussian(m, x, y, sigma=1.5):
    h, w = m.shape
    ys, xs = np.mgrid[0:h, 0:w]
    m += np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma ** 2))


def _draw_paf(paf, limb, a, b, width=2.0):
    px, py = PAF_IDX[limb]
    h, w = paf.shape[:2]
    vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
    norm = max(np.hypot(*vec), 1e-8)
    u = vec / norm
    ys, xs = np.mgrid[0:h, 0:w]
    dx, dy = xs - a[0], ys - a[1]
    along = dx * u[0] + dy * u[1]
    perp = np.abs(dx * -u[1] + dy * u[0])
    mask = (along >= -1) & (along <= norm + 1) & (perp <= width)
    paf[:, :, px][mask] = u[0]
    paf[:, :, py][mask] = u[1]


def _person_maps(heat, paf, kps):
    """kps: {keypoint_id: (x, y)}; draws peaks + the PAFs of every limb
    whose two endpoints are present."""
    for k, (x, y) in kps.items():
        _put_gaussian(heat[:, :, k], x, y)
    for limb, (ka, kb) in enumerate(LIMB_SEQ):
        if ka in kps and kb in kps:
            _draw_paf(paf, limb, kps[ka], kps[kb])


def test_two_person_assembly():
    h, w = 64, 64
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    # chains over limbs (1,2),(2,3),(3,4),(1,5): 5 parts each, distinct
    person_a = {1: (20, 10), 2: (12, 18), 3: (12, 30), 4: (12, 42),
                5: (28, 18)}
    person_b = {k: (x + 30, y + 14) for k, (x, y) in person_a.items()}
    _person_maps(heat, paf, person_a)
    _person_maps(heat, paf, person_b)

    peaks = find_peaks(heat)
    candidate, subsets = assemble_people(peaks, paf)
    assert len(subsets) == 2

    found = []
    for s in subsets:
        kps = {k: tuple(candidate[int(s[k]), :2].astype(int))
               for k in range(N_KEYPOINTS) if s[k] >= 0}
        found.append(kps)
    for person in (person_a, person_b):
        match = [kps for kps in found if kps.get(1) == person[1]]
        assert len(match) == 1, f'person at {person[1]} not assembled'
        for k, xy in person.items():
            assert match[0][k] == xy, f'keypoint {k}: {match[0].get(k)}'
        # undetected parts stay missing
        assert 9 not in match[0]


def test_missing_limb_splits_people():
    """Without a connecting PAF two peak groups must NOT merge."""
    h, w = 64, 64
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    kps = {1: (20, 10), 2: (12, 18), 3: (12, 30), 4: (12, 42), 5: (28, 18)}
    _person_maps(heat, paf, kps)
    # a second cluster of the same parts, no PAF drawn
    for k, (x, y) in kps.items():
        _put_gaussian(heat[:, :, k], x + 30, y + 14)
    peaks = find_peaks(heat)
    _, subsets = assemble_people(peaks, paf)
    assert len(subsets) == 1   # PAF-less cluster filtered (<4 parts)


def test_disjoint_subsets_merge():
    """A limb seen late can join two already-assembled clusters into one
    person (the paper's merge case; regression for the ambiguous
    list.remove on numpy rows caught driving the CLI)."""
    h, w = 64, 64
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    kps = {2: (12, 18), 3: (12, 30), 0: (30, 8), 14: (36, 6), 16: (44, 6)}
    for k, (x, y) in kps.items():
        _put_gaussian(heat[:, :, k], x, y)
    # cluster A via limb (2,3); cluster B via limbs (0,14),(14,16);
    # limb 17 = (2,16) joins them — processed after both clusters exist
    for limb, (ka, kb) in enumerate(LIMB_SEQ):
        if {ka, kb} in ({2, 3}, {0, 14}, {14, 16}, {2, 16}):
            _draw_paf(paf, limb, kps[ka], kps[kb])
    peaks = find_peaks(heat)
    candidate, subsets = assemble_people(peaks, paf)
    assert len(subsets) == 1          # merged (each cluster alone is <4)
    got = {k for k in range(N_KEYPOINTS) if subsets[0][k] >= 0}
    assert got == set(kps)


def test_detector_runs_tiny():
    model = OpenPoseBody(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    det = NativePoseDetector(params, cfg=TINY, scale_search=(0.5, 1.0))
    img = (np.random.RandomState(0).rand(48, 40, 3) * 255).astype(np.uint8)
    out = det.detect_poses(img)
    assert isinstance(out, list)   # random weights: people list, maybe empty
    paf, heatmap = det._maps(img)
    assert paf.shape == (48, 40, 38) and heatmap.shape == (48, 40, 19)


class _StubDetector:
    """controlnet_aux-shaped stub for the entry-point test."""

    def __init__(self, kps_by_frame):
        self.kps_by_frame = kps_by_frame
        self.i = 0

    def detect_poses(self, img):
        kps = self.kps_by_frame[self.i % len(self.kps_by_frame)]
        self.i += 1
        return [PoseResult(BodyResult(kps, 1.0))]


def test_propagate_human_keypoint(tmp_path):
    from PIL import Image

    from extract_semantic_point import propagate_human_keypoint

    w, h = 40, 32
    for i in range(3):
        Image.new('RGB', (w, h)).save(tmp_path / f'{i:04d}.png')
    kps = [None] * 18
    kps[0] = Keypoint(0.25, 0.5)           # nose
    kps[4] = Keypoint(0.75, 0.25)          # right wrist
    tap = propagate_human_keypoint(str(tmp_path),
                                   detector=_StubDetector([kps]))
    tracks = tap['pred_tracks']
    assert tracks.shape == (3, 18, 2)
    np.testing.assert_allclose(tracks[:, 0], [[0.25 * w, 0.5 * h]] * 3)
    np.testing.assert_allclose(tracks[:, 4], [[0.75 * w, 0.25 * h]] * 3)
    assert (tracks[:, 1] == -1).all()      # undetected -> -1 (reference :70)
    assert tap['point_name2id']['nose'] == 0
