"""Golden-value parity tests for the p2p edit/blend math.

Each test feeds IDENTICAL random attention maps to (a) a literal torch/numpy
restatement of the reference controller math and (b) our jit-side functions,
and asserts equality — the same standard tests/test_adapter.py applies to the
bilinear splat.

Reference restated here:
- AttentionRefine/AttentionReplace.replace_cross_attention + the
  AttentionControlEdit.forward combination with cross_replace_alpha
  (/root/reference/videoswap/utils/p2p_utils/attention_util.py:82-138,
  195-230, 235-284)
- replace_self_attention full/masked (:64-76)
- SpatialBlender.get_mask + __call__ + the step_callback latent blend
  (/root/reference/videoswap/utils/p2p_utils/spatial_blend.py:25-63, 65-145;
  attention_util.py:28-62)
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from videoswap_tpu.p2p import sites
from videoswap_tpu.p2p.edit import (EditConfig, latent_blend_step,
                                    make_edit_fn)

H8 = W8 = 32          # 256x256 image -> blend sites at 8x8
FRAMES = 2
HEADS = 2
S = 64                # 8x8 tokens
W77 = 77


def _mk_cfg(**over):
    b_sites = sites.blend_sites(H8, W8)
    cross_s = [s for s in sites.all_sites('cross')
               if sites.site_tokens(s, H8, W8) < sites.CTRL_MAX_TOKENS]
    self_s = [s for s in sites.all_sites('self')
              if sites.site_tokens(s, H8, W8) < sites.CTRL_MAX_TOKENS]
    kw = dict(
        num_steps=10, video_length=FRAMES, h8=H8, w8=W8, height=256,
        width=256, do_cfg=True, refine=True, cross_active=True,
        self_range=(0, 5), blend_latents=True, blend_self=False, th=0.3,
        start_blend=2, end_blend=8,
        blend_site_names=tuple(s.name for s in b_sites),
        cross_site_names=tuple(s.name for s in cross_s),
        self_site_names=tuple(s.name for s in self_s),
        self_site_hw=tuple((s.name, sites.site_hw(s, H8, W8))
                           for s in self_s),
    )
    kw.update(over)
    return EditConfig(**kw)


def _site(cfg, kind):
    names = (cfg.cross_site_names if kind == 'cross'
             else cfg.self_site_names)
    for s in sites.all_sites(kind):
        if s.name == names[0]:
            return s
    raise AssertionError


# --------------------------------------------------------------------------
# reference restatements (torch, literal)
# --------------------------------------------------------------------------

def ref_refine_cross(attn_base, att_replace, mapper, alphas, alpha_words):
    """AttentionRefine.replace_cross_attention (attention_util.py:236-246)
    + the forward combination (:110-113). attn_base (F,h,s,77);
    att_replace (1,F,h,s,77); mapper (1,77) long; alphas (1,77);
    alpha_words (1,1,1,1,77)."""
    attn_base_replace = attn_base[:, :, :, mapper].permute(3, 0, 1, 2, 4)
    alphas_r = alphas.reshape(alphas.shape[0], 1, 1, alphas.shape[1])
    attn_replace = attn_base_replace * alphas_r + att_replace * (1 - alphas_r)
    return attn_replace * alpha_words + (1 - alpha_words) * att_replace


def ref_replace_cross(attn_base, att_replace, mapper_mat, alpha_words):
    """AttentionReplace.replace_cross_attention (attention_util.py:196-206)
    + forward combination. mapper_mat (1,77,77)."""
    rep = torch.einsum('thpw,bwn->bthpn', attn_base, mapper_mat)
    return rep * alpha_words + (1 - alpha_words) * att_replace


def ref_self_replace(attn_base, att_replace, reshaped_mask):
    """replace_self_attention (attention_util.py:64-76). attn_base (F,h,s,s);
    att_replace (1,F,h,s,s); reshaped_mask (F,1,s,1) or None."""
    attn_base = attn_base.unsqueeze(0).expand(att_replace.shape[0],
                                              *attn_base.shape)
    if reshaped_mask is not None:
        return reshaped_mask * att_replace + (1 - reshaped_mask) * attn_base
    return attn_base


def ref_get_mask(maps, alpha, use_pool, h, w, th):
    """SpatialBlender.get_mask (spatial_blend.py:25-63) minus IO.
    maps (P, heads_cat, F, rh, rw, 77); alpha (P,1,1,1,1,77)."""
    k = 1
    maps = (maps * alpha).sum(-1).mean(1)
    if use_pool:
        maps = F.max_pool2d(maps, (k * 2 + 1, k * 2 + 1), (1, 1),
                            padding=(k, k))
    mask = F.interpolate(maps, size=(h, w))
    mask = mask / mask.max(-2, keepdims=True)[0].max(-1, keepdims=True)[0]
    return mask.gt(th)


def ref_blender_call(maps_list, alpha_layers, th, target_h, target_w,
                     prompt_choose):
    """SpatialBlender.__call__ mask path (spatial_blend.py:90-135).
    maps_list: down_cross[2:4]+up_cross[:3], each (P, F, heads, S, 77)."""
    rearranged = []
    for item in maps_list:
        p, c, heads, r, w77 = item.shape
        ratio = target_h / target_w
        res_h = int((r * ratio) ** 0.5)
        res_w = int(r / res_h)
        item = item.reshape(p, c, heads, res_h, res_w, w77)
        rearranged.append(item.permute(0, 2, 1, 3, 4, 5))  # p h c rh rw w
    maps = torch.cat(rearranged, dim=1)
    # reference stores alpha_layers as (P,1,1,1,1,77) (spatial_blend.py:176)
    alpha_layers = alpha_layers.reshape(alpha_layers.shape[0], 1, 1, 1, 1,
                                        alpha_layers.shape[-1])
    if prompt_choose == 'source':
        masked_alpha = alpha_layers[0:1]
    else:
        masked_alpha = alpha_layers
    mask = ref_get_mask(maps, masked_alpha, True, target_h, target_w, th)
    if prompt_choose == 'both':
        assert mask.shape[0] == 2
        mask = mask[:1] + mask
    return mask.float()


def ref_latent_blend(x_inv, x_cur, mask, counter, start_blend, end_blend):
    """AttentionControlEdit.step_callback latent blend
    (attention_util.py:28-62) + the window gate (spatial_blend.py:137-143).
    x_* (1,C,F,h,w); mask (P,F,h,w)."""
    x_t = torch.cat([x_inv, x_cur], dim=0)
    m = mask[:, None, ...]
    if (counter > start_blend) and (counter < end_blend):
        x_t = x_t[:1] + m * (x_t - x_t[:1])
    return x_t[1:]


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _rand(shape, seed):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_refine_cross_golden():
    cfg = _mk_cfg()
    rs = np.random.RandomState(0)
    mapper = np.concatenate([[0, 1], rs.permutation(75) + 2]).astype(np.int64)
    alphas = (rs.rand(W77) > 0.3).astype(np.float32)
    aw = (rs.rand(W77) > 0.5).astype(np.float32)
    base = _rand((FRAMES, HEADS, S, W77), 1)
    cond = _rand((FRAMES, HEADS, S, W77), 2)
    uncond = _rand((FRAMES, HEADS, S, W77), 3)

    golden = ref_refine_cross(
        torch.tensor(base), torch.tensor(cond)[None],
        torch.tensor(mapper)[None], torch.tensor(alphas)[None],
        torch.tensor(aw).reshape(1, 1, 1, 1, W77)).numpy()[0]

    state = {'base': {cfg.cross_site_names[0]: jnp.asarray(base)},
             'alpha_words': jnp.asarray(aw)}
    static = {'mapper': jnp.asarray(mapper), 'alphas': jnp.asarray(alphas)}
    edit = make_edit_fn(cfg, static)(_site(cfg, 'cross'), S, state)
    out = np.asarray(edit(jnp.concatenate(
        [jnp.asarray(uncond), jnp.asarray(cond)], axis=0)))

    np.testing.assert_allclose(out[:FRAMES], uncond, rtol=1e-6)
    np.testing.assert_allclose(out[FRAMES:], golden, rtol=1e-5, atol=1e-6)


def test_replace_cross_golden():
    cfg = _mk_cfg(refine=False)
    rs = np.random.RandomState(4)
    mapper_mat = rs.rand(W77, W77).astype(np.float32)
    aw = rs.rand(W77).astype(np.float32)
    base = _rand((FRAMES, HEADS, S, W77), 5)
    cond = _rand((FRAMES, HEADS, S, W77), 6)

    golden = ref_replace_cross(
        torch.tensor(base), torch.tensor(cond)[None],
        torch.tensor(mapper_mat)[None],
        torch.tensor(aw).reshape(1, 1, 1, 1, W77)).numpy()[0]

    state = {'base': {cfg.cross_site_names[0]: jnp.asarray(base)},
             'alpha_words': jnp.asarray(aw)}
    static = {'mapper_mat': jnp.asarray(mapper_mat)}
    edit = make_edit_fn(cfg, static)(_site(cfg, 'cross'), S, state)
    out = np.asarray(edit(jnp.concatenate(
        [jnp.zeros((FRAMES, HEADS, S, W77)), jnp.asarray(cond)], axis=0)))
    np.testing.assert_allclose(out[FRAMES:], golden, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('masked', [False, True])
@pytest.mark.parametrize('in_range', [False, True])
def test_self_replace_golden(masked, in_range):
    cfg = _mk_cfg(blend_self=masked)
    name = cfg.self_site_names[0]
    sh, sw = dict(cfg.self_site_hw)[name]
    s = sh * sw
    base = _rand((FRAMES, HEADS, s, s), 7)
    cond = _rand((FRAMES, HEADS, s, s), 8)
    mask = (np.random.RandomState(9).rand(FRAMES, 1, s, 1) > 0.5
            ).astype(np.float32)

    if in_range:
        golden = ref_self_replace(
            torch.tensor(base), torch.tensor(cond)[None],
            torch.tensor(mask) if masked else None).numpy()[0]
    else:
        golden = cond  # forward only edits within [r0, r1) (attn_util:103)

    state = {'base_self': {name: jnp.asarray(base)},
             'self_on': jnp.asarray(in_range),
             'self_mask': {str(s): jnp.asarray(mask)}}
    edit = make_edit_fn(cfg, {})(_site(cfg, 'self'), s, state)
    out = np.asarray(edit(jnp.concatenate(
        [jnp.zeros((FRAMES, HEADS, s, s)), jnp.asarray(cond)], axis=0)))
    np.testing.assert_allclose(out[FRAMES:], golden, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize('hw', [(256, 256), (448, 768)])
def test_latent_blend_golden(hw):
    """latent_blend_step == reference blend_dict construction
    (attention_util.py:40-56: [single inversion-step map, accumulated
    editing maps]) -> SpatialBlender('both') -> gated latent blend."""
    height, width = hw
    h8, w8 = height // 8, width // 8
    b_sites = sites.blend_sites(h8, w8)
    sh, sw = sites.site_hw(b_sites[0], h8, w8)
    s = sh * sw

    cfg = _mk_cfg(h8=h8, w8=w8, height=height, width=width,
                  blend_site_names=tuple(x.name for x in b_sites))
    rs = np.random.RandomState(10)
    alpha_layers = np.zeros((2, W77), np.float32)
    alpha_layers[0, 2] = alpha_layers[1, 3] = 1.0

    base, sums, tgt = {}, {}, {}
    for n in cfg.blend_site_names:
        base[n] = rs.rand(FRAMES, HEADS, s, W77).astype(np.float32)
        sums[n] = rs.rand(FRAMES, HEADS, s, W77).astype(np.float32)
        tgt[n] = rs.rand(FRAMES, HEADS, s, W77).astype(np.float32)
    lat = rs.rand(1, FRAMES, h8, w8, 4).astype(np.float32)
    inv = rs.rand(1, FRAMES, h8, w8, 4).astype(np.float32)

    # reference: concat([inversion-step map, accumulated store]) per site
    maps_list = [torch.tensor(np.stack([base[n], sums[n] + tgt[n]]))
                 for n in cfg.blend_site_names]
    mask = ref_blender_call(maps_list, torch.tensor(alpha_layers), cfg.th,
                            h8, w8, 'both')
    for step_idx in [0, cfg.start_blend, cfg.start_blend + 1,
                     cfg.end_blend - 2, cfg.end_blend - 1]:
        golden = ref_latent_blend(
            torch.tensor(inv).permute(0, 4, 1, 2, 3),
            torch.tensor(lat).permute(0, 4, 1, 2, 3),
            mask, step_idx + 1, cfg.start_blend, cfg.end_blend)
        golden = golden.permute(0, 2, 3, 4, 1).numpy()

        static = {'alpha_layers': jnp.asarray(alpha_layers)}
        out, new_sums = latent_blend_step(
            cfg, static, jnp.asarray(lat), jnp.asarray(inv),
            {n: jnp.asarray(v) for n, v in base.items()},
            {n: jnp.asarray(v) for n, v in sums.items()},
            {n: jnp.asarray(v) for n, v in tgt.items()},
            jnp.asarray(step_idx))
        np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4,
                                   atol=1e-5,
                                   err_msg=f'step {step_idx} hw {hw}')
        for n in cfg.blend_site_names:
            np.testing.assert_allclose(np.asarray(new_sums[n]),
                                       sums[n] + tgt[n], rtol=1e-6)


def test_self_mask_golden():
    """self_masks_for_step == reference attention_blend mask
    (attention_util.py:116-131: SpatialBlender 'source' on the
    inversion-step store, rearranged to (F,1,s,1))."""
    from videoswap_tpu.p2p.edit import self_masks_for_step
    cfg = _mk_cfg(blend_self=True)
    b_sites = sites.blend_sites(H8, W8)
    sh, sw = sites.site_hw(b_sites[0], H8, W8)
    s = sh * sw
    rs = np.random.RandomState(11)
    alpha_layers = np.zeros((2, W77), np.float32)
    alpha_layers[0, 2] = alpha_layers[1, 3] = 1.0
    base = {n: rs.rand(FRAMES, HEADS, s, W77).astype(np.float32)
            for n in cfg.blend_site_names}

    static = {'alpha_layers': jnp.asarray(alpha_layers)}
    ours = self_masks_for_step(cfg, static,
                               {n: jnp.asarray(v) for n, v in base.items()})

    for name, (th_, tw_) in cfg.self_site_hw:
        maps_list = [torch.tensor(base[n])[None] for n in
                     cfg.blend_site_names]
        mask = ref_blender_call(maps_list, torch.tensor(alpha_layers),
                                cfg.th, th_, tw_, 'source')
        # reference: rearrange(mask, 'd c h w -> c d (h w)')[..., None]
        golden = mask.permute(1, 0, 2, 3).reshape(
            FRAMES, 1, th_ * tw_, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(ours[str(th_ * tw_)]), golden, rtol=1e-5,
            err_msg=f'self mask at {name} ({th_}x{tw_})')
