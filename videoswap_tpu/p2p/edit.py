"""Prompt-to-prompt editing as pure functions + a static "edit bundle".

Functional rebuild of the reference controller stack (attention_util.py:
AttentionControlEdit/AttentionRefine/AttentionReplace + make_controller):

- `make_edit_bundle` (host-side, per edit) precomputes every static tensor:
  the refinement/replacement token mapper (seq_aligner), the per-step
  cross-replacement word gate (ptp_utils.get_time_words_attention_alpha),
  the word-selection alphas of both blenders, plus the REVERSED per-step
  inversion stores (latents + attention maps) as scan inputs — replacing the
  reference's `step_in_store = len(store) - cur_step - 1` reverse indexing
  (attention_util.py:92) with array reversal outside the loop.
- `make_edit_fn` returns the per-site probability rewrite executed inside
  the jitted U-Net (cross refine/replace with time gating,
  attention_util.py:110-113; masked self replacement :114-133).
- `latent_blend_step` applies the SpatialBlender latent mask each step
  (attention_util.py:28-62), comparing the per-step inversion maps against
  the RUNNING SUM of editing maps (the reference's accumulated
  `attention_store`), both max-normalized so the sum/single scale cancels.

Reference defaults (pipeline_videoswap.py:254-268): cross_replace_steps and
self_replace_steps are 0.0 — only latent blending is active; the attention
rewrite machinery engages when a swap_cfg raises those values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from . import blend, ptp_utils, seq_aligner, sites
from .ctrl import AttnCtrl, SiteKey


@dataclass(frozen=True)
class EditConfig:
    num_steps: int
    video_length: int
    h8: int
    w8: int
    height: int
    width: int
    do_cfg: bool
    refine: bool
    cross_active: bool
    self_range: tuple[int, int]
    blend_latents: bool
    blend_self: bool
    th: float
    start_blend: int
    end_blend: int
    blend_site_names: tuple[str, ...]
    cross_site_names: tuple[str, ...]
    self_site_names: tuple[str, ...]
    self_site_hw: tuple[tuple[str, tuple[int, int]], ...]
    # recompute the base SELF maps from the stored pre-step inversion
    # latents instead of storing them: 50-step self stores at 512^2 are
    # ~5 GB of HBM (the reference CPU-offloads, attention_store.py:98);
    # one extra no-CFG U-Net pass per edit step instead
    recompute_self: bool = False


@dataclass
class EditBundle:
    cfg: EditConfig
    static_state: dict          # mapper/alphas/alpha_words/alpha_layers
    xs: dict                    # per-step reversed inversion arrays
    init_sums: dict             # running-sum init for blend sites


def _flatten_attn_store(store: dict) -> dict:
    """Nested sow collection -> {site_name: array}."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(store)
    out = {}
    for path, v in flat.items():
        out[str(path[-1])] = v
    return out


def self_store_bytes(num_steps: int, video_length: int, h8: int, w8: int,
                     heads: int = 8, itemsize: int = 2) -> int:
    """Projected HBM bytes of storing every self site over all steps."""
    total = 0
    for s in sites.all_sites('self'):
        tok = sites.site_tokens(s, h8, w8)
        if tok < sites.CTRL_MAX_TOKENS:
            total += num_steps * video_length * heads * tok * tok * itemsize
    return total


SELF_STORE_BUDGET = 1 << 30     # 1 GiB: above this, recompute instead


def want_recompute_self(editing_config: dict, height: int, width: int,
                        video_length: int, num_steps: int) -> bool:
    h8, w8 = height // 8, width // 8
    needs_self = any((s.get('blend_cfg') or {}).get('self_replace_steps')
                     for s in editing_config.get('editing_prompts',
                                                 {}).values())
    if not needs_self:
        return False
    mode = editing_config.get('recompute_self_stores', 'auto')
    if mode in (True, False):
        return bool(mode)
    return self_store_bytes(num_steps, video_length, h8, w8)         > SELF_STORE_BUDGET


def make_edit_bundle(tokenizer,
                     source_prompt: str,
                     target_prompt: str,
                     num_steps: int,
                     video_length: int,
                     height: int,
                     width: int,
                     inv_latents_per_step: jnp.ndarray,
                     inv_attn_store: dict,
                     blend_words=None,
                     blend_cfg: Optional[dict] = None,
                     do_cfg: bool = True,
                     is_replace: bool = False,
                     recompute_self: bool = False,
                     inv_z0=None,
                     inv_ts=None) -> EditBundle:
    blend_cfg = blend_cfg or {}
    h8, w8 = height // 8, width // 8
    prompts = [source_prompt, target_prompt]

    cross_replace = blend_cfg.get('cross_replace_steps', 0.0)
    self_replace = blend_cfg.get('self_replace_steps', 0.0)
    th = float(blend_cfg.get('blend_th', 0.3))

    b_sites = sites.blend_sites(h8, w8)
    hws = {sites.site_hw(s, h8, w8) for s in b_sites}
    assert len(hws) == 1, (
        f'blend sites span multiple map resolutions {hws} at latent '
        f'{h8}x{w8}; use image size >= 256 (the reference crashes here too)')

    cross_s = [s for s in sites.all_sites('cross')
               if sites.site_tokens(s, h8, w8) < sites.CTRL_MAX_TOKENS]
    self_s = [s for s in sites.all_sites('self')
              if sites.site_tokens(s, h8, w8) < sites.CTRL_MAX_TOKENS]

    if isinstance(self_replace, float) or isinstance(self_replace, int):
        self_range = (0, int(num_steps * float(self_replace)))
    else:
        self_range = (int(num_steps * self_replace[0]),
                      int(num_steps * self_replace[1]))
    cross_active = (np.max(ptp_utils.get_time_words_attention_alpha(
        prompts, num_steps, cross_replace, tokenizer)) > 0)
    self_active = self_range[1] > self_range[0]

    cfg = EditConfig(
        num_steps=num_steps, video_length=video_length, h8=h8, w8=w8,
        height=height, width=width, do_cfg=do_cfg, refine=not is_replace,
        cross_active=bool(cross_active), self_range=self_range,
        blend_latents=blend_words is not None,
        blend_self=blend_words is not None and self_active,
        recompute_self=bool(recompute_self and self_active),
        th=th, start_blend=int(0.2 * num_steps),
        end_blend=int(0.8 * num_steps),
        blend_site_names=tuple(s.name for s in b_sites),
        cross_site_names=tuple(s.name for s in cross_s),
        self_site_names=tuple(s.name for s in self_s),
        self_site_hw=tuple((s.name, sites.site_hw(s, h8, w8))
                           for s in self_s),
    )

    # ---- static text tensors ----------------------------------------------
    static_state: dict[str, Any] = {}
    if is_replace:
        static_state['mapper_mat'] = jnp.asarray(
            seq_aligner.get_replacement_mapper(prompts, tokenizer)[0])
    else:
        mapper, alphas = seq_aligner.get_refinement_mapper(prompts,
                                                           tokenizer)
        static_state['mapper'] = jnp.asarray(mapper[0])
        static_state['alphas'] = jnp.asarray(alphas[0])
    static_state['alpha_words'] = jnp.asarray(
        ptp_utils.get_time_words_attention_alpha(
            prompts, num_steps, cross_replace, tokenizer)[:, 0, 0, 0, :])

    if blend_words is not None:
        alpha_layers = np.zeros((2, 77), np.float32)
        for i, (prompt, words) in enumerate(zip(prompts, blend_words)):
            words = [words] if isinstance(words, str) else words
            for word in words:
                ind = ptp_utils.get_word_inds(prompt, word, tokenizer)
                alpha_layers[i, ind] = 1.0
        static_state['alpha_layers'] = jnp.asarray(alpha_layers)

    # ---- reversed per-step inversion arrays -------------------------------
    inv_attn = _flatten_attn_store(inv_attn_store)
    xs: dict[str, Any] = {}
    if cfg.blend_latents:
        xs['inv_latents'] = inv_latents_per_step[::-1]
    needed = set(cfg.blend_site_names if (cfg.blend_latents or cfg.blend_self)
                 else ())
    if cfg.cross_active:
        needed |= set(cfg.cross_site_names)
    xs['base_cross'] = {n: inv_attn[n][::-1] for n in sorted(needed)
                        if n in inv_attn}
    missing = needed - set(xs['base_cross'])
    assert not missing, f'inversion store missing sites: {missing}'
    if self_active and not cfg.recompute_self:
        xs['base_self'] = {n: inv_attn[n][::-1]
                           for n in cfg.self_site_names}
    elif cfg.recompute_self:
        # pre-step inversion latents + timesteps, reversed: edit step i
        # recomputes inversion step N-1-i's U-Net pass for its self maps
        assert inv_z0 is not None and inv_ts is not None
        pre = jnp.concatenate([inv_z0[None],
                               inv_latents_per_step[:-1]], axis=0)
        xs['inv_lat_pre'] = pre[::-1]
        xs['inv_t'] = jnp.asarray(inv_ts)[::-1]

    init_sums = {}
    if cfg.blend_latents:
        for n in cfg.blend_site_names:
            a = inv_attn[n]
            init_sums[n] = jnp.zeros(a.shape[1:], jnp.float32)

    return EditBundle(cfg=cfg, static_state=static_state, xs=xs,
                      init_sums=init_sums)


def store_filter_for(bundle_cfg: EditConfig):
    names = set(bundle_cfg.blend_site_names)
    return lambda site, q: site.name in names


def inversion_store_filter(editing_config: dict, tokenizer, height: int,
                           width: int, video_length: int = 16,
                           num_steps: int = 50):
    """Which sites the inversion pass must capture, across all swaps
    (reference stores everything < 32^2; we store what is consumed).
    Self sites are skipped when the recompute path will regenerate them."""
    h8, w8 = height // 8, width // 8
    names = {s.name for s in sites.blend_sites(h8, w8)}
    recompute = want_recompute_self(editing_config, height, width,
                                    video_length, num_steps)
    for swap_cfg in editing_config.get('editing_prompts', {}).values():
        bc = swap_cfg.get('blend_cfg', {}) or {}
        if bc.get('cross_replace_steps', 0.0):
            names |= {s.name for s in sites.all_sites('cross')
                      if sites.site_tokens(s, h8, w8)
                      < sites.CTRL_MAX_TOKENS}
        if bc.get('self_replace_steps', 0.0) and not recompute:
            names |= {s.name for s in sites.all_sites('self')
                      if sites.site_tokens(s, h8, w8)
                      < sites.CTRL_MAX_TOKENS}
    return lambda site, q: site.name in names


# --------------------------------------------------------------------------
# jit-side functions
# --------------------------------------------------------------------------

def _cond_half(probs: jnp.ndarray, f: int, do_cfg: bool):
    if do_cfg:
        return probs[:f], probs[f:]
    return None, probs


def _join(uncond, cond, do_cfg: bool):
    if do_cfg:
        return jnp.concatenate([uncond, cond.astype(uncond.dtype)], axis=0)
    return cond


def make_edit_fn(cfg: EditConfig, static_state: dict):
    """Builds AttnCtrl.edit_fn: (site, q_tokens, state) -> probs-rewrite."""
    f = cfg.video_length

    def edit_cross(probs, state, name):
        uncond, cond = _cond_half(probs, f, cfg.do_cfg)
        base = state['base'][name].astype(jnp.float32)       # (F,h,s,77)
        cond32 = cond.astype(jnp.float32)
        if cfg.refine:
            mapper = static_state['mapper']
            alphas = static_state['alphas']
            base_rep = base[..., mapper] * alphas + cond32 * (1 - alphas)
        else:
            base_rep = jnp.einsum('fhsw,wn->fhsn', base,
                                  static_state['mapper_mat'])
        aw = state['alpha_words']                            # (77,)
        new = base_rep * aw + cond32 * (1 - aw)
        return _join(uncond, new, cfg.do_cfg)

    def edit_self(probs, state, name, q_tokens):
        uncond, cond = _cond_half(probs, f, cfg.do_cfg)
        base = state['base_self'][name].astype(jnp.float32)
        cond32 = cond.astype(jnp.float32)
        if cfg.blend_self:
            mask = state['self_mask'][str(q_tokens)]         # (F,1,s,1)
            repl = mask * cond32 + (1 - mask) * base
        else:
            repl = jnp.broadcast_to(base, cond32.shape)
        new = jnp.where(state['self_on'], repl, cond32)
        return _join(uncond, new, cfg.do_cfg)

    def edit_fn(site: SiteKey, q_tokens: int, state):
        name = site.name
        if site.kind == 'cross':
            if not cfg.cross_active or name not in cfg.cross_site_names:
                return None
            return lambda p: edit_cross(p, state, name)
        if cfg.self_range[1] <= cfg.self_range[0] or \
                name not in cfg.self_site_names:
            return None
        return lambda p: edit_self(p, state, name, q_tokens)

    return edit_fn


def self_masks_for_step(cfg: EditConfig, static_state: dict,
                        base_cross: dict) -> dict:
    """Source-prompt blend masks at each self-site resolution
    (attention_util.py:116-125), computed from this step's inversion maps."""
    out = {}
    maps = [base_cross[n][None] for n in cfg.blend_site_names]  # (1,F,h,s,77)
    alpha_src = static_state['alpha_layers'][:1]
    for name, (sh, sw) in cfg.self_site_hw:
        key = str(sh * sw)
        if key in out:
            continue
        m = blend.blend_mask(maps, alpha_src, cfg.th, (sh, sw),
                             cfg.height, cfg.width)          # (1,F,sh,sw)
        out[key] = m[0].reshape(cfg.video_length, 1, sh * sw, 1).astype(
            jnp.float32)
    return out


def latent_blend_step(cfg: EditConfig, static_state: dict, lat: jnp.ndarray,
                      inv_lat: jnp.ndarray, base_cross: dict, sums: dict,
                      tgt_maps: dict, step_idx) -> tuple[jnp.ndarray, dict]:
    """One step of SpatialBlender latent blending; returns (lat, new_sums).

    tgt_maps: this step's sown target maps (cond half pre-edit,
    (F, heads, s, 77)). sums accumulate them (the reference's summed
    `attention_store`)."""
    new_sums = {n: sums[n] + tgt_maps[n].astype(jnp.float32)
                for n in cfg.blend_site_names}
    site_maps = [jnp.stack([base_cross[n].astype(jnp.float32),
                            new_sums[n]])           # (2, F, heads, s, 77)
                 for n in cfg.blend_site_names]
    mask = blend.blend_mask(site_maps, static_state['alpha_layers'], cfg.th,
                            (cfg.h8, cfg.w8), cfg.height, cfg.width)
    mask = blend.union_both(mask)[1]                # (F, h8, w8)
    blended = blend.latent_blend(inv_lat.astype(lat.dtype), lat, mask)
    counter = step_idx + 1
    gate = (counter > cfg.start_blend) & (counter < cfg.end_blend)
    return jnp.where(gate, blended, lat), new_sums


def make_store_edit_ctrl(cfg: EditConfig, static_state: dict,
                         state: dict) -> AttnCtrl:
    mode = 'store_edit' if cfg.blend_latents else 'edit'
    return AttnCtrl(mode=mode, store_filter=store_filter_for(cfg),
                    edit_fn=make_edit_fn(cfg, static_state), state=state)
