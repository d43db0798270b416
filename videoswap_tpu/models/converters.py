"""Checkpoint converters: torch/diffusers state dicts -> flax param pytrees.

The reference consumes four torch checkpoint families (SURVEY.md §5.4):
SD-1.5 diffusers layout (unet/vae/text_encoder, reference train.py:49-72),
AnimateDiff motion modules `mm_sd_v14.ckpt` (train.py:74-76 key remap),
trained adapter `adapter.pth` (test.py:70), and ED-LoRA checkpoints
(handled separately in videoswap_tpu/edlora.py).

Strategy: instead of a hand-written key table, every flax param path is
normalized to its canonical torch key (`flax_path_to_torch_key`); conversion
walks the flax tree, fetches the matching torch tensor, and transposes by
rank (Linear [O,I]->[I,O]; Conv [O,I,kh,kw]->[kh,kw,I,O]; norm scale as-is;
embeddings as-is). Missing/unused keys are reported so structural drift is
caught by tests, mirroring the reference's strict=False load diagnostics
(unet.py:516-517).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# flax module-name fragments that correspond to dotted torch names
_SPECIAL_SUBS = {
    'net_0_proj': 'net.0.proj',
    'net_2': 'net.2',
    'to_out_0': 'to_out.0',
    'mlp_fc1': 'mlp.fc1',
    'mlp_fc2': 'mlp.fc2',
    # VAE flat module names (models/vae.py) — no digit separates the words,
    # so the generic `_<d>` rule cannot split them
    'mid_block_resnets_0': 'mid_block.resnets.0',
    'mid_block_resnets_1': 'mid_block.resnets.1',
    'mid_block_attentions_0': 'mid_block.attentions.0',
}

# deprecated diffusers VAE AttentionBlock keys (pre-0.18 exports, e.g. the
# chilloutmix dump the reference downloads) -> modern Attention keys
_VAE_LEGACY_ATTN = {
    '.query.': '.to_q.',
    '.key.': '.to_k.',
    '.value.': '.to_v.',
    '.proj_attn.': '.to_out.0.',
}

# names where a trailing _digit is literal in torch, not a list index
_LITERAL_NAMES = {'linear_1', 'linear_2'}

_EMBED_LEAVES = ('token_embedding', 'position_embedding')


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    parts = []
    for comp in path:
        if comp == 'conv2d':       # InflatedConv wrapper level, not in torch
            continue
        if comp in _SPECIAL_SUBS:
            parts.append(_SPECIAL_SUBS[comp])
            continue
        if comp in _LITERAL_NAMES:
            parts.append(comp)
            continue
        # list-index suffixes: resnets_0 -> resnets.0; multi-index names
        # like down_blocks_0_resnets_1 (VAE) -> down_blocks.0.resnets.1
        comp = re.sub(r'_(\d+)(_|$)', r'.\1.', comp).rstrip('.')
        parts.append(comp)
    key = '.'.join(parts)
    # flax leaf names -> torch leaf names
    key = re.sub(r'\.kernel$', '.weight', key)
    key = re.sub(r'\.scale$', '.weight', key)
    if key.endswith(_EMBED_LEAVES):
        key += '.weight'
    return key


def _convert_tensor(torch_tensor, flax_leaf_path: tuple[str, ...],
                    expect_shape) -> np.ndarray:
    t = np.asarray(torch_tensor.detach().cpu().float().numpy()
                   if hasattr(torch_tensor, 'detach') else torch_tensor,
                   dtype=np.float32)
    leaf = flax_leaf_path[-1]
    if leaf == 'kernel':
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
    if flax_leaf_path[-1] in _EMBED_LEAVES or (
            len(flax_leaf_path) >= 2
            and flax_leaf_path[-2] in _EMBED_LEAVES):
        pass  # embeddings keep [V, D]
    if tuple(t.shape) != tuple(expect_shape):
        raise ValueError(
            f'shape mismatch for {"/".join(flax_leaf_path)}: torch '
            f'{t.shape} vs flax {tuple(expect_shape)}')
    return t


def convert_state_dict(
    torch_sd: dict[str, Any], flax_params: dict,
    key_map: Callable[[str], str] | None = None,
    strict: bool = True,
) -> tuple[dict, list[str], list[str]]:
    """Fill `flax_params`-shaped tree from `torch_sd`.

    key_map optionally rewrites the generated torch key (prefixing etc.).
    Returns (params, missing_keys, unused_torch_keys).
    """
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    used = set()
    missing = []
    for path, leaf in flat.items():
        key = flax_path_to_torch_key(tuple(str(p) for p in path))
        if key_map is not None:
            key = key_map(key)
        if key in torch_sd:
            out[path] = jnp.asarray(
                _convert_tensor(torch_sd[key], path, leaf.shape),
                dtype=leaf.dtype)
            used.add(key)
        else:
            missing.append(key)
            out[path] = leaf
    unused = [k for k in torch_sd
              if k not in used and not k.endswith('.pe')
              and not k.endswith('position_ids')
              and 'num_batches_tracked' not in k]
    if strict and missing:
        raise KeyError(f'{len(missing)} params missing from checkpoint, '
                       f'first 10: {missing[:10]}')
    return traverse_util.unflatten_dict(out), missing, unused


# ---------------------------------------------------------------------------
# per-model key_map helpers
# ---------------------------------------------------------------------------

def unet_key_map(key: str) -> str:
    return key.replace('.params.', '.')


def clip_key_map(key: str) -> str:
    """flax 'layers.0.self_attn.q_proj.weight' -> transformers
    'text_model.encoder.layers.0.self_attn.q_proj.weight'."""
    if key.startswith(_EMBED_LEAVES):
        return 'text_model.embeddings.' + key
    if key.startswith('layers.'):
        return 'text_model.encoder.' + key
    return 'text_model.' + key


def load_torch_file(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return sd


def convert_unet(torch_sd: dict, flax_params: dict, strict: bool = False):
    """SD-1.5 2D U-Net weights -> 3D flax U-Net (non-strict: motion modules
    stay at init, matching from_pretrained_2d, reference unet.py:510-517).
    Then overlay the AnimateDiff motion state dict if merged into torch_sd."""
    params, missing, unused = convert_state_dict(
        torch_sd, flax_params, key_map=unet_key_map, strict=False)
    real_missing = [k for k in missing if 'motion_modules' not in k]
    if strict and real_missing:
        raise KeyError(f'missing non-motion unet keys: {real_missing[:10]}')
    return params, missing, unused


def _normalize_vae_keys(torch_sd: dict) -> dict:
    """Rewrite deprecated AttentionBlock keys (query/key/value/proj_attn)
    to the modern Attention names; modern dicts pass through unchanged."""
    out = {}
    for k, v in torch_sd.items():
        for old, new in _VAE_LEGACY_ATTN.items():
            if old in k and 'attentions' in k:
                k = k.replace(old, new)
                break
        out[k] = v
    return out


def convert_vae_diag(torch_sd: dict, flax_params: dict):
    return convert_state_dict(_normalize_vae_keys(torch_sd), flax_params,
                              strict=True)


def convert_vae(torch_sd: dict, flax_params: dict):
    return convert_vae_diag(torch_sd, flax_params)[0]


def convert_text_encoder(torch_sd: dict, flax_params: dict):
    return convert_state_dict(torch_sd, flax_params, key_map=clip_key_map,
                              strict=True)[0]


_VISION_EMBED_PREFIXES = ('class_embedding', 'patch_embedding',
                          'position_embedding')


def clip_vision_key_map(key: str) -> str:
    """flax 'layers.0...' -> transformers 'vision_model.encoder.layers.0...'
    (standalone CLIPVisionModel state dict)."""
    if key.startswith(_VISION_EMBED_PREFIXES):
        return 'vision_model.embeddings.' + key
    if key.startswith('layers.'):
        return 'vision_model.encoder.' + key
    return 'vision_model.' + key


def clip_full_key_map(key: str) -> str:
    """Key map for the full CLIPModel layout (both towers + projections),
    consumed by models/clip_vision.CLIPWithProjection."""
    if key.startswith('text_model.'):
        return clip_key_map(key[len('text_model.'):])
    if key.startswith('vision_model.'):
        return clip_vision_key_map(key[len('vision_model.'):])
    return key   # visual_projection.weight / text_projection.weight


def convert_clip_vision(torch_sd: dict, flax_params: dict):
    return convert_state_dict(torch_sd, flax_params,
                              key_map=clip_vision_key_map, strict=True)[0]


def convert_clip_full(torch_sd: dict, flax_params: dict):
    sd = {k: v for k, v in torch_sd.items() if k != 'logit_scale'}
    return convert_state_dict(sd, flax_params,
                              key_map=clip_full_key_map, strict=True)[0]


def convert_adapter(torch_sd: dict, flax_params: dict):
    return convert_state_dict(torch_sd, flax_params, strict=True)[0]
