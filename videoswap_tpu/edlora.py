"""ED-LoRA (Mix-of-Show) concept personalization, functional.

Parity: /root/reference/videoswap/utils/convert_edlora_to_diffusers.py and
edlora_util.py. An ED-LoRA checkpoint carries
{new_concept_embedding: {name: [16, 768]}, unet: lora sd, text_encoder:
lora sd} (possibly under 'params'). Loading it:

1. registers `<concept_i>` tokens (16 per concept) in the tokenizer and
   appends their embeddings as EXTRA rows consumed functionally by the flax
   text encoder (`extra_token_embeds`) — no in-place module resize
   (reference convert_edlora_to_diffusers.py:4-33);
2. merges `W + alpha * up @ down` into the unet/text-encoder param VALUES
   (reference merge_lora_into_weight, :36-79) — pytree structure is
   unchanged, so compiled samplers are reused;
3. prompts are expanded into 16 per-layer variants and encoded to
   [B, 16, 77, 768]; each U-Net cross-attn layer slices its row via the
   static `cross_layer_idx` (reference edlora_util.py:85-99 walk order
   down -> mid -> up, identical to our layer numbering).

Because params are immutable jax arrays, "snapshot and restore" around each
swap (reference pipeline_videoswap.py:303-305, 417-421) is just keeping the
old pytree references.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from videoswap_tpu.models import converters

NUM_EDLORA_LAYERS = 16

# flax param paths eligible for LoRA (same layer set the reference merges)
_UNET_LORA = ('to_q', 'to_k', 'to_v', 'to_out_0', 'net_0_proj', 'net_2',
              'proj_in', 'proj_out')
_TEXT_LORA = ('q_proj', 'k_proj', 'v_proj', 'out_proj', 'mlp_fc1', 'mlp_fc2')


def bind_concept_prompt(prompts, new_concept_cfg) -> list[str]:
    """One prompt -> 16 layer-variants with per-layer concept tokens
    (reference edlora_util.py:102-113)."""
    if isinstance(prompts, str):
        prompts = [prompts]
    out = []
    for prompt in prompts:
        layered = [prompt] * NUM_EDLORA_LAYERS
        for concept_name, cfg in new_concept_cfg.items():
            layered = [p.replace(concept_name, tok)
                       for p, tok in zip(layered,
                                         cfg['concept_token_names'])]
        out.extend(layered)
    return out


def load_new_concept(pipeline, new_concept_embedding: dict,
                     enable_edlora: bool = True) -> dict:
    """Register concept tokens + collect their embedding rows."""
    new_concept_cfg = {}
    extra = ([] if pipeline.extra_token_embeds is None
             else [np.asarray(pipeline.extra_token_embeds)])
    for concept_name, emb in new_concept_embedding.items():
        n = NUM_EDLORA_LAYERS if enable_edlora else 1
        token_names = [f'<{concept_name}_{i}>' for i in range(n)]
        pipeline.tokenizer.add_tokens(token_names)
        token_ids = [pipeline.tokenizer.convert_tokens_to_ids(t)
                     for t in token_names]
        arr = np.asarray(emb.float().numpy() if hasattr(emb, 'float')
                         else emb, np.float32).reshape(n, -1)
        extra.append(arr)
        new_concept_cfg[concept_name] = {
            'concept_token_ids': token_ids,
            'concept_token_names': token_names,
        }
    pipeline.extra_token_embeds = jnp.asarray(np.concatenate(extra, axis=0))
    return new_concept_cfg


def merge_lora_into_params(flax_params: dict, lora_sd: dict,
                           model_type: str, alpha: float,
                           key_map=None) -> tuple[dict, int]:
    """Return params with `W + alpha * up @ down` merged into every matched
    kernel. Matching goes through the canonical torch key of each flax path."""
    eligible = _UNET_LORA if model_type == 'unet' else _TEXT_LORA
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    count = 0
    for path, leaf in flat.items():
        spath = tuple(str(p) for p in path)
        out[path] = leaf
        if spath[-1] != 'kernel' or not (set(spath) & set(eligible)):
            continue
        key = converters.flax_path_to_torch_key(spath)
        if key_map is not None:
            key = key_map(key)
        down_key = key.replace('.weight', '.lora_down.weight')
        up_key = key.replace('.weight', '.lora_up.weight')
        if up_key not in lora_sd:
            continue
        down = _np(lora_sd[down_key])
        up = _np(lora_sd[up_key])
        delta = (up.squeeze() @ down.squeeze()).astype(np.float32)  # [O, I]
        if leaf.ndim == 2:        # Dense kernel [I, O]
            delta_f = delta.T
        else:                     # 1x1 conv kernel [1, 1, I, O]
            delta_f = delta.T[None, None]
        out[path] = (leaf + alpha * jnp.asarray(delta_f, leaf.dtype))
        count += 1
    return traverse_util.unflatten_dict(out), count


def _np(t):
    return np.asarray(t.detach().cpu().float().numpy()
                      if hasattr(t, 'detach') else t, np.float32)


def convert_edlora(pipeline, state_dict: dict, enable_edlora: bool,
                   alpha: float = 0.6) -> Optional[dict]:
    """Merge an ED-LoRA checkpoint into the pipeline params (functional
    equivalent of reference convert_edlora, :82-105)."""
    if 'params' in state_dict:
        state_dict = state_dict['params']

    new_concept_cfg = None
    if state_dict.get('new_concept_embedding'):
        new_concept_cfg = load_new_concept(
            pipeline, state_dict['new_concept_embedding'], enable_edlora)

    if 'unet' in state_dict:
        merged, n = merge_lora_into_params(
            pipeline.params['unet']['params'], state_dict['unet'], 'unet',
            alpha)
        pipeline.params = dict(pipeline.params,
                               unet={'params': merged})
        _log(f'merged {n} unet LoRAs (alpha={alpha})')
    if 'text_encoder' in state_dict:
        merged, n = merge_lora_into_params(
            pipeline.params['text_encoder']['params'],
            state_dict['text_encoder'], 'text_encoder', alpha,
            key_map=converters.clip_key_map)
        pipeline.params = dict(pipeline.params,
                               text_encoder={'params': merged})
        _log(f'merged {n} text-encoder LoRAs (alpha={alpha})')
    return new_concept_cfg


def load_edlora_into_pipeline(pipeline, path: str, alpha: float):
    """Transient per-swap load; returns a restore context
    (reference pipeline_videoswap.py:312-320)."""
    ctx = {
        'unet': pipeline.params['unet'],
        'text_encoder': pipeline.params['text_encoder'],
        'extra_token_embeds': pipeline.extra_token_embeds,
        'new_concept_cfg': pipeline.new_concept_cfg,
        'tok_cfg': getattr(pipeline.tokenizer, 'new_concept_cfg', None),
    }
    sd = converters.load_torch_file(path)
    enable_edlora = 'edlora' in path
    new_concept_cfg = convert_edlora(pipeline, sd, enable_edlora, alpha)
    if enable_edlora and new_concept_cfg:
        pipeline.new_concept_cfg = new_concept_cfg
        pipeline.tokenizer.new_concept_cfg = new_concept_cfg
    return ctx


def restore_pipeline(pipeline, ctx: dict) -> None:
    pipeline.params = dict(pipeline.params, unet=ctx['unet'],
                           text_encoder=ctx['text_encoder'])
    pipeline.extra_token_embeds = ctx['extra_token_embeds']
    pipeline.new_concept_cfg = ctx['new_concept_cfg']
    pipeline.tokenizer.new_concept_cfg = ctx['tok_cfg']


def apply_new_concept_cfg(pipeline, new_concept_cfg: dict) -> None:
    """Persistent concepts from new_concept_cfg.json (reference
    test.py:82-86): token names/ids only; embeddings must already be merged
    into the text-encoder checkpoint or provided via a LoRA."""
    pipeline.new_concept_cfg = new_concept_cfg
    pipeline.tokenizer.new_concept_cfg = new_concept_cfg
    for cfg in new_concept_cfg.values():
        pipeline.tokenizer.add_tokens(cfg['concept_token_names'])


def encode_edlora_prompt(pipeline, prompts: list[str]) -> jnp.ndarray:
    """[B, 16, 77, 768] layer-wise embeddings: every prompt is expanded to
    its 16 layer variants (concept-free prompts expand to 16 identical
    rows, covering the reference's negative-prompt tiling,
    edlora_util.py:185-195)."""
    expanded = bind_concept_prompt(prompts, pipeline.new_concept_cfg)
    ids = jnp.asarray(np.asarray(pipeline.tokenizer(
        expanded, padding='max_length',
        max_length=pipeline.tokenizer.model_max_length,
        truncation=True).input_ids))
    fn = pipeline._cached(
        ('text_encode_edlora', ids.shape),
        lambda params, ids, extra: pipeline.text_encoder.apply(
            params, ids, extra_token_embeds=extra))
    emb = fn(pipeline.params['text_encoder'], ids,
             pipeline.extra_token_embeds)
    b = len(prompts)
    return emb.reshape(b, NUM_EDLORA_LAYERS, *emb.shape[1:])


def _log(msg: str) -> None:
    from videoswap_tpu.utils.logger import get_logger
    get_logger().info(msg)
