"""ED-LoRA (Mix-of-Show) subject finetuning as jit-compiled training.

The reference repo can only *consume* ED-LoRA checkpoints (its trainable
surface is `/root/reference/videoswap/utils/edlora_util.py:199-226` —
LoRALinearLayer with kaiming-uniform(a=sqrt(5)) down, zero up, scale
alpha, monkey-patched onto Linear/1x1-Conv forwards) and the schema it
loads is `/root/reference/videoswap/utils/convert_edlora_to_diffusers.py:
82-105`: `{new_concept_embedding: {name: [16, 768]}, unet: {<torch key>
.lora_down/.lora_up.weight}, text_encoder: {...}}`. This module is the
training side that *produces* that checkpoint — the last north-star
workload (BASELINE.json configs[2]).

TPU-first design — LoRA is functional, not a forward patch:

- `merge_lora` computes `W_eff = W + alpha * up @ down` for every site
  IN-GRAPH (rank-r factors; XLA fuses the update into the consumer
  matmul's operand). The frozen graphs run unchanged with merged params
  and `jax.grad` differentiates w.r.t. the factors + concept embeddings
  only — exactly the parameter set the reference's patcher trains, with
  zero model-code changes.
- Per-layer concept embeddings ([16, 768] per concept) ride the text
  encoder's functional `extra_token_embeds` vocabulary extension
  (models/clip_text.py) — the textual-inversion half of ED-LoRA.
- One donated jit step; optax.multi_transform gives embeddings and LoRA
  factors separate learning rates (Mix-of-Show trains embeddings ~10x
  hotter than factors).

The emitted checkpoint round-trips through `videoswap_tpu.edlora`
(merge_lora_into_params / load_edlora_into_pipeline) byte-for-byte in key
layout, and through the torch reference by construction of the key set.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from videoswap_tpu.edlora import (_TEXT_LORA, _UNET_LORA, NUM_EDLORA_LAYERS,
                                  bind_concept_prompt)
from videoswap_tpu.models import converters
from videoswap_tpu.schedulers import add_noise, get_velocity

# layer-name sets per scope; 'attn' is the reference LoRALinearLayer's
# natural target (attention projections), 'full' is every layer the merge
# path (and the reference's merge_lora_into_weight) supports
_SCOPES = {
    'attn': {'unet': ('to_q', 'to_k', 'to_v', 'to_out_0'),
             'text_encoder': ('q_proj', 'k_proj', 'v_proj', 'out_proj')},
    'full': {'unet': _UNET_LORA, 'text_encoder': _TEXT_LORA},
}


class LoRASite(NamedTuple):
    path: tuple          # flax param path (ends with 'kernel')
    torch_key: str       # canonical torch `...weight` key (checkpoint id)
    is_conv: bool        # 1x1 conv site (proj_in/proj_out) vs Linear


def lora_sites(flax_params: dict, model_type: str,
               scope: str = 'attn') -> tuple:
    """Enumerate LoRA-eligible kernels of a frozen param tree.

    Site identity is the canonical torch key — the same key
    `edlora.merge_lora_into_params` computes when consuming a checkpoint,
    so a trained checkpoint matches its own consumer by construction.
    Motion-module attention is excluded: ED-LoRA checkpoints come from 2D
    SD training and the reference merge never sees motion keys."""
    eligible = set(_SCOPES[scope][model_type])
    key_map = (converters.clip_key_map if model_type == 'text_encoder'
               else None)
    sites = []
    for path, leaf in sorted(traverse_util.flatten_dict(flax_params).items(),
                             key=lambda kv: kv[0]):
        spath = tuple(str(p) for p in path)
        if spath[-1] != 'kernel' or spath[-2] not in eligible:
            continue
        if any('motion_modules' in p for p in spath):
            continue
        key = converters.flax_path_to_torch_key(spath)
        if key_map is not None:
            key = key_map(key)
        sites.append(LoRASite(path, key, np.ndim(leaf) == 4))
    return tuple(sites)


def init_lora_params(rng: jax.Array, flax_params: dict,
                     sites: Sequence[LoRASite], rank: int = 4) -> dict:
    """{torch_key: {'down': [r, I], 'up': [O, r]}} in torch layout.

    Reference init (edlora_util.py:216-217): kaiming_uniform(a=sqrt(5)) on
    the down factor — for a [r, I] weight that is U(-1/sqrt(I), 1/sqrt(I))
    — and zeros on up, so the merged model starts exactly at the base."""
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    keys = jax.random.split(rng, max(len(sites), 1))
    for k, site in zip(keys, sites):
        kernel = flat[site.path]
        if site.is_conv:                     # [1, 1, I, O]
            in_f, out_f = kernel.shape[2], kernel.shape[3]
        else:                                # [I, O]
            in_f, out_f = kernel.shape
        bound = 1.0 / math.sqrt(in_f)
        out[site.torch_key] = {
            'down': jax.random.uniform(k, (rank, in_f), jnp.float32,
                                       -bound, bound),
            'up': jnp.zeros((out_f, rank), jnp.float32),
        }
    return out


def merge_lora(flax_params: dict, lora_params: dict,
               sites: Sequence[LoRASite], alpha: float) -> dict:
    """In-graph `W + alpha * up @ down` over every site (differentiable
    w.r.t. the factors). Same math as edlora.merge_lora_into_params, which
    checks the host-side/consumer direction against torch."""
    flat = dict(traverse_util.flatten_dict(flax_params))
    for site in sites:
        leaf = flat[site.path]
        p = lora_params[site.torch_key]
        delta = (p['up'] @ p['down']).T.astype(leaf.dtype)   # [I, O]
        if site.is_conv:
            delta = delta[None, None]
        flat[site.path] = leaf + alpha * delta
    return traverse_util.unflatten_dict(flat)


# ---------------------------------------------------------------------------
# concept tokens
# ---------------------------------------------------------------------------


def register_concepts(tokenizer, concept_names: Sequence[str]) -> dict:
    """Add `<name_i>` x16 tokens; returns a new_concept_cfg in the layout
    edlora.load_new_concept produces (reference
    convert_edlora_to_diffusers.py:4-33)."""
    cfg = {}
    for name in concept_names:
        token_names = [f'<{name}_{i}>' for i in range(NUM_EDLORA_LAYERS)]
        tokenizer.add_tokens(token_names)
        cfg[name] = {
            'concept_token_ids': [tokenizer.convert_tokens_to_ids(t)
                                  for t in token_names],
            'concept_token_names': token_names,
        }
    return cfg


def init_concept_embedding(text_params: dict, tokenizer,
                           init_token: str) -> jnp.ndarray:
    """[16, 768] initialized from the init token's embedding row(s)
    (mean over sub-tokens), tiled across the 16 layers — the standard
    class-noun warm start for textual inversion."""
    table = traverse_util.flatten_dict(text_params)[('token_embedding',)]
    ids = np.asarray(tokenizer(init_token, padding='max_length').input_ids)[0]
    bos = getattr(tokenizer, 'bos_token_id', None)
    eos = getattr(tokenizer, 'eos_token_id', None)
    content = [int(i) for i in ids if i not in (bos, eos)]
    if not content:
        raise ValueError(f'init_token {init_token!r} tokenized to nothing')
    row = jnp.mean(table[jnp.asarray(content)], axis=0)
    return jnp.tile(row[None], (NUM_EDLORA_LAYERS, 1)).astype(jnp.float32)


def tokenize_layer_prompts(tokenizer, caption: str,
                           new_concept_cfg: dict) -> np.ndarray:
    """Caption -> [16, 77] int32 ids, one row per ED-LoRA layer variant."""
    prompts = bind_concept_prompt(caption, new_concept_cfg)
    return np.asarray(tokenizer(
        prompts, padding='max_length',
        max_length=tokenizer.model_max_length,
        truncation=True).input_ids, np.int32)


# ---------------------------------------------------------------------------
# checkpoint writer (the schema edlora.py / the torch reference consume)
# ---------------------------------------------------------------------------


def save_edlora_checkpoint(path: str, train_params: dict,
                           unet_sites: Sequence[LoRASite],
                           text_sites: Sequence[LoRASite]) -> None:
    """torch.save the reference ED-LoRA schema
    (convert_edlora_to_diffusers.py:82-105). Conv sites are written as
    4-D [r, I, 1, 1]/[O, r, 1, 1] the way torch Conv2d LoRA factors are
    shaped (both consumers .squeeze() before the matmul)."""
    import os

    import torch

    def _pack(lora_params, sites):
        sd = {}
        for site in sites:
            p = lora_params[site.torch_key]
            down = np.asarray(p['down'], np.float32)
            up = np.asarray(p['up'], np.float32)
            if site.is_conv:
                down = down[:, :, None, None]
                up = up[:, :, None, None]
            base = site.torch_key[:-len('.weight')]
            sd[f'{base}.lora_down.weight'] = torch.from_numpy(down)
            sd[f'{base}.lora_up.weight'] = torch.from_numpy(up)
        return sd

    out = {
        'new_concept_embedding': {
            name: torch.from_numpy(np.array(emb, np.float32))
            for name, emb in train_params['concept_emb'].items()},
        'unet': _pack(train_params['unet_lora'], unet_sites),
        'text_encoder': _pack(train_params['text_lora'], text_sites),
    }
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    torch.save(out, path)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


@dataclass
class EDLoRATrainer:
    """One donated jit step over (concept embeddings, LoRA factors).

    Batch per step (shapes static): `input_ids` [16, 77] — the caption's
    16 layer variants; latents either as cached posterior moments
    (`latent_mean`/`latent_logvar`, [1, F, h, w, 4]) or raw `pixels`
    [1, F, H, W, 3]. F=1 for image finetuning (the unet should be built
    with use_motion_module=False — 2D SD, what ED-LoRA checkpoints mean).
    """
    unet: Any
    text_encoder: Any
    vae: Any
    sched: Any
    params: dict                       # frozen unet / vae / text_encoder
    unet_sites: tuple
    text_sites: tuple
    alpha: float = 1.0
    tune_cfg: dict = field(default_factory=dict)
    optimizer_cfg: dict = field(default_factory=dict)
    max_grad_norm: Optional[float] = None
    mesh: Any = None                   # set via shard_edlora_trainer
    return_grads: bool = False         # step() also returns grads (tests)

    def __post_init__(self):
        oc = self.optimizer_cfg
        betas = oc.get('betas', (0.9, 0.999))

        def adamw(lr, wd):
            tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
            if self.max_grad_norm:
                return optax.chain(
                    optax.clip_by_global_norm(self.max_grad_norm), tx)
            return tx

        # Mix-of-Show trains embeddings ~10x hotter than LoRA factors;
        # no weight decay on embeddings (they ARE the concept)
        self.tx = optax.multi_transform(
            {'emb': adamw(float(oc.get('emb_lr', 1e-3)), 0.0),
             'lora': adamw(float(oc.get('lora_lr', 1e-4)),
                           float(oc.get('weight_decay', 0.01)))},
            lambda tree: {
                'concept_emb': jax.tree.map(lambda _: 'emb',
                                            tree['concept_emb']),
                'unet_lora': jax.tree.map(lambda _: 'lora',
                                          tree['unet_lora']),
                'text_lora': jax.tree.map(lambda _: 'lora',
                                          tree['text_lora']),
            })
        self._step_fn = None
        # Measured same-session on v5e at 512^2 batch-1 (scripts/
        # bench_edlora.py, 2026-08-20, post flash-VJP refactor):
        # remat+flash 79.3 ms, NO-remat+flash 57.5 ms, no-remat+XLA 67.5.
        # Batch-1 image activations easily fit HBM, so gradient
        # checkpointing only buys recompute cost — default OFF here
        # (tune_cfg 'remat': True / 'save_flash' for big-batch runs; the
        # 16-frame video trainer keeps full-block remat, trainer.py).
        self.unet = self.unet.clone(
            attn_impl=self.tune_cfg.get('attn_impl', 'flash'),
            gradient_checkpointing=self.tune_cfg.get('remat', False))

    def init_train_params(self, rng: jax.Array, concept_emb: dict,
                          rank: int = 4) -> dict:
        k_u, k_t = jax.random.split(rng)
        return {
            # copy=True: the step donates train_params; aliasing the
            # caller's warm-start arrays would delete their buffers
            'concept_emb': {k: jnp.array(v, jnp.float32, copy=True)
                            for k, v in concept_emb.items()},
            'unet_lora': init_lora_params(
                k_u, self.params['unet']['params'], self.unet_sites, rank),
            'text_lora': init_lora_params(
                k_t, self.params['text_encoder']['params'], self.text_sites,
                rank),
        }

    def init_state(self, train_params: dict):
        return self.tx.init(train_params)

    # ------------------------------------------------------------------ loss
    def build_loss_fn(self):
        from videoswap_tpu.models.vae import AutoencoderKL
        from videoswap_tpu.pipelines.trainer import sample_biased_timestep
        sched = self.sched
        min_t = float(self.tune_cfg.get('min_timestep', 0.0))
        # extra_token_embeds row order == registration order; stable keys
        concept_order = None

        def loss_fn(train_params, frozen, batch, rng):
            nonlocal concept_order
            if concept_order is None:
                concept_order = tuple(train_params['concept_emb'])
            k_vae, k_t, k_noise = jax.random.split(rng, 3)

            text_eff = merge_lora(frozen['text_encoder']['params'],
                                  train_params['text_lora'],
                                  self.text_sites, self.alpha)
            extra = jnp.concatenate(
                [train_params['concept_emb'][n] for n in concept_order],
                axis=0)
            text = self.text_encoder.apply(
                {'params': text_eff}, batch['input_ids'],
                extra_token_embeds=extra)              # [16, 77, 768]
            text = text[None]                          # [1, 16, 77, 768]

            if 'latent_mean' in batch:
                latents = self.vae.apply(
                    frozen['vae'], batch['latent_mean'],
                    batch['latent_logvar'], k_vae,
                    method=AutoencoderKL.sample_video_from_moments)
            else:
                latents = self.vae.apply(
                    frozen['vae'], batch['pixels'],
                    method=AutoencoderKL.encode_video, rng=k_vae)

            t = sample_biased_timestep(k_t, min_t, sched.num_train_timesteps)
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            noisy = add_noise(sched, latents, noise, t)

            unet_eff = merge_lora(frozen['unet']['params'],
                                  train_params['unet_lora'],
                                  self.unet_sites, self.alpha)
            pred = self.unet.apply({'params': unet_eff}, noisy, t, text)

            if sched.prediction_type == 'epsilon':
                target = noise
            else:
                target = get_velocity(sched, latents, noise, t)
            se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
            if 'mask' in batch:                       # [1, F, h, w, 1]
                m = jnp.broadcast_to(batch['mask'].astype(jnp.float32),
                                     se.shape)
                return (se * m).sum() / jnp.maximum(m.sum(), 1.0)
            return se.mean()

        return loss_fn

    def _build_step(self):
        loss_fn = self.build_loss_fn()

        def step(train_params, opt_state, frozen, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(train_params, frozen,
                                                      batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                train_params)
            train_params = optax.apply_updates(train_params, updates)
            if self.return_grads:
                # sharded-vs-single-device tests assert per-leaf grads
                # without paying a second value_and_grad compile
                return train_params, opt_state, loss, grads
            return train_params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def step(self, train_params, opt_state, batch, rng):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        if self.mesh is not None:
            with jax.set_mesh(self.mesh):
                return self._step_fn(train_params, opt_state, self.params,
                                     batch, rng)
        return self._step_fn(train_params, opt_state, self.params, batch,
                             rng)


def shard_edlora_trainer(trainer: 'EDLoRATrainer', mesh) -> 'EDLoRATrainer':
    """Megatron tp-sharded ED-LoRA training over `mesh`.

    The frozen unet/text-encoder kernels shard by the same column/row
    rules inference uses (parallel.param_sharding_rules); the VAE is
    replicated. The rank-r LoRA factors and concept embeddings stay
    replicated — they are tiny (rank 4) and GSPMD propagates the merged
    `W + alpha*up@down` matmul's sharding from W, inserting the factor
    psums in the backward pass. The batch is one image (B=1, F=1), so tp
    is the only axis with work to split; the analogue of the reference's
    accelerate-prepared Mix-of-Show finetune.

    Callers should `replicate_tree` (parallel.sharding) the train params
    and optimizer state onto the mesh before the first step so the
    donated buffers live on all devices."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoswap_tpu.parallel import shard_params

    sharded = {}
    for name, tree in trainer.params.items():
        if name in ('unet', 'text_encoder'):
            sharded[name] = shard_params(tree, mesh)
        else:
            sharded[name] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
    return dataclasses.replace(trainer, params=sharded, mesh=mesh)
