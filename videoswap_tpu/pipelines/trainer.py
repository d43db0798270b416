"""Adapter training: one jit-compiled step.

Parity: /root/reference/videoswap/pipelines/trainer_videoswap.py:33-97 —
VAE-encode the frame batch, sample a high-noise-biased timestep
(`generate_sampleT`, :15-20), add noise, CLIP-encode the prompt, run the
adapter (with point dropout) and the frozen U-Net, masked-MSE on the
epsilon (or v) target, AdamW on the ADAPTER parameters only (train.py:112).

TPU-first differences:
- the whole step (including VAE + text encode) is ONE jitted function with
  donated optimizer/adapter state; the RNG is a threaded jax key;
- timestep bias: t ~ U(min_timestep, 1) * T with prob largeT_prob, else
  U(0, min_timestep) * T — drawn inside the step;
- grad clipping applies to the adapter grads (the reference clips the
  frozen unet's — a no-op since the optimizer only holds adapter params,
  trainer_videoswap.py:91).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from videoswap_tpu.models import AnimateDiffUNet3DModel, SparsePointAdapter
from videoswap_tpu.models.clip_text import CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.schedulers import (DiffusionSchedule, add_noise,
                                      get_velocity)
from videoswap_tpu.utils.registry import PIPELINE_REGISTRY


def sample_biased_timestep(rng: jax.Array, min_timestep: float,
                           num_train_timesteps: int,
                           largeT_prob: float = 1.0) -> jnp.ndarray:
    """t = int(u * T) with u ~ U(min_t, 1) w.p. largeT_prob else U(0, min_t)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    u_hi = jax.random.uniform(k1, (), minval=min_timestep, maxval=1.0)
    u_lo = jax.random.uniform(k2, (), minval=0.0, maxval=min_timestep)
    pick_hi = jax.random.uniform(k3, ()) <= largeT_prob
    u = jnp.where(pick_hi, u_hi, u_lo)
    return (u * num_train_timesteps).astype(jnp.int32)


@PIPELINE_REGISTRY.register()
@dataclass
class VideoSwapTrainer:
    unet: AnimateDiffUNet3DModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    tokenizer: Any
    sched: DiffusionSchedule
    adapter: SparsePointAdapter
    params: dict                       # frozen: unet / vae / text_encoder
    tune_cfg: dict = field(default_factory=dict)
    optimizer_cfg: dict = field(default_factory=dict)
    max_grad_norm: Optional[float] = None
    shardings: Any = None              # optional parallel.TrainSharding
    return_grads: bool = False         # step() also returns grads (dryrun)

    def __post_init__(self):
        lr = float(self.optimizer_cfg.get('lr', 5e-4))
        wd = float(self.optimizer_cfg.get('weight_decay', 0.01))
        betas = self.optimizer_cfg.get('betas', (0.9, 0.999))
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
        if self.max_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(self.max_grad_norm),
                             tx)
        self.tx = tx
        self._step_fn = None
        # training defaults to the Pallas flash kernel (custom VJP,
        # ops/flash_attention.py) + gradient checkpointing: memory-bounded
        # AND 25% faster than chunked-scan attention at production shapes
        # (512^2 x 16f bench_train ablation: cached-VAE step 658 vs 880 ms
        # — the scan over query blocks serializes what flash's grid
        # parallelizes). 'auto' (XLA-fused under remat) OOMs there: 19.7 G
        # HBM needed vs 15.75 G on v5e. Tiny temporal sequences still ride
        # the fused temporal kernel (ops/attention.py routing). tune_cfg
        # 'attn_impl' overrides for ablation ('chunked', 'auto', 'xla').
        # remat mode (same-session A/Bs at 512^2 x 16f, scripts/
        # bench_train_remat.py, 2026-08-20): full-block 665.7/665.8 ms;
        # 'save_flash' (keep attention out+lse) 663.0 — neutral; NO remat
        # OOMs by 0.55 G (16.30 vs 15.75 G); 'edges' (remat ONLY the
        # full-resolution level-0 blocks, save everything deeper)
        # 632.2/632.0 ms — the memory-vs-recompute sweet spot and the
        # default. tune_cfg 'remat' overrides (True = full-block).
        self.unet = self.unet.clone(
            attn_impl=self.tune_cfg.get('attn_impl', 'flash'),
            gradient_checkpointing=self.tune_cfg.get('remat', 'edges'))

    def init_state(self, adapter_params):
        return self.tx.init(adapter_params)

    # ------------------------------------------------------------------ step
    def build_loss_fn(self):
        """loss_fn(adapter_params, frozen, batch, rng) -> scalar loss.

        Exposed so callers (tests, the multichip dryrun) can compare
        sharded-vs-single-device losses and grads numerically."""
        drop_rate = float(self.tune_cfg.get('drop_rate', 0.0))
        min_t = float(self.tune_cfg.get('min_timestep', 0.0))
        loss_type = self.tune_cfg.get('loss_type', 'global')
        sched = self.sched

        def loss_fn(adapter_params, frozen, batch, rng):
            input_ids = batch['input_ids']      # (B, 77)
            tracks = batch['pred_tracks']       # (F, P, 2)
            emb = batch['point_embedding']      # (P, E)

            k_vae, k_t, k_noise, k_drop = jax.random.split(rng, 4)
            if 'latent_mean' in batch:
                # single-video loops encode once and replay the cached
                # posterior moments — the fresh k_vae draw makes this
                # byte-identical to re-encoding every step
                mean, logvar = batch['latent_mean'], batch['latent_logvar']
                size = (mean.shape[3] * 8, mean.shape[2] * 8)   # (W, H)
                latents = self.vae.apply(
                    frozen['vae'], mean, logvar, k_vae,
                    method=AutoencoderKL.sample_video_from_moments)
            else:
                pixels = batch['pixels']        # (B, F, H, W, 3) in [-1, 1]
                size = (pixels.shape[3], pixels.shape[2])       # (W, H)
                latents = self.vae.apply(frozen['vae'], pixels,
                                         method=AutoencoderKL.encode_video,
                                         rng=k_vae)
            t = sample_biased_timestep(k_t, min_t, sched.num_train_timesteps)
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            noisy = add_noise(sched, latents, noise, t)

            text = self.text_encoder.apply(frozen['text_encoder'], input_ids)

            keep = jax.random.uniform(k_drop, (tracks.shape[1],)) > drop_rate
            states, mask = self.adapter.apply(
                {'params': adapter_params}, tracks, size, emb,
                point_mask=keep, loss_type=loss_type)
            states = [s[None] for s in states]          # batch dim

            pred = self.unet.apply(frozen['unet'], noisy, t, text,
                                   adapter_residuals=states)

            if sched.prediction_type == 'epsilon':
                target = noise
            else:
                target = get_velocity(sched, latents, noise, t)
            se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
            m = mask[None].astype(jnp.float32)          # (1, F, h, w, 1)
            m = jnp.broadcast_to(m, se.shape)
            loss = (se * m).sum() / m.sum()
            return loss

        return loss_fn

    def _build_step(self):
        loss_fn = self.build_loss_fn()

        def step(adapter_params, opt_state, frozen, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(adapter_params, frozen,
                                                      batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                adapter_params)
            adapter_params = optax.apply_updates(adapter_params, updates)
            if self.return_grads:
                # the multichip dryrun asserts sharded grads == single-device
                # grads without paying a second value_and_grad compile
                return adapter_params, opt_state, loss, grads
            return adapter_params, opt_state, loss

        donate = (0, 1)
        if self.shardings is not None:
            return jax.jit(step, donate_argnums=donate,
                           in_shardings=self.shardings.step_in,
                           out_shardings=self.shardings.step_out)
        return jax.jit(step, donate_argnums=donate)

    def step(self, adapter_params, opt_state, batch, rng):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn(adapter_params, opt_state, self.params, batch,
                             rng)

    # ------------------------------------------------------------- lr sched
    @staticmethod
    def build_lr_schedule(kind: str, lr: float, total_iter: int,
                          warmup_iter: int = 0):
        if kind == 'constant':
            if warmup_iter:
                return optax.linear_schedule(0.0, lr, warmup_iter)
            return lambda _: lr
        if kind == 'linear':
            return optax.linear_schedule(lr, 0.0, total_iter)
        if kind == 'cosine':
            return optax.cosine_decay_schedule(lr, total_iter)
        raise ValueError(f'unknown lr_scheduler: {kind}')
