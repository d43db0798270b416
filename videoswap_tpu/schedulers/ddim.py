"""DDPM/DDIM noise schedules and steps as pure, jit-able functions.

Semantics match the diffusers 0.19.3 `DDIMScheduler` / `DDIMInverseScheduler`
as configured by the reference (see /root/reference/videoswap/pipelines/
pipeline_videoswap.py:104-163 and options/model_cfg/inference.yml
`noise_scheduler_kwargs`): linear betas 0.00085->0.012 over 1000 train steps,
epsilon prediction, `clip_sample=False`, `steps_offset=1`,
`set_alpha_to_one=True`, eta=0 (deterministic DDIM).

Everything is expressed over `alphas_cumprod` so a step works for traced
integer timesteps inside `lax.scan`. Timestep tensors broadcast against
(B, F, H, W, C) video latents.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Static schedule tables (host numpy -> device constants under jit)."""
    alphas_cumprod: jnp.ndarray       # [num_train_timesteps] float32
    final_alpha_cumprod: jnp.ndarray  # scalar: alpha used "past the end"
    num_train_timesteps: int
    prediction_type: str              # 'epsilon' | 'v_prediction'
    init_noise_sigma: float


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = 'linear',
    prediction_type: str = 'epsilon',
    set_alpha_to_one: bool = True,
) -> DiffusionSchedule:
    if beta_schedule == 'linear':
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    elif beta_schedule == 'scaled_linear':
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == 'squaredcos_cap_v2':
        # Glide cosine schedule.
        t = np.arange(num_train_timesteps, dtype=np.float64)

        def bar(s):
            return np.cos((s / num_train_timesteps + 0.008) / 1.008
                          * np.pi / 2) ** 2

        betas = np.minimum(1.0 - bar(t + 1) / bar(t), 0.999)
    else:
        raise ValueError(f'unknown beta_schedule: {beta_schedule}')

    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        init_noise_sigma=1.0,
    )


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int,
                   steps_offset: int = 1) -> np.ndarray:
    """Descending sampling timesteps, e.g. [981, 961, ..., 1] for 50 steps."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1]
    return (ts + steps_offset).astype(np.int64)


def ddim_inverse_timesteps(num_train_timesteps: int,
                           num_inference_steps: int) -> np.ndarray:
    """Ascending inversion timesteps, e.g. [0, 20, ..., 980] for 50 steps.

    Matches diffusers 0.19.3 DDIMInverseScheduler.set_timesteps (no offset);
    the reference relies on this exact label sequence during `invert`.
    """
    ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)


def _gather_alpha(sched: DiffusionSchedule, t: jnp.ndarray,
                  ndim: int) -> jnp.ndarray:
    """alphas_cumprod[t] (or final past either end), shaped to broadcast.

    `t` is clipped for gather safety; out-of-range values select
    `final_alpha_cumprod` (t < 0, both ends behave like diffusers).
    """
    t = jnp.asarray(t)
    a = sched.alphas_cumprod[jnp.clip(t, 0, sched.num_train_timesteps - 1)]
    a = jnp.where(t < 0, sched.final_alpha_cumprod, a)
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def pred_x0_from_eps(sample, eps, alpha_t):
    return (sample - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)


def _to_eps_and_x0(sched: DiffusionSchedule, model_output, sample, alpha_t):
    """Convert the network output to (epsilon, x0) per prediction_type."""
    if sched.prediction_type == 'epsilon':
        eps = model_output
        x0 = pred_x0_from_eps(sample, eps, alpha_t)
    elif sched.prediction_type == 'v_prediction':
        sqrt_a = jnp.sqrt(alpha_t)
        sqrt_1ma = jnp.sqrt(1.0 - alpha_t)
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    else:
        raise ValueError(f'unknown prediction_type: {sched.prediction_type}')
    return eps, x0


def ddim_step(sched: DiffusionSchedule, model_output: jnp.ndarray,
              t: jnp.ndarray, sample: jnp.ndarray,
              num_inference_steps: int) -> jnp.ndarray:
    """One deterministic DDIM denoising step: x_t -> x_{t-Delta}."""
    delta = sched.num_train_timesteps // num_inference_steps
    alpha_t = _gather_alpha(sched, t, sample.ndim)
    alpha_prev = _gather_alpha(sched, t - delta, sample.ndim)
    eps, x0 = _to_eps_and_x0(sched, model_output, sample, alpha_t)
    return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps


def ddim_inverse_step(sched: DiffusionSchedule, model_output: jnp.ndarray,
                      t: jnp.ndarray, sample: jnp.ndarray,
                      num_inference_steps: int) -> jnp.ndarray:
    """One DDIM inversion step: x_{t-Delta} -> x_t.

    `t` is the label from `ddim_inverse_timesteps`; the current sample sits
    at noise level `t - Delta` (clean image for the first step, where the
    "previous" alpha is `final_alpha_cumprod` = 1), exactly as diffusers'
    DDIMInverseScheduler.step treats it.
    """
    delta = sched.num_train_timesteps // num_inference_steps
    alpha_src = _gather_alpha(sched, t - delta, sample.ndim)
    alpha_dst = _gather_alpha(sched, t, sample.ndim)
    eps, x0 = _to_eps_and_x0(sched, model_output, sample, alpha_src)
    return jnp.sqrt(alpha_dst) * x0 + jnp.sqrt(1.0 - alpha_dst) * eps


def add_noise(sched: DiffusionSchedule, original: jnp.ndarray,
              noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (DDPM add_noise)."""
    alpha_t = _gather_alpha(sched, t, original.ndim)
    return jnp.sqrt(alpha_t) * original + jnp.sqrt(1.0 - alpha_t) * noise


def get_velocity(sched: DiffusionSchedule, original: jnp.ndarray,
                 noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """v-prediction target: v = sqrt(a) * eps - sqrt(1-a) * x0."""
    alpha_t = _gather_alpha(sched, t, original.ndim)
    return jnp.sqrt(alpha_t) * noise - jnp.sqrt(1.0 - alpha_t) * original
