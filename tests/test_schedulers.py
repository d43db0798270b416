import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.schedulers import (add_noise, ddim_inverse_step,
                                      ddim_inverse_timesteps, ddim_step,
                                      ddim_timesteps, get_velocity,
                                      make_schedule)


@pytest.fixture(scope='module')
def sched():
    return make_schedule()


def test_schedule_tables(sched):
    # Golden values for linear betas 0.00085 -> 0.012 over 1000 steps
    # (matches diffusers DDIMScheduler with the reference's
    # noise_scheduler_kwargs from options/model_cfg/inference.yml).
    assert sched.alphas_cumprod.shape == (1000,)
    np.testing.assert_allclose(float(sched.alphas_cumprod[0]), 1.0 - 0.00085,
                               rtol=1e-6)
    betas = np.linspace(0.00085, 0.012, 1000)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod),
                               np.cumprod(1 - betas), rtol=1e-5)
    assert float(sched.final_alpha_cumprod) == 1.0


def test_timesteps_layout():
    ts = ddim_timesteps(1000, 50, steps_offset=1)
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    inv = ddim_inverse_timesteps(1000, 50)
    assert inv[0] == 0 and inv[-1] == 980 and len(inv) == 50
    assert np.all(np.diff(inv) == 20)


def test_add_noise_endpoints(sched):
    x0 = jnp.ones((1, 2, 4, 4, 4))
    noise = jnp.full_like(x0, 2.0)
    # t=0: almost clean
    xt = add_noise(sched, x0, noise, jnp.array([0]))
    a0 = float(sched.alphas_cumprod[0])
    np.testing.assert_allclose(
        np.asarray(xt), np.sqrt(a0) * 1 + np.sqrt(1 - a0) * 2, rtol=1e-5)
    # t=999: almost pure noise
    xt = add_noise(sched, x0, noise, jnp.array([999]))
    a = float(sched.alphas_cumprod[999])
    assert a < 0.01
    np.testing.assert_allclose(
        np.asarray(xt), np.sqrt(a) * 1 + np.sqrt(1 - a) * 2, rtol=1e-5)


def test_ddim_step_with_true_eps_recovers_x0(sched):
    """If the model predicts the exact noise, iterated DDIM denoising from
    any x_t must land exactly on x0 (closed form of deterministic DDIM)."""
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (1, 2, 4, 4, 4))
    noise = jax.random.normal(k2, x0.shape)
    steps = 10
    ts = ddim_timesteps(1000, steps)
    x = add_noise(sched, x0, noise, jnp.array([int(ts[0])]))
    for t in ts:
        alpha_t = sched.alphas_cumprod[int(t)]
        # true eps for the current sample given fixed (x0, trajectory)
        eps = (x - jnp.sqrt(alpha_t) * x0) / jnp.sqrt(1 - alpha_t)
        x = ddim_step(sched, eps, jnp.array(int(t)), x, steps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_inversion_roundtrip(sched):
    """invert then sample with the same (constant-eps) model returns the
    input up to the 1-step label offset of the reference scheme."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2, 4, 4, 4))
    x_orig = x
    steps = 10
    eps = jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.1

    for t in ddim_inverse_timesteps(1000, steps):
        x = ddim_inverse_step(sched, eps, jnp.array(int(t)), x, steps)
    # forward again with sampling labels shifted by the same offset used in
    # inversion (no steps_offset), so the alpha pairs retrace exactly
    for t in ddim_timesteps(1000, steps, steps_offset=0):
        x = ddim_step(sched, eps, jnp.array(int(t)), x, steps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_orig), atol=1e-3)


def test_v_prediction_consistency():
    sched_v = make_schedule(prediction_type='v_prediction')
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (1, 2, 4, 4, 4))
    noise = jax.random.normal(k2, x0.shape)
    t = jnp.array([500])
    xt = add_noise(sched_v, x0, noise, t)
    v = get_velocity(sched_v, x0, noise, t)
    # One DDIM step with the exact v from t=500 must equal the step computed
    # from the exact epsilon.
    out_v = ddim_step(sched_v, v, t, xt, 50)
    sched_e = make_schedule()
    out_e = ddim_step(sched_e, noise, t, xt, 50)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_e), atol=1e-5)


def test_step_jits_and_scans(sched):
    steps = 5
    ts = jnp.asarray(ddim_timesteps(1000, steps))
    x = jnp.ones((1, 2, 4, 4, 4))

    def body(x, t):
        return ddim_step(sched, 0.1 * x, t, x, steps), None

    out, _ = jax.jit(lambda x: jax.lax.scan(body, x, ts))(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
