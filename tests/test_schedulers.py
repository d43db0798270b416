import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.schedulers import (add_noise, ddim_inverse_step,
                                      ddim_inverse_timesteps, ddim_step,
                                      ddim_timesteps, dpm_pp_2m_step,
                                      dpm_timesteps, get_velocity,
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


# --------------------------------------------------------- DPM-Solver++(2M)

def _run_dpm_chain(sched, x, steps, eps_for):
    """Host loop over dpm_pp_2m_step; eps_for(x, t:int, i:int) -> eps."""
    prev_x0 = jnp.zeros_like(x)
    for i, t in enumerate(dpm_timesteps(1000, steps)):
        eps = eps_for(x, int(t), i)
        x, prev_x0 = dpm_pp_2m_step(sched, eps, jnp.array(int(t)), x,
                                    prev_x0, jnp.array(i), steps)
    return x


def _dpm_numpy_restatement(alphas_cumprod, final_alpha, steps, eps_seq, x):
    """Literal numpy restatement of DPM-Solver++(2M) (Lu et al.,
    arXiv:2211.01095, Alg. 2) on the DDIM grid, with the same sigma floor
    and lower-order rules as schedulers/dpm.py — an independent spelling
    of the update for refactor-guarding, fed an arbitrary eps sequence."""
    floor = 1e-4
    n = steps
    delta = 1000 // n

    def asl(t):
        a = final_alpha if t < 0 else alphas_cumprod[min(t, 999)]
        al, sg = np.sqrt(a), max(np.sqrt(1.0 - a), floor)
        return a, al, sg, np.log(al / sg)

    ts = dpm_timesteps(1000, n)
    prev_x0 = np.zeros_like(x)
    for i, t in enumerate(ts):
        t = int(t)
        a_c, _, sg_c, lam_c = asl(t)
        _, al_n, sg_n, lam_n = asl(t - delta)
        _, _, _, lam_p = asl(t + delta)
        eps = eps_seq[i]
        x0 = (x - np.sqrt(1.0 - a_c) * eps) / np.sqrt(a_c)
        h = lam_n - lam_c
        r = (lam_c - lam_p) / h
        if i == 0 or (n < 15 and i == n - 1):
            d = x0
        else:
            d = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0
        x = (sg_n / sg_c) * x - al_n * np.expm1(-h) * d
        prev_x0 = x0
    return x


@pytest.mark.parametrize('steps', [8, 20])
def test_dpm_matches_numpy_restatement(sched, steps):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 4).astype(np.float32)
    eps_seq = rs.randn(steps, *x.shape).astype(np.float32) * 0.3

    out_jax = _run_dpm_chain(sched, jnp.asarray(x), steps,
                             lambda _x, _t, i: jnp.asarray(eps_seq[i]))
    out_np = _dpm_numpy_restatement(np.asarray(sched.alphas_cumprod),
                                    float(sched.final_alpha_cumprod),
                                    steps, eps_seq, x.copy())
    np.testing.assert_allclose(np.asarray(out_jax), out_np, rtol=2e-4,
                               atol=2e-4)


def test_dpm_exact_x0_prediction_recovers_x0(sched):
    """With eps always consistent with a fixed x0, every D equals x0 and
    the solver must land on x0 (up to the final-step sigma floor)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x0 = jax.random.normal(k1, (1, 2, 4, 4, 4))
    noise = jax.random.normal(k2, x0.shape)
    steps = 10
    ts = dpm_timesteps(1000, steps)
    x = add_noise(sched, x0, noise, jnp.array([int(ts[0])]))

    def eps_for(x, t, i):
        a = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    out = _run_dpm_chain(sched, x, steps, eps_for)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-3)


def test_dpm_second_order_beats_ddim_on_analytic_gaussian(sched):
    """Gaussian data x0 ~ N(0, v): the exact eps is linear in x, the
    probability-flow ODE is linear, and its exact solution is
    x * sqrt(sig2(t')/sig2(t)) with sig2 = a*v + (1-a). At the same
    20-step budget the second-order multistep solver must track that
    solution substantially closer than first-order DDIM."""
    v = 9.0
    steps = 20
    ts = ddim_timesteps(1000, steps)
    a_T = float(sched.alphas_cumprod[int(ts[0])])
    rs = np.random.RandomState(2)
    x_init = rs.randn(256).astype(np.float32)
    # both solvers terminate at alpha_cumprod = 1 (sig2 = v)
    x_true = x_init * np.sqrt(v / (a_T * v + (1.0 - a_T)))

    def eps_exact(x, t):
        a = sched.alphas_cumprod[t]
        al, s2 = jnp.sqrt(a), 1.0 - a
        x0_hat = al * v * x / (a * v + s2)
        return (x - al * x0_hat) / jnp.sqrt(s2)

    x_ddim = jnp.asarray(x_init)
    for t in ts:
        x_ddim = ddim_step(sched, eps_exact(x_ddim, int(t)),
                           jnp.array(int(t)), x_ddim, steps)

    x_dpm = _run_dpm_chain(sched, jnp.asarray(x_init), steps,
                           lambda x, t, i: eps_exact(x, t))

    err_ddim = float(jnp.linalg.norm(x_ddim - x_true))
    err_dpm = float(jnp.linalg.norm(jnp.asarray(x_dpm) - x_true))
    assert err_dpm < 0.7 * err_ddim, (err_dpm, err_ddim)


def test_dpm_order_of_convergence(sched):
    """Halving the step size on the analytic Gaussian ODE: first-order
    DDIM must show error ratio ~2; DPM-Solver++(2M) must be clearly
    super-linear. Measured ratios on this exact setup (same seeds):
    DDIM 1.93-2.08 across 16->32/20->40/32->64/40->80; DPM++ 2.57-2.97.
    The clean asymptotic 4x is NOT reached at practical step counts — the
    lambda grid is highly non-uniform near t=0 (the largest-h steps
    dominate), the first step is first-order, and alphas live on a
    1000-entry discrete table — so the assertion is ratio > 2.45
    (separated from first order by >5 sigma of the observed spread) at
    two independent halvings, plus a 2x accuracy win over DDIM at equal
    budget."""
    v = 9.0

    def eps_exact(x, t):
        a = sched.alphas_cumprod[t]
        al, s2 = jnp.sqrt(a), 1.0 - a
        x0_hat = al * v * x / (a * v + s2)
        return (x - al * x0_hat) / jnp.sqrt(s2)

    def err(steps, kind):
        ts = ddim_timesteps(1000, steps)
        a_T = float(sched.alphas_cumprod[int(ts[0])])
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(256).astype(np.float64))
        x_true = np.asarray(x) * np.sqrt(v / (a_T * v + (1.0 - a_T)))
        if kind == 'ddim':
            for t in ts:
                x = ddim_step(sched, eps_exact(x, int(t)),
                              jnp.array(int(t)), x, steps)
        else:
            prev = jnp.zeros_like(x)
            for i, t in enumerate(ts):
                x, prev = dpm_pp_2m_step(sched, eps_exact(x, int(t)),
                                         jnp.array(int(t)), x, prev,
                                         jnp.array(i), steps)
        return float(jnp.linalg.norm(jnp.asarray(x) - x_true))

    e = {(k, n): err(n, k) for k in ('ddim', 'dpm')
         for n in (16, 20, 32, 40, 64, 80)}
    for a, b in ((20, 40), (32, 64)):
        r_ddim = e[('ddim', a)] / e[('ddim', b)]
        r_dpm = e[('dpm', a)] / e[('dpm', b)]
        assert 1.7 < r_ddim < 2.4, (a, b, r_ddim)       # first order
        assert r_dpm > 2.45, (a, b, r_dpm)              # super-linear
    for n in (20, 40, 80):
        assert e[('dpm', n)] < 0.55 * e[('ddim', n)], n


def test_dpm_step_jits_and_scans(sched):
    steps = 6
    ts = jnp.asarray(dpm_timesteps(1000, steps))
    x = jnp.ones((1, 2, 4, 4, 4))

    def body(carry, step):
        x, prev = carry
        i, t = step
        x, prev = dpm_pp_2m_step(sched, 0.1 * x, t, x, prev, i, steps)
        return (x, prev), None

    (out, _), _ = jax.jit(lambda x: jax.lax.scan(
        body, (x, jnp.zeros_like(x)),
        (jnp.arange(steps), ts)))(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
