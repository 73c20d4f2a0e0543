"""Golden-value and closed-form tests for the schedulers.

The reference constructs diffusers schedulers with beta 0.00085->0.012
scaled_linear over 1000 steps (model_util.py:230-278); these tests pin our
tables and step math to independently computed closed forms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.diffusion.schedulers import (
    _leading_timesteps,
    _lms_coefficients,
    make_flowmatch_sampler,
    sigma_add_noise,
)


def test_beta_table_closed_form():
    sch = make_schedule()
    betas = np.asarray(sch.betas)
    assert betas.shape == (1000,)
    assert np.isclose(betas[0], 0.00085, rtol=1e-6)
    assert np.isclose(betas[-1], 0.012, rtol=1e-6)
    # scaled_linear: sqrt(beta) is linear
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    assert np.allclose(diffs, diffs[0], rtol=1e-5)
    # cumprod endpoint sanity
    acp = np.asarray(sch.alphas_cumprod)
    assert np.isclose(acp[0], 1 - 0.00085, rtol=1e-6)
    assert acp[-1] == pytest.approx(np.prod(1 - np.asarray(betas)), rel=1e-5)
    assert np.all(np.diff(acp) < 0)


def test_leading_timestep_grid_matches_reference_index_map():
    # DDIM "leading" grid for 50 steps: [980, 960, ..., 20, 0]
    ts = _leading_timesteps(1000, 50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    # training-loop index map (train_lora.py:209-213): with a 1000-step grid,
    # timesteps[int(t_to * 1000 / 50)] == 999 - 20*t_to
    ts1000 = _leading_timesteps(1000, 1000)
    for t_to in [1, 7, 25, 49]:
        assert ts1000[int(t_to * 1000 / 50)] == 999 - 20 * t_to


def test_ddim_roundtrip_exact_with_oracle_eps():
    """With the true noise as the model output, DDIM from x_T reaches x0
    exactly (set_alpha_to_one makes the final alpha 1)."""
    sch = make_schedule()
    s = make_sampler(sch, "ddim", num_steps=50)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)

    x = sch.add_noise(x0, eps, jnp.full((2,), 980))
    for i in range(50):
        x, _ = s.step(i, eps, x, {})
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_scan_equals_python_loop():
    sch = make_schedule()
    s = make_sampler(sch, "ddim", num_steps=10)
    x = jax.random.normal(jax.random.key(2), (1, 4, 8, 8)) * s.init_noise_sigma
    eps = jax.random.normal(jax.random.key(3), x.shape)

    x_loop = x
    for i in range(10):
        x_loop, _ = s.step(i, eps, x_loop, {})

    def body(carry, i):
        out, _ = s.step(i, eps, carry, {})
        return out, None

    x_scan, _ = jax.lax.scan(body, x, jnp.arange(10))
    np.testing.assert_allclose(
        np.asarray(x_scan), np.asarray(x_loop), rtol=1e-5, atol=1e-5
    )


def test_v_prediction_consistency():
    sch = make_schedule(prediction_type="v_prediction")
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (2, 4, 4, 4))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([100, 700])
    x_t = sch.add_noise(x0, noise, t)
    v = sch.velocity(x0, noise, t)
    eps_rec, x0_rec = sch.to_eps_x0(v, t, x_t)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_ddpm_final_step_recovers_x0():
    sch = make_schedule()
    s = make_sampler(sch, "ddpm", num_steps=50)
    # at the last step t=0, acp_prev=1 so mean = x0 and no noise is added
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    x_t = sch.add_noise(x0, eps, jnp.array([0]))
    out, _ = s.step(49, eps, x_t, {}, key=jax.random.key(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_lms_coefficients_partition_of_unity():
    """Lagrange bases sum to 1, so coefficients at each step must sum to
    sigma_{i+1} - sigma_i exactly; the first step is the Euler coefficient."""
    sch = make_schedule()
    s = make_sampler(sch, "lms", num_steps=20)
    sig = np.asarray(s.sigmas, np.float64)
    coeffs = np.asarray(s.lms_coeffs, np.float64)
    for i in range(20):
        assert coeffs[i].sum() == pytest.approx(sig[i + 1] - sig[i], rel=1e-4)
    # warmup row: pure Euler
    assert coeffs[0, 0] == pytest.approx(sig[1] - sig[0], rel=1e-5)
    assert np.all(coeffs[0, 1:] == 0)


def test_lms_first_step_equals_euler():
    sch = make_schedule()
    s = make_sampler(sch, "lms", num_steps=10)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4)) * s.init_noise_sigma
    eps = jax.random.normal(jax.random.key(1), x.shape)
    state = s.init_state(x)
    out, _ = s.step(0, eps, x, state)
    # Euler: x + (sigma1 - sigma0) * derivative, derivative == eps for eps-pred
    sig = np.asarray(s.sigmas)
    expected = np.asarray(x) + (sig[1] - sig[0]) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_lms_coefficients_exactness_vs_quadrature():
    from scipy import integrate

    sig = np.array([14.6, 11.0, 8.3, 6.1, 4.4, 3.0], np.float64)
    coeffs = _lms_coefficients(sig)
    # cross-check one interior entry against adaptive quadrature
    i, order = 4, 4

    for j in range(order):
        def f(s, j=j):
            prod = 1.0
            for k in range(order):
                if k == j:
                    continue
                prod *= (s - sig[i - k]) / (sig[i - j] - sig[i - k])
            return prod

        q, _ = integrate.quad(f, sig[i], sig[i + 1])
        assert coeffs[i, j] == pytest.approx(q, rel=1e-8)


def test_euler_a_sigma_decomposition_and_x0():
    sch = make_schedule()
    s = make_sampler(sch, "euler_a", num_steps=25)
    sig = np.asarray(s.sigmas, np.float64)
    assert sig[-1] == 0.0
    assert float(s.init_noise_sigma) == pytest.approx(sig.max())
    # with oracle eps at sigma-space x, the derivative recovers eps
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    x = sigma_add_noise(s, x0, eps, 0)
    deriv, x0_rec = s._sigma_eps_x0(0, eps, x)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(deriv), np.asarray(eps), atol=1e-4)


def test_scale_model_input():
    sch = make_schedule()
    lms = make_sampler(sch, "lms", num_steps=10)
    ddim = make_sampler(sch, "ddim", num_steps=10)
    x = jnp.ones((1, 4, 2, 2))
    np.testing.assert_allclose(np.asarray(ddim.scale_model_input(x, 0)), np.asarray(x))
    sig0 = float(lms.sigmas[0])
    np.testing.assert_allclose(
        np.asarray(lms.scale_model_input(x, 0)),
        np.asarray(x) / np.sqrt(sig0**2 + 1),
        rtol=1e-5,
    )


def test_flowmatch_sampler():
    s = make_flowmatch_sampler(num_steps=4, mu=0.0)
    # mu=0: time_shift is identity -> sigmas = linspace(1, 1/4, 4)
    np.testing.assert_allclose(
        np.asarray(s.sigmas)[:4], np.linspace(1.0, 0.25, 4), rtol=1e-5
    )
    # one Euler flow step with the true velocity (noise - x0) moves exactly
    # along the interpolation path
    x0 = jax.random.normal(jax.random.key(0), (1, 16, 8))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    x = s.add_noise(x0, noise, 0)  # == noise at sigma=1
    v = noise - x0  # dx/dsigma of (1-s)x0 + s*noise
    x1 = s.step(0, v, x)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(s.add_noise(x0, noise, 1)), atol=1e-5
    )


def test_ddim_inversion_roundtrip():
    sch = make_schedule()
    s = make_sampler(sch, "ddim", num_steps=50)
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    # ddim_inverse_step(i) is the exact inverse of step(i): invert a clean
    # latent up to x_T (i = 49..0), then denoise back down (i = 0..49)
    x = x0
    for i in range(49, -1, -1):
        x = s.ddim_inverse_step(i, eps, x)
    for i in range(50):
        x, _ = s.step(i, eps, x, {})
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)
