"""DDIM inversion + null-text optimization tests (tiny UNet)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.models import unet2d
from sliders_tpu.pipelines import inversion as inv

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 5)
    cond = jax.random.normal(jax.random.key(1), (1, 7, cfg.cross_attention_dim)) * 0.2
    uncond = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim)) * 0.2
    clean = jax.random.normal(jax.random.key(3), (1, 8, 8, 4)) * 0.3
    return cfg, params, sampler, cond, uncond, clean


def test_inversion_trajectory_shape(setup):
    cfg, params, sampler, cond, uncond, clean = setup
    invert = inv.make_ddim_inversion_fn(cfg, sampler)
    traj = invert(params, clean, cond)
    assert traj.shape == (6, 1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(clean), atol=1e-5)
    # noise level grows toward x_T
    assert float(jnp.abs(traj[0]).mean()) > float(jnp.abs(traj[-1]).mean())


def test_inversion_exact_consistency_with_state_free_model(setup):
    """With an eps prediction that doesn't depend on x (zero UNet), DDIM
    inversion is the exact inverse of sampling — re-sampling from the
    inverted x_T reconstructs the clean latent to float precision. (With a
    random UNet the first-order inversion error is unbounded, so exactness
    is only testable against a state-free oracle.)"""
    cfg, params, sampler, cond, uncond, clean = setup
    zero_params = jax.tree.map(jnp.zeros_like, params)
    invert = inv.make_ddim_inversion_fn(cfg, sampler)
    traj = invert(zero_params, clean, cond)
    x = traj[0]
    for i in range(5):
        eps = unet2d.apply(zero_params, cfg, x, sampler.timesteps[i], cond)
        x, _ = sampler.step(i, eps, x, {})
    np.testing.assert_allclose(np.asarray(x), np.asarray(clean), atol=1e-4)


def test_null_text_optimization_improves_cfg_reconstruction(setup):
    cfg, params, sampler, cond, uncond, clean = setup
    invert = inv.make_ddim_inversion_fn(cfg, sampler)
    traj = invert(params, clean, cond)

    g = 7.5
    null_opt = inv.make_null_text_optimizer(
        cfg, sampler, guidance_scale=g, num_inner_steps=8
    )
    uncond_opt = null_opt(params, traj, cond, uncond)
    assert uncond_opt.shape == (5,) + uncond.shape

    edit_fn = inv.make_edit_sampling_fn(cfg, sampler, guidance_scale=g)
    zero = jnp.asarray(0.0)
    rec_opt = edit_fn(params, traj[0], cond, uncond_opt, None, zero, zero)
    rec_raw = edit_fn(
        params, traj[0], cond, jnp.tile(uncond[None], (5, 1, 1, 1)), None, zero, zero
    )
    err_opt = float(jnp.mean((rec_opt - clean) ** 2))
    err_raw = float(jnp.mean((rec_raw - clean) ** 2))
    # the optimization's whole purpose: CFG re-sampling tracks the inversion
    # trajectory much better with the optimized uncond embeddings
    assert err_opt < err_raw, (err_opt, err_raw)


def test_null_text_matches_eager_notebook_loop(setup):
    """The scanned while_loop optimizer == an eager transcription of the
    notebook's null_optimization (demo_image_editing.ipynb cell 3): per
    timestep, hoisted cond eps, Adam(lr 1e-2*(1-i/100)) on uncond, break
    AFTER applying the update that crossed eps + i*2e-5."""
    import optax

    cfg, params, sampler, cond, uncond, clean = setup
    invert = inv.make_ddim_inversion_fn(cfg, sampler)
    traj = invert(params, clean, cond)
    g, n_inner, eps0 = 7.5, 6, 1e-5

    # eager reference (plain Python control flow)
    x = traj[0]
    want = []
    for i in range(5):
        lr = 1e-2 * (1.0 - i / 100.0)
        tx = optax.adam(lr)
        thr = eps0 + i * 2e-5
        eps_c = unet2d.apply(params, cfg, x, sampler.timesteps[i], cond)

        def loss_fn(u, x=x, i=i, eps_c=eps_c):
            eps_u = unet2d.apply(params, cfg, x, sampler.timesteps[i], u)
            eps = eps_u + g * (eps_c - eps_u)
            x_prev, _ = sampler.step(i, eps, x, {})
            d = (x_prev - traj[i + 1]).astype(jnp.float32)
            return jnp.mean(d * d)

        u, opt = uncond, tx.init(uncond)
        for _ in range(n_inner):
            loss, grad = jax.value_and_grad(loss_fn)(u)
            upd, opt = tx.update(grad, opt, u)
            u = optax.apply_updates(u, upd)
            if float(loss) < thr:
                break
        want.append(u)
        eps_u = unet2d.apply(params, cfg, x, sampler.timesteps[i], u)
        x, _ = sampler.step(i, eps_u + g * (eps_c - eps_u), x, {})

    null_opt = inv.make_null_text_optimizer(
        cfg, sampler, guidance_scale=g, num_inner_steps=n_inner, epsilon=eps0
    )
    got = null_opt(params, traj, cond, uncond)
    # atol 1e-3: eager-vs-jitted fusion drift amplified through the Adam
    # chain (measured max 4.6e-4); a single wrong/extra Adam step would move
    # elements by ~lr = 1e-2, so this still pins the break semantics
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.stack(want)), atol=1e-3
    )


def test_edit_with_slider_gating(setup):
    cfg, params, sampler, cond, uncond, clean = setup
    from sliders_tpu.lora import network as lnet

    lora = lnet.create_slider_network(jax.random.key(5), params, rank=2, train_method="noxattn")
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    invert = inv.make_ddim_inversion_fn(cfg, sampler)
    traj = invert(params, clean, cond)
    edit_fn = inv.make_edit_sampling_fn(cfg, sampler, guidance_scale=7.5)
    u5 = jnp.tile(uncond[None], (5, 1, 1, 1))
    base = edit_fn(params, traj[0], cond, u5, lora, jnp.asarray(0.0), jnp.asarray(500.0))
    act = edit_fn(params, traj[0], cond, u5, lora, jnp.asarray(3.0), jnp.asarray(500.0))
    off = edit_fn(params, traj[0], cond, u5, lora, jnp.asarray(3.0), jnp.asarray(-1.0))
    np.testing.assert_allclose(np.asarray(base), np.asarray(off), atol=1e-5)
    assert np.abs(np.asarray(act) - np.asarray(base)).max() > 1e-4

    # batched scale sweep (vector scales, per-sample multipliers) matches
    # the per-scale merged-delta calls row for row
    scales = (0.0, 3.0)
    batched = edit_fn(
        params,
        jnp.tile(traj[0], (2, 1, 1, 1)),
        jnp.tile(cond, (2, 1, 1)),
        jnp.tile(u5, (1, 2, 1, 1)),
        lora,
        jnp.asarray(scales),
        jnp.asarray(500.0),
    )
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(base[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(act[0]), atol=2e-4)
