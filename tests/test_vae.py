"""AutoencoderKL structure + behavior tests."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.models import vae


def test_param_count_golden():
    shapes = jax.eval_shape(lambda k: vae.init_params(k, vae.SD_VAE), jax.random.key(0))
    total = sum(math.prod(l.shape) for l in jax.tree.leaves(shapes))
    assert total == 83_653_863  # diffusers AutoencoderKL (SD / SDXL VAE)


def test_encode_decode_shapes():
    cfg = vae.TINY
    params = vae.init_params(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    mean, logvar = vae.encode(params, cfg, img)
    # two blocks -> one downsample -> 16x16 latents
    assert mean.shape == (2, 16, 16, 4) and logvar.shape == (2, 16, 16, 4)
    z = vae.sample_latents(mean, logvar, jax.random.key(2))
    out = vae.decode(params, cfg, z)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_posterior_sampling_stats():
    mean = jnp.full((1, 4, 4, 4), 3.0)
    logvar = jnp.full((1, 4, 4, 4), jnp.log(0.25))
    samples = jnp.stack(
        [vae.sample_latents(mean, logvar, jax.random.key(i)) for i in range(256)]
    )
    assert abs(float(samples.mean()) - 3.0) < 0.05
    assert abs(float(samples.std()) - 0.5) < 0.05


def test_sd_vs_sdxl_scaling_factors():
    # the constants the reference multiplies latents by
    assert vae.SD_VAE.scaling_factor == 0.18215
    assert vae.SDXL_VAE.scaling_factor == 0.13025
