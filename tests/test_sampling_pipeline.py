"""Sampling pipeline tests: slider gating, CFG, few-step, XL encoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import clip_text, unet2d, vae
from sliders_tpu.pipelines import text2image as t2i
from sliders_tpu.pipelines.encoding import encode_prompts_xl


@pytest.fixture(scope="module")
def setup():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=6)
    cond = jax.random.normal(jax.random.key(1), (1, 7, cfg.cross_attention_dim))
    uncond = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
    lora = lnet.create_slider_network(
        jax.random.key(3), params, rank=4, train_method="noxattn"
    )
    # nonzero up so the slider actually does something
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    lats = t2i.initial_latents(jax.random.key(4), 1, 128, 128, sampler.init_noise_sigma)
    return cfg, params, sampler, cond, uncond, lora, lats


def _run(setup_t, scale, start_noise, lora=None, g=7.5):
    cfg, params, sampler, cond, uncond, lora_w, lats = setup_t
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    return fn(
        params, lats, cond, uncond,
        lora if lora is not None else lora_w,
        jnp.asarray(scale), jnp.asarray(start_noise), jnp.asarray(g),
        jax.random.key(0),
    )


def test_output_shape_and_finite(setup):
    out = _run(setup, 1.0, 750.0)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_slider_gating(setup):
    """start_noise=-1 -> slider never active (t >= 0 > -1 gates every step),
    so any scale must reproduce the no-slider output exactly; full window
    must differ (generate_images_xl.py:325-328 semantics)."""
    base = _run(setup, 0.0, 1000.0)
    gated_off = _run(setup, 5.0, -1.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(gated_off), atol=1e-5)
    active = _run(setup, 5.0, 1000.0)
    assert np.abs(np.asarray(active) - np.asarray(base)).max() > 1e-3
    # partial window lies strictly between (sanity: differs from both)
    partial = _run(setup, 5.0, 500.0)
    assert np.abs(np.asarray(partial) - np.asarray(base)).max() > 1e-4
    assert np.abs(np.asarray(partial) - np.asarray(active)).max() > 1e-4


def test_scale_zero_is_base(setup):
    base = _run(setup, 0.0, 750.0)
    cfg, params, sampler, cond, uncond, _, lats = setup
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    no_lora = fn(
        params, lats, cond, uncond, None,
        jnp.asarray(0.0), jnp.asarray(750.0), jnp.asarray(7.5), jax.random.key(0),
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(no_lora), atol=1e-5)


def test_turbo_no_cfg(setup):
    """Few-step sampling without CFG doubling (SDXL-Turbo protocol)."""
    cfg, params, _, cond, uncond, lora, _ = setup
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=3)
    fn = t2i.make_sampling_fn(cfg, sampler, use_cfg=False, compute_dtype=jnp.float32)
    lats = t2i.initial_latents(jax.random.key(4), 1, 128, 128, sampler.init_noise_sigma)
    out = fn(
        params, lats, cond, uncond, lora,
        jnp.asarray(2.0), jnp.asarray(700.0), jnp.asarray(1.0), jax.random.key(0),
    )
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_lms_and_euler_a_sampling(setup):
    cfg, params, _, cond, uncond, lora, _ = setup
    schedule = make_schedule()
    for kind in ("lms", "euler_a"):
        sampler = make_sampler(schedule, kind, num_steps=5)
        fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
        lats = t2i.initial_latents(jax.random.key(4), 1, 128, 128, sampler.init_noise_sigma)
        out = fn(
            params, lats, cond, uncond, lora,
            jnp.asarray(1.0), jnp.asarray(750.0), jnp.asarray(7.5), jax.random.key(0),
        )
        assert np.isfinite(np.asarray(out)).all(), kind


def test_decode_images():
    cfg = vae.TINY
    params = vae.init_params(jax.random.key(0), cfg)
    lats = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    imgs = t2i.decode_images(params, cfg, lats)
    assert imgs.shape == (1, 16, 16, 3)
    assert imgs.dtype == jnp.uint8


def test_add_time_ids():
    ids = t2i.get_add_time_ids(1024, 1024)
    np.testing.assert_array_equal(
        np.asarray(ids), [[1024, 1024, 0, 0, 1024, 1024]]
    )
    dyn = t2i.get_add_time_ids(512, 512, dynamic_crops=True, key=jax.random.key(0))
    d = np.asarray(dyn)[0]
    assert d[0] >= 512 and d[1] >= 512 and 0 <= d[2] <= d[0] - 512 and d[4] == 512


def test_encode_prompts_xl_contract():
    """Penultimate states concat + pooled from encoder 2 (train_util.py:92-133)."""
    cfg1 = clip_text.TINY
    cfg2 = clip_text.ClipTextConfig(
        vocab_size=100, hidden_size=48, num_layers=2, num_heads=2,
        intermediate_size=96, max_positions=16, eos_token_id=99, projection_dim=40,
    )
    p1 = clip_text.init_params(jax.random.key(0), cfg1)
    p2 = clip_text.init_params(jax.random.key(1), cfg2)

    class FakeTok:
        def __init__(self, pad):
            self.pad = pad

        def __call__(self, prompts):
            ids = np.full((len(prompts), 16), self.pad, np.int32)
            for i, p in enumerate(prompts):
                ids[i, 0] = 98
                n = min(len(p.split()), 13)
                ids[i, 1 : 1 + n] = 5
                ids[i, 1 + n] = 99
            return ids

    text, pooled = encode_prompts_xl(
        [FakeTok(99), FakeTok(0)], [p1, p2], [cfg1, cfg2], ["a photo", "old person"]
    )
    assert text.shape == (2, 16, 32 + 48)
    assert pooled.shape == (2, 40)  # projection dim of encoder 2
