"""v-prediction and non-DDIM schedulers through the full train step and
sampler (SD2.x 768-v support, model_util.py:126 prediction_type switch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import unet2d
from sliders_tpu.pipelines import text2image as t2i
from sliders_tpu.training import optimizers as opt_factory
from sliders_tpu.training.text_slider import (
    SliderTrainState,
    make_text_slider_step,
    stack_prompt_pairs,
)

pytestmark = pytest.mark.slow


def _pairs(key, D):
    ks = jax.random.split(key, 4)
    return stack_prompt_pairs(
        [
            {
                "target": jax.random.normal(ks[0], (7, D)),
                "positive": jax.random.normal(ks[1], (7, D)),
                "neutral": jax.random.normal(ks[2], (7, D)),
                "unconditional": jax.random.normal(ks[3], (7, D)),
                "guidance_signed": jnp.asarray(1.0),
            }
        ]
    )


@pytest.mark.parametrize(
    "kind,pred",
    [("ddim", "v_prediction"), ("euler_a", "epsilon"), ("lms", "epsilon"),
     ("ddpm", "epsilon")],
)
def test_train_step_all_schedulers(kind, pred):
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule(prediction_type=pred)
    sampler = make_sampler(schedule, kind, 5)
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="noxattn")
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 1e-3, 10),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=5, resolution=64, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    state, metrics = step(state, params, _pairs(jax.random.key(3), cfg.cross_attention_dim))
    assert np.isfinite(float(metrics["loss"])), (kind, pred)


def test_vpred_sampling_finite():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule(prediction_type="v_prediction")
    sampler = make_sampler(schedule, "ddim", 4)
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    cond = jax.random.normal(jax.random.key(1), (1, 7, cfg.cross_attention_dim))
    uncond = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
    lats = t2i.initial_latents(jax.random.key(3), 1, 64, 64, sampler.init_noise_sigma)
    out = fn(params, lats, cond, uncond, None, jnp.asarray(0.0), jnp.asarray(750.0),
             jnp.asarray(7.5), jax.random.key(4))
    assert np.isfinite(np.asarray(out)).all()
