"""SDXL-flavoured train step (pooled text + time-id micro-conditioning)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import unet2d
from sliders_tpu.training import optimizers as opt_factory
from sliders_tpu.training.text_slider import (
    SliderTrainState,
    make_text_slider_step,
    stack_prompt_pairs,
)

pytestmark = pytest.mark.slow


def test_xl_step_runs_and_learns():
    cfg = unet2d.TINY_XL
    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=8)
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, train_method="noxattn"
    )
    optimizer = opt_factory.make_optimizer(
        "adamw",
        opt_factory.make_lr_schedule("constant", 1e-2, 100),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=8, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, is_xl=True, donate=False,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)

    ks = jax.random.split(jax.random.key(3), 8)
    L, D, Dp = 7, cfg.cross_attention_dim, 16
    pair = {
        "target": jax.random.normal(ks[0], (L, D)),
        "positive": jax.random.normal(ks[1], (L, D)),
        "neutral": jax.random.normal(ks[2], (L, D)),
        "unconditional": jax.random.normal(ks[3], (L, D)),
        "pooled_target": jax.random.normal(ks[4], (Dp,)),
        "pooled_positive": jax.random.normal(ks[5], (Dp,)),
        "pooled_neutral": jax.random.normal(ks[6], (Dp,)),
        "pooled_unconditional": jax.random.normal(ks[7], (Dp,)),
        "time_ids": jnp.asarray([128.0, 128.0, 0.0, 0.0, 128.0, 128.0]),
        "guidance_signed": jnp.asarray(1.0),
    }
    pairs = stack_prompt_pairs([pair])

    zero = jnp.asarray(0, jnp.int32)
    losses = []
    for _ in range(30):
        state, metrics = step(state.replace(step=zero), unet_params, pairs)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
