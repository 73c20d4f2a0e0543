"""Headline benchmark: SD1.5 text-slider training steps/sec on one chip.

Runs the full jitted slider train step (partial denoise at guidance 3 +
batched frozen eps passes + LoRA grad step — the exact reference per-iter
protocol, train_lora.py:155-309) on the SD1.5-sized UNet at 512px, rank-4
noxattn LoRA, bf16, DDIM 50-step grid. Random weights are compute-equivalent
to converted ones.

Prints ONE JSON line {metric, value, unit, vs_baseline}.
vs_baseline divides by 0.5 steps/sec — our estimate of the reference's
single-A100 throughput for the same protocol (the reference publishes no
numbers, BASELINE.md; 1000 iterations is commonly a ~30-35 min A100 run).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the SD1.5 train-step compile costs minutes
# through the remote-compile tunnel; cache it across bench runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sliders_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

REFERENCE_STEPS_PER_SEC_ESTIMATE = 0.5  # single A100, see BASELINE.md
WARMUP = 2
ITERS = 10


def main():
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.text_slider import (
        SliderTrainState,
        make_text_slider_step,
        stack_prompt_pairs,
    )

    cfg = unet2d.SD15
    # one compiled program for the whole init: the per-array dispatch cost
    # dominates through remote-device tunnels
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    optimizer = opt_factory.make_optimizer(
        "adamw",
        opt_factory.make_lr_schedule("constant", 2e-4, 1000),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=50, resolution=512, batch_size=1,
        compute_dtype=jnp.bfloat16, remat=False, donate=True,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)

    ks = jax.random.split(jax.random.key(3), 4)
    pairs = stack_prompt_pairs(
        [
            {
                "target": jax.random.normal(ks[0], (77, 768), jnp.bfloat16),
                "positive": jax.random.normal(ks[1], (77, 768), jnp.bfloat16),
                "neutral": jax.random.normal(ks[2], (77, 768), jnp.bfloat16),
                "unconditional": jax.random.normal(ks[3], (77, 768), jnp.bfloat16),
                "guidance_signed": jnp.asarray(4.0),
            }
        ]
    )

    for _ in range(WARMUP):
        state, metrics = step(state, unet_params, pairs)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, unet_params, pairs)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    value = ITERS / dt
    print(
        json.dumps(
            {
                "metric": "sd15_text_slider_train_steps_per_sec_chip",
                "value": round(value, 4),
                "unit": "steps/sec",
                "vs_baseline": round(value / REFERENCE_STEPS_PER_SEC_ESTIMATE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
