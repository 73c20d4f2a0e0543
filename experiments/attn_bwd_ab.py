"""Pallas attention-BACKWARD routing A/B at d=64/80 (round 4).

The custom backward kernel (ops/pallas_attention.py) routes only d >=
BWD_MIN_D=96 on hardware: the round-2 A/B measured d=128 FLUX +5% and d=40
SD1.5 neutral, and the gap between them was never probed. SDXL's entire
attention stack is d=64 (640/10, 1280/20 heads) with L=1024 self-attns at
the 512px training protocol, and SD1.5 has d=80 L=1024 self-attns at its
640-ch level — both above the measured-neutral d=40, both taking the XLA
VJP today (it materializes three (L, L) f32 probability tensors in HBM per
layer in the grad pass).

Honest protocol (CLAUDE.md timing rules): chained chunk=10 train-step calls
with a final host fetch, interleaved A/B rounds, best-of-6.

Run detached (serialize with other TPU jobs):
  nohup python experiments/attn_bwd_ab.py > /tmp/attn_bwd_ab.log 2>&1 &
  echo $! > /tmp/attn_bwd_ab.pid
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sliders_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(is_xl):
    """Mirror bench.py's main_sdxl/e2e protocol exactly (chunk=10)."""
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.text_slider import (
        SliderTrainState, make_text_slider_step, stack_prompt_pairs,
    )

    cfg = unet2d.SDXL if is_xl else unet2d.SD15
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 2e-4, 1000),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=50, resolution=512, batch_size=1,
        compute_dtype=jnp.bfloat16, remat=False, donate=True,
        is_xl=is_xl, chunk=10,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    ks = jax.random.split(jax.random.key(3), 8)
    pair = {}
    width = 2048 if is_xl else 768
    for i, role in enumerate(("target", "positive", "neutral", "unconditional")):
        pair[role] = jax.random.normal(ks[2 * i], (77, width), jnp.bfloat16)
        if is_xl:
            pair[f"pooled_{role}"] = jax.random.normal(
                ks[2 * i + 1], (1280,), jnp.bfloat16
            )
    if is_xl:
        pair["time_ids"] = jnp.asarray([512, 512, 0, 0, 512, 512], jnp.float32)
    pair["guidance_signed"] = jnp.asarray(4.0)
    pairs = stack_prompt_pairs([pair])
    return step, state, unet_params, pairs


def e2e(name, is_xl, arms):
    from sliders_tpu.ops import pallas_attention as pa

    default_min_d = pa.BWD_MIN_D
    steps, states, extras = {}, {}, {}
    for arm, min_d in arms.items():
        pa.BWD_MIN_D = min_d
        step, state, unet_params, pairs = build(is_xl)
        log(f"[{name}] compiling arm {arm} (BWD_MIN_D={min_d})...")
        t0 = time.time()
        state, metrics = step(state, unet_params, pairs)
        _ = np.asarray(metrics["loss"])
        log(f"[{name}] {arm} compiled+warm in {time.time()-t0:.0f}s "
            f"loss={np.asarray(metrics['loss']).ravel()[-1]:.4f}")
        steps[arm], states[arm], extras[arm] = step, state, (unet_params, pairs)
        pa.BWD_MIN_D = default_min_d

    best = {arm: float("inf") for arm in arms}
    for rnd in range(6):
        for arm in arms:
            unet_params, pairs = extras[arm]
            t0 = time.perf_counter()
            states[arm], m = steps[arm](states[arm], unet_params, pairs)
            _ = np.asarray(m["loss"])
            dt = time.perf_counter() - t0
            best[arm] = min(best[arm], dt)
            log(f"[{name}] round {rnd} {arm}: {10/dt:.4f} steps/s")
    ref = next(iter(arms))
    print(json.dumps({
        "phase": name,
        **{f"{arm}_steps_per_sec": round(10 / best[arm], 4) for arm in arms},
        **{f"{arm}_speedup_vs_{ref}": round(best[ref] / best[arm], 4)
           for arm in arms if arm != ref},
    }), flush=True)


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    # SDXL first: the north-star metric; all self-attn is d=64
    e2e("e2e_sdxl_train", True, {"bwd96": 96, "bwd64": 64})
    # SD1.5: enables only the d=80 L=1024 level (d=40 stays XLA per round-2)
    e2e("e2e_sd15_train", False, {"bwd96": 96, "bwd80": 80})
    log("done")
