"""SDXL text-slider chunk (tpu.steps_per_call) sweep — round-3 follow-up.

Round-3 found chunk=10 meets the north-star (1.733 steps/s) and chunk=20
failed to LOAD through the axon tunnel (TPU backend InvalidArgument,
"program too large"). The chunk is a `lax.scan` with a constant-size body,
so program size should NOT grow with chunk — this script re-tests 15 and 20
to find out whether 20's failure was transient tunnel flake or real, and
whether 15 buys headline margin over 10.

Protocol identical to bench.py main_sdxl (best-of-5 chained single-call
samples, final host fetch of the loss). Usage:
    python experiments/chunk_sweep_xl.py 15 20
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sliders_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def measure(chunk: int) -> float:
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.text_slider import (
        SliderTrainState,
        make_text_slider_step,
        stack_prompt_pairs,
    )

    cfg = unet2d.SDXL
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
        is_xl=True, chunk=chunk,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    ks = jax.random.split(jax.random.key(3), 8)
    pair = {}
    for i, role in enumerate(("target", "positive", "neutral", "unconditional")):
        pair[role] = jax.random.normal(ks[2 * i], (77, 2048), jnp.bfloat16)
        pair[f"pooled_{role}"] = jax.random.normal(ks[2 * i + 1], (1280,), jnp.bfloat16)
    pair["time_ids"] = jnp.asarray([512, 512, 0, 0, 512, 512], jnp.float32)
    pair["guidance_signed"] = jnp.asarray(4.0)
    pairs = stack_prompt_pairs([pair])

    t0 = time.perf_counter()
    state, metrics = step(state, unet_params, pairs)
    _ = np.asarray(metrics["loss"])
    print(f"chunk={chunk}: warmup call {time.perf_counter() - t0:.1f}s", flush=True)

    def run_once():
        nonlocal state, metrics
        state, metrics = step(state, unet_params, pairs)
        _ = np.asarray(metrics["loss"])

    best = float("inf")
    for s in range(5):
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        print(f"chunk={chunk}: sample {s} {dt:.3f}s = {chunk / dt:.3f} steps/s", flush=True)
        best = min(best, dt)
    return chunk / best


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [15]
    results = {}
    for c in chunks:
        try:
            results[str(c)] = round(measure(c), 4)
        except Exception as e:  # record tunnel/program-size failures, keep going
            results[str(c)] = f"FAILED: {type(e).__name__}: {str(e)[:300]}"
        print(json.dumps({"chunk_sweep_xl": results}), flush=True)
    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
