"""Fused-epilogue Pallas resnet-conv A/B on the real chip (round 4).

Round-3's plain-kernel routing lost 5.5% e2e because the custom-call
boundary broke XLA's conv prologue/epilogue fusions (BASELINE.md round-3
rejected experiments). pallas_conv.fused_conv3x3 moves the GN-affine+SiLU
prologue and the bias+temb/residual epilogue INSIDE the kernel. This script
measures, honestly (chained inputs, final host fetch, best-of-N interleaved
samples — CLAUDE.md timing rules):

  phase 1 (micro): the full resnet-block composite (stats+GN+SiLU+conv+
    epilogue x2 + shortcut) at the three hot SD1.5 levels, XLA vs fused.
  phase 2 (e2e): the SD1.5 text-slider train step (bench.py protocol,
    chunk=10), impl=xla vs impl=fused, samples interleaved A/B/A/B.

Run detached:
  nohup python experiments/fused_conv_ab.py > /tmp/fused_ab.log 2>&1 &
  echo $! > /tmp/fused_ab.pid
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sliders_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed_chain(fn, x0, n_calls=8, samples=4):
    """Chain fn n_calls times (each input data-depends on the previous
    output), fetch a scalar, best of `samples`."""
    best = float("inf")
    x = x0
    # warmup (compile + first-sample inflation)
    for _ in range(2):
        x = fn(x)
    _ = float(jnp.sum(x[(0,) * x.ndim]))
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            x = fn(x)
        _ = np.asarray(x[(0,) * (x.ndim - 1)][:1])  # host fetch
        best = min(best, (time.perf_counter() - t0) / n_calls)
    return best * 1e3  # ms


def micro():
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic

    levels = [
        (2, 64, 64, 320, 320),
        (2, 32, 32, 640, 640),
        (2, 16, 16, 1280, 1280),
    ]
    for B, H, W, C, N in levels:
        k = jax.random.key(0)
        p = {
            "norm1": {"weight": jnp.ones((C,), jnp.float32),
                      "bias": jnp.zeros((C,), jnp.float32)},
            "conv1": {"weight": jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, N), jnp.bfloat16) * 0.02,
                      "bias": jnp.zeros((N,), jnp.bfloat16)},
            "time_emb_proj": {"weight": jax.random.normal(jax.random.fold_in(k, 2), (1280, N), jnp.bfloat16) * 0.02,
                              "bias": jnp.zeros((N,), jnp.bfloat16)},
            "norm2": {"weight": jnp.ones((N,), jnp.float32),
                      "bias": jnp.zeros((N,), jnp.float32)},
            "conv2": {"weight": jax.random.normal(jax.random.fold_in(k, 3), (3, 3, N, N), jnp.bfloat16) * 0.02,
                      "bias": jnp.zeros((N,), jnp.bfloat16)},
        }
        if C != N:
            p["conv_shortcut"] = {
                "weight": jax.random.normal(jax.random.fold_in(k, 4), (1, 1, C, N), jnp.bfloat16) * 0.02,
                "bias": jnp.zeros((N,), jnp.bfloat16),
            }
        emb = jax.random.normal(jax.random.fold_in(k, 5), (B, 1280), jnp.bfloat16)
        cfg = unet2d.SD15
        x0 = jax.random.normal(jax.random.fold_in(k, 6), (B, H, W, C), jnp.bfloat16)

        results = {}
        for impl in ARMS:
            basic.set_conv_impl(impl)

            @jax.jit
            def block(xx):
                out = unet2d._resnet(p, xx, emb, cfg, None, "blk")
                # keep the chain same-shape: fold N back to C via slice
                return out[..., :C] * 0.1 + xx * 0.9

            results[impl] = timed_chain(block, x0)
            basic.set_conv_impl("xla")
        print(json.dumps({
            "phase": "micro", "shape": [B, H, W, C, N],
            "xla_ms": round(results["xla"], 4),
            "fused_ms": round(results["fused"], 4),
            "speedup": round(results["xla"] / results["fused"], 3),
        }), flush=True)


def e2e():
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.text_slider import (
        SliderTrainState, make_text_slider_step, stack_prompt_pairs,
    )

    cfg = unet2d.SD15
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    chunk = 10
    ks = jax.random.split(jax.random.key(3), 4)
    pairs = stack_prompt_pairs([{
        "target": jax.random.normal(ks[0], (77, 768), jnp.bfloat16),
        "positive": jax.random.normal(ks[1], (77, 768), jnp.bfloat16),
        "neutral": jax.random.normal(ks[2], (77, 768), jnp.bfloat16),
        "unconditional": jax.random.normal(ks[3], (77, 768), jnp.bfloat16),
        "guidance_signed": jnp.asarray(4.0),
    }])

    steps, states = {}, {}
    for impl in ARMS:
        basic.set_conv_impl(impl)
        # fresh LoRA per arm: the step donates its state, so sharing one
        # tree across arms would reference deleted buffers
        lora = lnet.create_slider_network(
            jax.random.key(1), unet_params, rank=4, alpha=1.0,
            train_method="noxattn",
        )
        optimizer = opt_factory.make_optimizer(
            "adamw", opt_factory.make_lr_schedule("constant", 2e-4, 1000),
            trainable_mask=lnet.trainable_mask(lora),
        )
        step = make_text_slider_step(
            cfg, schedule, sampler, optimizer,
            max_denoising_steps=50, resolution=512, batch_size=1,
            compute_dtype=jnp.bfloat16, remat=False, donate=True, chunk=chunk,
        )
        state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
        log(f"compiling {impl} step...")
        t0 = time.time()
        state, metrics = step(state, unet_params, pairs)
        _ = np.asarray(metrics["loss"])
        log(f"{impl} compiled+warm in {time.time()-t0:.0f}s "
            f"loss={np.asarray(metrics['loss']).ravel()[-1]:.4f}")
        steps[impl], states[impl] = step, state
        basic.set_conv_impl("xla")

    # interleaved best-of-6 single chunked calls per impl
    best = {impl: float("inf") for impl in ARMS}
    for rnd in range(6):
        for impl in ARMS:
            t0 = time.perf_counter()
            states[impl], m = steps[impl](states[impl], unet_params, pairs)
            _ = np.asarray(m["loss"])
            dt = time.perf_counter() - t0
            best[impl] = min(best[impl], dt)
            log(f"round {rnd} {impl}: {chunk/dt:.4f} steps/s")
    print(json.dumps({
        "phase": "e2e_sd15_train",
        **{f"{impl}_steps_per_sec": round(chunk / best[impl], 4) for impl in ARMS},
        **{f"{impl}_speedup": round(best["xla"] / best[impl], 4)
           for impl in ARMS if impl != "xla"},
    }), flush=True)


ARMS = ("xla", "fused", "fused_ep")


if __name__ == "__main__":
    import sys

    if "--arms" in sys.argv:
        ARMS = tuple(sys.argv[sys.argv.index("--arms") + 1].split(","))
    log(f"backend: {jax.default_backend()} devices: {jax.devices()} arms: {ARMS}")
    if "--e2e-only" not in sys.argv:
        micro()
    e2e()
    log("done")
