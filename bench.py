"""Headline benchmark: SD1.5 text-slider training steps/sec on one chip.

Runs the full jitted slider train step (partial denoise at guidance 3 +
batched frozen eps passes + LoRA grad step — the exact reference per-iter
protocol, train_lora.py:155-309) on the SD1.5-sized UNet at 512px, rank-4
noxattn LoRA, bf16, DDIM 50-step grid. Random weights are compute-equivalent
to converted ones.

Prints ONE JSON line {metric, value, unit, vs_baseline, ...}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is framed
against the repo's own north-star instead of an invented GPU estimate
(VERDICT.md r2 item 7): a full reference run is 1000 iterations and the
BASELINE.json target is <10 minutes wall-clock for it, so
  projected_minutes_per_1000_iters = 1000 / steps_per_sec / 60
  vs_baseline = 10 / projected_minutes   (>= 1.0 means target met)
Both extra fields ride in the same JSON line, self-describing.

`--model flux` benches a layer-reduced FLUX slider train step instead
(4 double + 8 single MMDiT blocks at full 3072 width / 24x128 heads — the
full 19+38 model does not fit one v5e-1's 16 GB HBM; the per-layer compute
is identical, so scale by layer count for full-model estimates).

Timing uses chained steps ending in a HOST FETCH of the final loss —
`block_until_ready` does not actually block through the axon tunnel
(BASELINE.md round-2 methodology).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the SD1.5 train-step compile costs minutes
# through the remote-compile tunnel; cache it across bench runs.
# PER-PLATFORM dirs: XLA:CPU entries embed host AOT machine features, so a
# cache written on one VM loads with wrong codegen on another (observed:
# "+prefer-no-scatter not supported on the host machine" + ~1e-6 numeric
# drift). TPU entries are compiled by the remote server and stay portable;
# CPU smokes must never share their dir.
if jax.default_backend() != "cpu":
    _cache_dir = "/tmp/jax_cache_sliders_bench"
else:
    # fingerprint the host CPU: /tmp can outlive the VM, and another VM's
    # AOT entries must miss rather than load with mismatched codegen
    import hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next(
                (ln for ln in _f if ln.startswith("flags")), "unknown"
            )
    except OSError:
        _flags = "unknown"
    _fp = hashlib.sha1(_flags.encode()).hexdigest()[:10]
    _cache_dir = f"/tmp/jax_cache_sliders_bench_cpu_{_fp}"
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

NORTH_STAR_MINUTES = 10.0  # BASELINE.json: <10 min per 1000-iter run
WARMUP = 2
ITERS = 10


SAMPLES = 3


def best_sample(run_once, samples: int = SAMPLES) -> float:
    """BASELINE.md round-2 timing rule: the FIRST post-warmup sample is
    10-40x inflated (program reload through the tunnel) and host contention
    pollutes individual samples, so every metric times >= SAMPLES chained
    samples and reports the best. Round-2's single-sample protocol
    under-reported (SDXL 1.067 single-sample vs 1.40 best-of-3, same
    program, round-3)."""
    import time as _time

    best = float("inf")
    for _ in range(samples):
        t0 = _time.perf_counter()
        run_once()
        best = min(best, _time.perf_counter() - t0)
    return best


# TPU v5e peak: 197 TFLOP/s bf16 per chip (public spec) — the MFU
# denominator for the analytic utilization estimate below
PEAK_BF16_FLOPS = 197e12


def steps_line(metric: str, steps_per_sec: float, flops_per_iter=None) -> str:
    """One self-describing JSON line for a train-step throughput metric.
    `flops_per_iter` (analytic, see train_iter_flops) adds an MFU estimate;
    every line carries the margin to the BASELINE.json 10-min north star."""
    projected = 1000.0 / steps_per_sec / 60.0
    out = {
        "metric": metric,
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(NORTH_STAR_MINUTES / projected, 4),
        "projected_minutes_per_1000_iters": round(projected, 2),
        "north_star_minutes": NORTH_STAR_MINUTES,
        "north_star_margin_pct": round(
            (NORTH_STAR_MINUTES - projected) / NORTH_STAR_MINUTES * 100, 1
        ),
    }
    if flops_per_iter:
        out["mfu_pct_analytic"] = round(
            flops_per_iter * steps_per_sec / PEAK_BF16_FLOPS * 100, 1
        )
        out["flops_per_iter_analytic_tflop"] = round(flops_per_iter / 1e12, 2)
    return json.dumps(out)


def train_iter_flops(cfg, *, resolution=512, batch=1, is_xl=False) -> float:
    """Analytic FLOPs of ONE text-slider train iteration, from XLA's HLO
    cost analysis of a single UNet forward (client-side lowering — no
    remote compile). Accounting (training/text_slider.py structure):

      - partial denoise: E[t_to] = 25 CFG-doubled forwards (2B rows),
      - frozen eps: one 3B-row forward,
      - grad pass: forward + activation-grad backward over B rows; the
        weight-grad GEMMs touch only the LoRA factors (frozen base), so
        bwd ~ 1x fwd -> ~2 B-row-forward equivalents.

    Total ~ (2*25 + 3 + 2) * B = 55x the per-row forward. Approximate by
    design (t_to is sampled; elementwise flops ignored) — good to a few
    percent for an MFU estimate, not a benchmark number."""
    from sliders_tpu.models import unet2d

    h = w = resolution // 8
    D = 2048 if is_xl else 768
    params_shape = jax.eval_shape(
        lambda: unet2d.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    )
    x = jax.ShapeDtypeStruct((1, h, w, cfg.in_channels), jnp.bfloat16)
    ehs = jax.ShapeDtypeStruct((1, 77, D), jnp.bfloat16)
    added = None
    if is_xl:
        added = {
            "text_embeds": jax.ShapeDtypeStruct((1, 1280), jnp.bfloat16),
            "time_ids": jax.ShapeDtypeStruct((1, 6), jnp.float32),
        }

    def fwd(p, x, e, a):
        return unet2d.apply(
            p, cfg, x, jnp.zeros((x.shape[0],), jnp.float32), e,
            added_cond=a,
        )

    # Lowered cost_analysis() returns None in this jax version (and always
    # did through the axon tunnel); the COMPILED executable's analysis is
    # reliable. Compile on the CPU backend (flop count is backend-agnostic)
    # — minutes cold on this 1-core host, then served from the persistent
    # compile cache. None (no CPU backend / analysis absent) just drops the
    # MFU field from the bench line.
    def _flops(ca):
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        return float(ca["flops"]) if ca and ca.get("flops") else None

    def _debug(where):
        if os.environ.get("BENCH_DEBUG"):
            import traceback

            print(f"train_iter_flops: {where} failed", file=sys.stderr)
            traceback.print_exc()

    # Pin XLA attention for the WHOLE probe: (a) it carries the softmax
    # matmul flops we want counted (the Pallas custom call reports none),
    # (b) the trace is shared between the two lowering attempts below, so a
    # Pallas op baked in by the first would break the CPU fallback.
    from sliders_tpu.ops import attention as attn_ops

    prev = attn_ops._DEFAULT_IMPL
    attn_ops.set_default_attention_impl("xla")
    f1 = None
    try:
        try:  # cheap: no compile. Never compile on the default (remote) backend.
            f1 = _flops(
                jax.jit(fwd).lower(params_shape, x, ehs, added).cost_analysis()
            )
        except Exception:
            _debug("default-backend lowering")
        if f1 is None:
            try:
                lowered = jax.jit(fwd, backend="cpu").lower(
                    params_shape, x, ehs, added
                )
                f1 = _flops(lowered.cost_analysis())
                if f1 is None:
                    f1 = _flops(lowered.compile().cost_analysis())
            except Exception:
                _debug("cpu fallback")
    finally:
        attn_ops.set_default_attention_impl(prev)
    if f1 is None:
        return None
    return f1 * batch * (2 * 25 + 3 + 2)


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
    # chunk: scan 10 reference iterations per dispatch (tpu.steps_per_call);
    # amortizes the ~25 ms/dispatch tunnel overhead (BASELINE.md round-2)
    chunk = 10
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=50, resolution=512, batch_size=1,
        compute_dtype=jnp.bfloat16, remat=False, donate=True,
        chunk=chunk,
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

    import numpy as np

    state, metrics = step(state, unet_params, pairs)  # compile + warm
    _ = np.asarray(metrics["loss"])  # host fetch = true completion

    # one 10-step chained call per sample (see main_sdxl): dispatch is
    # already amortized <1% by the chunk scan; single-call best-of-5 gives
    # the min a clean shot between host-contention spikes. chunk sweep:
    # 10 -> 1.93, 20 -> 1.79 steps/s (round-3) — 10 is the sweet spot here.
    calls = 1

    def run_once():
        nonlocal state, metrics
        for _ in range(calls):
            state, metrics = step(state, unet_params, pairs)
        _ = np.asarray(metrics["loss"])  # last chunk's losses depend on all steps

    value = calls * chunk / best_sample(run_once, samples=5)
    print(steps_line(
        "sd15_text_slider_train_steps_per_sec_chip", value,
        flops_per_iter=train_iter_flops(cfg),
    ))


def main_fleet(n_sliders: int = None):
    """Fleet training (training/fleet.py): N independent SD1.5 sliders in
    ONE jitted step (per-row stacked LoRA). Times the SOLO step first
    (program shared with the default sd15 mode, so it is compile-cached),
    then the fleet step, and reports AGGREGATE slider-steps/sec with the
    honest speedup vs training the N sliders sequentially.
    BENCH_FLEET_K overrides the fleet size (default 4)."""
    import os

    import numpy as np

    if n_sliders is None:
        n_sliders = int(os.environ.get("BENCH_FLEET_K", "4"))

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.fleet import (
        make_fleet_text_step,
        stack_fleet,
        stack_fleet_pairs,
    )
    from sliders_tpu.training.text_slider import (
        SliderTrainState,
        make_text_slider_step,
        stack_prompt_pairs,
    )

    cfg = unet2d.SD15
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    loras = [
        lnet.create_slider_network(
            jax.random.fold_in(jax.random.key(1), r), unet_params,
            rank=4, alpha=1.0, train_method="noxattn",
        )
        for r in range(n_sliders)
    ]
    lr = opt_factory.make_lr_schedule("constant", 2e-4, 1000)
    chunk = 10

    ks = jax.random.split(jax.random.key(3), 4)
    pair = {
        "target": jax.random.normal(ks[0], (77, 768), jnp.bfloat16),
        "positive": jax.random.normal(ks[1], (77, 768), jnp.bfloat16),
        "neutral": jax.random.normal(ks[2], (77, 768), jnp.bfloat16),
        "unconditional": jax.random.normal(ks[3], (77, 768), jnp.bfloat16),
        "guidance_signed": jnp.asarray(4.0),
    }
    pairs_solo = stack_prompt_pairs([pair])

    # stack BEFORE the solo phase: the solo step donates its state, which
    # deletes loras[0]'s buffers once the first call runs (two independent
    # stacks: each mode's donated state consumes one)
    fleet_tree = stack_fleet(loras)
    fleet_tree_shared = stack_fleet(loras)
    fleet_tree_strat = stack_fleet(loras)

    # ---- solo reference rate (same program as the sd15 mode) ----
    solo_opt = opt_factory.make_optimizer(
        "adamw", lr, trainable_mask=lnet.trainable_mask(loras[0])
    )
    solo_step = make_text_slider_step(
        cfg, schedule, sampler, solo_opt,
        max_denoising_steps=50, resolution=512, batch_size=1,
        compute_dtype=jnp.bfloat16, remat=False, donate=True, chunk=chunk,
    )
    state = SliderTrainState.create(jax.random.key(2), loras[0], solo_opt)
    state, metrics = solo_step(state, unet_params, pairs_solo)
    _ = np.asarray(metrics["loss"])

    def solo_once():
        nonlocal state, metrics
        state, metrics = solo_step(state, unet_params, pairs_solo)
        _ = np.asarray(metrics["loss"])

    solo_rate = chunk / best_sample(solo_once, samples=5)

    # ---- fleet rate ----
    fleet_opt = opt_factory.make_optimizer(
        "adamw", lr, trainable_mask=lnet.trainable_mask(fleet_tree)
    )
    fleet_step = make_fleet_text_step(
        cfg, schedule, sampler, fleet_opt,
        n_sliders=n_sliders, max_denoising_steps=50, resolution=512,
        batch_size=1, compute_dtype=jnp.bfloat16, remat=False, donate=True,
        chunk=chunk,
    )
    fstate = SliderTrainState.create(jax.random.key(2), fleet_tree, fleet_opt)
    fpairs = stack_fleet_pairs([pairs_solo] * n_sliders)
    fstate, fmetrics = fleet_step(fstate, unet_params, fpairs)
    _ = np.asarray(fmetrics["loss"])

    def fleet_once():
        nonlocal fstate, fmetrics
        fstate, fmetrics = fleet_step(fstate, unet_params, fpairs)
        _ = np.asarray(fmetrics["loss"])

    fleet_iter_rate = chunk / best_sample(fleet_once, samples=5)

    def emit(mode, iter_rate):
        aggregate = iter_rate * n_sliders
        projected = 1000.0 / iter_rate / 60.0  # minutes for N sliders x 1000
        print(json.dumps({
            "metric": f"sd15_fleet{n_sliders}_{mode}_train_slider_steps_per_sec_chip",
            "value": round(aggregate, 4),
            "unit": "slider-steps/sec",
            "vs_baseline": round(aggregate / solo_rate, 4),
            "n_sliders": n_sliders,
            "solo_steps_per_sec": round(solo_rate, 4),
            "fleet_iterations_per_sec": round(iter_rate, 4),
            "projected_minutes_for_n_sliders_1000_iters": round(projected, 2),
            "note": "vs_baseline = aggregate speedup vs sequential solo runs",
        }), flush=True)

    emit("perrow", fleet_iter_rate)

    # ---- shared-t_to mode: row 0's t_to for every row (training/fleet.py)
    # removes the E[max_K t_to] ~ 50*K/(K+1) loop inflation of the
    # parity-exact per-row mode ----
    shared_step = make_fleet_text_step(
        cfg, schedule, sampler, fleet_opt,
        n_sliders=n_sliders, max_denoising_steps=50, resolution=512,
        batch_size=1, compute_dtype=jnp.bfloat16, remat=False, donate=True,
        chunk=chunk, shared_t_to=True,
    )
    sstate = SliderTrainState.create(jax.random.key(2), fleet_tree_shared, fleet_opt)
    sstate, smetrics = shared_step(sstate, unet_params, fpairs)
    _ = np.asarray(smetrics["loss"])

    def shared_once():
        nonlocal sstate, smetrics
        sstate, smetrics = shared_step(sstate, unet_params, fpairs)
        _ = np.asarray(smetrics["loss"])

    emit("sharedt", chunk / best_sample(shared_once, samples=5))

    # ---- stratified mode: per-STEP shared coarse stratum + independent
    # within-stratum jitter (training/fleet.draw_fleet_t_to) — exact uniform
    # per-row marginals, loop inflation ~1.07x analytic vs per-row's 1.6x,
    # without shared-t_to's full draw correlation ----
    strat_step = make_fleet_text_step(
        cfg, schedule, sampler, fleet_opt,
        n_sliders=n_sliders, max_denoising_steps=50, resolution=512,
        batch_size=1, compute_dtype=jnp.bfloat16, remat=False, donate=True,
        chunk=chunk, t_to_mode="stratified", t_to_strata=8,
    )
    tstate = SliderTrainState.create(jax.random.key(2), fleet_tree_strat, fleet_opt)
    tstate, tmetrics = strat_step(tstate, unet_params, fpairs)
    _ = np.asarray(tmetrics["loss"])

    def strat_once():
        nonlocal tstate, tmetrics
        tstate, tmetrics = strat_step(tstate, unet_params, fpairs)
        _ = np.asarray(tmetrics["loss"])

    emit("stratified", chunk / best_sample(strat_once, samples=5))


def main_fleet_image(n_sliders: int = None):
    """Image-slider FLEET step (training/fleet.make_fleet_image_step): N
    image sliders per jitted iteration at the reference 256px protocol.
    Times the solo image step (same program as --model image) then the
    fleet step; the image trainer has no denoise loop and is far from
    MXU saturation at its 2-row batch, so this probes the regime where
    the fleet economics should flip positive (BASELINE.md round-4 fleet
    table). BENCH_FLEET_K overrides N (default 4)."""
    import os

    import numpy as np

    if n_sliders is None:
        n_sliders = int(os.environ.get("BENCH_FLEET_K", "4"))

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d, vae
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.fleet import make_fleet_image_step, stack_fleet
    from sliders_tpu.training.image_slider import make_image_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState

    cfg = unet2d.SD15
    vae_cfg = vae.SD_VAE
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    vae_params = jax.jit(lambda k: vae.init_params(k, vae_cfg, dtype=jnp.bfloat16))(
        jax.random.key(1)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    loras = [
        lnet.create_slider_network(
            jax.random.fold_in(jax.random.key(2), r), unet_params, rank=4,
            alpha=1.0, train_method="noxattn", init_a=5 ** 0.5,
        )
        for r in range(n_sliders)
    ]
    lr = opt_factory.make_lr_schedule("constant", 2e-4, 1000)
    chunk = 10
    fleet_tree = stack_fleet(loras)  # before the donating solo phase

    ks = jax.random.split(jax.random.key(4), 4)
    host = np.random.default_rng(0)

    def embeds(k=None):
        e = {
            "positive": jax.random.normal(ks[0], (77, 768), jnp.bfloat16),
            "neutral": jax.random.normal(ks[1], (77, 768), jnp.bfloat16),
        }
        if k is not None:  # fleet layout: leading (K,) slider axis
            e = {kk: jnp.broadcast_to(v, (k,) + v.shape) for kk, v in e.items()}
        return e

    # ---- solo rate (program shared with --model image) ----
    solo_opt = opt_factory.make_optimizer(
        "adamw", lr, trainable_mask=lnet.trainable_mask(loras[0])
    )
    solo_step = make_image_slider_step(
        cfg, vae_cfg, schedule, sampler, solo_opt,
        max_denoising_steps=50, compute_dtype=jnp.bfloat16, remat=False,
        donate=True, chunk=chunk,
    )
    solo_batch = dict(
        embeds(),
        unconditional=jax.random.normal(ks[2], (77, 768), jnp.bfloat16),
        images_high=host.integers(0, 256, (chunk, 1, 256, 256, 3), dtype=np.uint8),
        images_low=host.integers(0, 256, (chunk, 1, 256, 256, 3), dtype=np.uint8),
        scale=jnp.ones((chunk,), jnp.float32),
    )
    state = SliderTrainState.create(jax.random.key(3), loras[0], solo_opt)
    state, metrics = solo_step(state, unet_params, vae_params, solo_batch)
    _ = np.asarray(metrics["loss"])

    def solo_once():
        nonlocal state, metrics
        for _ in range(2):
            state, metrics = solo_step(state, unet_params, vae_params, solo_batch)
        _ = np.asarray(metrics["loss"])

    solo_rate = 2 * chunk / best_sample(solo_once, samples=5)

    # ---- fleet rate ----
    fleet_opt = opt_factory.make_optimizer(
        "adamw", lr, trainable_mask=lnet.trainable_mask(fleet_tree)
    )
    fleet_step = make_fleet_image_step(
        cfg, vae_cfg, schedule, sampler, fleet_opt, n_sliders=n_sliders,
        max_denoising_steps=50, compute_dtype=jnp.bfloat16, remat=False,
        donate=True, chunk=chunk,
    )
    fleet_batch = dict(
        embeds(n_sliders),
        images_high=host.integers(
            0, 256, (chunk, n_sliders, 1, 256, 256, 3), dtype=np.uint8
        ),
        images_low=host.integers(
            0, 256, (chunk, n_sliders, 1, 256, 256, 3), dtype=np.uint8
        ),
        scale=jnp.ones((chunk, n_sliders), jnp.float32),
    )
    fstate = SliderTrainState.create(jax.random.key(3), fleet_tree, fleet_opt)
    fstate, fmetrics = fleet_step(fstate, unet_params, vae_params, fleet_batch)
    _ = np.asarray(fmetrics["loss"])

    def fleet_once():
        nonlocal fstate, fmetrics
        for _ in range(2):
            fstate, fmetrics = fleet_step(fstate, unet_params, vae_params, fleet_batch)
        _ = np.asarray(fmetrics["loss"])

    iter_rate = 2 * chunk / best_sample(fleet_once, samples=5)
    aggregate = iter_rate * n_sliders
    print(json.dumps({
        "metric": f"sd15_fleet{n_sliders}_image_train_slider_steps_per_sec_chip",
        "value": round(aggregate, 4),
        "unit": "slider-steps/sec",
        "vs_baseline": round(aggregate / solo_rate, 4),
        "n_sliders": n_sliders,
        "solo_steps_per_sec": round(solo_rate, 4),
        "fleet_iterations_per_sec": round(iter_rate, 4),
        "note": "vs_baseline = aggregate speedup vs sequential solo runs",
    }))


def main_flux():
    """Secondary metric: layer-reduced FLUX slider train step (see module
    docstring). Records in BASELINE.md, not the driver headline."""
    import numpy as np

    from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import flux
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.flux_slider import make_flux_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState, stack_prompt_pairs

    cfg = flux.FluxConfig(num_layers=4, num_single_layers=8)
    params = jax.jit(lambda k: flux.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, train_method="xattn", ortho_up=True
    )
    mask = lnet.trainable_mask(lora, ortho_up=True)
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 2e-4, 1000),
        trainable_mask=mask,
    )
    sampler = make_flowmatch_sampler(num_steps=4, image_seq_len=1024)
    # chunked dispatch like the SD benches: ~25 ms tunnel overhead on a
    # ~290 ms step; pair/t sampling folds per step inside the scan
    chunk = 5
    step = make_flux_slider_step(
        cfg, sampler, optimizer, resolution=512, batch_size=1,
        compute_dtype=jnp.bfloat16, remat=False, donate=True, trainable_mask=mask,
        chunk=chunk,
    )
    ks = jax.random.split(jax.random.key(3), 8)
    pair = {}
    for i, role in enumerate(("target", "positive", "neutral", "unconditional")):
        pair[f"{role}_t5"] = jax.random.normal(
            ks[2 * i], (512, cfg.joint_attention_dim), jnp.bfloat16
        )
        pair[f"{role}_pooled"] = jax.random.normal(
            ks[2 * i + 1], (cfg.pooled_projection_dim,), jnp.bfloat16
        )
    pair["guidance_signed"] = jnp.asarray(1.0)
    pairs = stack_prompt_pairs([pair])
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)

    state, metrics = step(state, params, pairs)
    _ = np.asarray(metrics["loss"])
    calls = 2

    def run_once():
        nonlocal state, metrics
        for _ in range(calls):
            state, metrics = step(state, params, pairs)
        _ = np.asarray(metrics["loss"])

    value = calls * chunk / best_sample(run_once, samples=5)
    print(steps_line("flux_mini_4x8_slider_train_steps_per_sec_chip", value))


def main_sdxl(chunk: int = 10) -> float:
    """Secondary metric: SDXL text-slider train step at the reference's XL
    protocol (config-xl.yaml: 512px, batch 1, rank 4 noxattn, DDIM-50 grid,
    CFG-doubled denoise) — the BASELINE.json north-star model.

    `chunk` overrides steps_per_call for the sweep experiment
    (experiments/chunk_sweep_xl.py) so the sweep measures THIS protocol,
    not a copy; returns the measured steps/s."""
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
    # chunk sweep (round-3): 5 -> 1.403, 10 -> 1.732 steps/s (dispatch
    # amortization); re-swept later in round 3 (experiments/chunk_sweep_xl.py):
    # 15 -> 1.783, 20 -> 1.494 (20's earlier "program too large" load failure
    # was transient tunnel flake — it loads, it's just slower). 15-vs-10 is
    # within host-contention noise (chunk=10 has a 2.05 steps/s warm reading
    # on record), so 10 stays the default.
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

    state, metrics = step(state, unet_params, pairs)
    _ = np.asarray(metrics["loss"])
    # one 10-step chained call per sample: dispatch overhead is already
    # amortized to <1% by the chunk scan, and single-call samples give the
    # best-of-N min a clean shot between host-contention spikes
    calls = 1

    def run_once():
        nonlocal state, metrics
        for _ in range(calls):
            state, metrics = step(state, unet_params, pairs)
        _ = np.asarray(metrics["loss"])

    value = calls * chunk / best_sample(run_once, samples=5)
    print(steps_line(
        "sdxl_text_slider_train_steps_per_sec_chip", value,
        flops_per_iter=train_iter_flops(cfg, is_xl=True),
    ))
    return value


def main_sample():
    """Secondary metric: 50-step DDIM CFG-7.5 sampling latency (SD1.5,
    512px, batch 1, slider on at scale 1) — the reference inference
    protocol (generate_images_sd1.py: 50 steps, CFG 7.5)."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.pipelines import text2image as t2i

    cfg = unet2d.SD15
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.key(2), 3)
    cond = jax.random.normal(ks[0], (1, 77, 768), jnp.bfloat16)
    uncond = jax.random.normal(ks[1], (1, 77, 768), jnp.bfloat16)
    lats = t2i.initial_latents(jax.random.key(3), 1, 512, 512, sampler.init_noise_sigma)

    def run(key, latents):
        return fn(
            unet_params, latents, cond, uncond, lora,
            jnp.asarray(1.0), jnp.asarray(1000.0), jnp.asarray(7.5), key,
        )

    out = run(jax.random.key(4), lats)
    _ = np.asarray(out[0, 0, 0, 0])
    n = 5

    def run_once():
        nonlocal out
        for i in range(n):
            # chain: each run's input data-depends on the previous output so
            # the final fetch proves ALL n runs completed (CLAUDE.md rule 1)
            out = run(jax.random.key(5 + i), lats + out * 1e-6)
        _ = np.asarray(out[0, 0, 0, 0])

    dt = best_sample(run_once)
    print(
        json.dumps(
            {
                "metric": "sd15_50step_denoise_latency",
                "value": round(dt / n * 1000, 1),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


def main_turbo():
    """Secondary metric: SDXL-Turbo few-step protocol latency
    (demo_SDXL_Turbo.ipynb cell 6: 3 steps, guidance 1 -> no CFG,
    512px, slider gated by start_noise 700)."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.pipelines import text2image as t2i

    cfg = unet2d.SDXL
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "euler_a", num_steps=3)
    fn = t2i.make_sampling_fn(
        cfg, sampler, use_cfg=False, compute_dtype=jnp.bfloat16, is_xl=True
    )
    ks = jax.random.split(jax.random.key(2), 2)
    cond = jax.random.normal(ks[0], (1, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(ks[1], (1, 1280), jnp.bfloat16)
    added = {
        "text_embeds": pooled,
        "time_ids": jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32),
    }
    lats = t2i.initial_latents(jax.random.key(3), 1, 512, 512, sampler.init_noise_sigma)

    def run(key, latents):
        return fn(
            unet_params, latents, cond, cond, lora,
            jnp.asarray(1.0), jnp.asarray(700.0), jnp.asarray(1.0), key,
            added,
        )

    out = run(jax.random.key(4), lats)
    _ = np.asarray(out[0, 0, 0, 0])
    n = 10

    def run_once():
        nonlocal out
        for i in range(n):
            # chained so the final fetch data-depends on all timed runs
            out = run(jax.random.key(5 + i), lats + out * 1e-6)
        _ = np.asarray(out[0, 0, 0, 0])

    dt = best_sample(run_once)
    print(
        json.dumps(
            {
                "metric": "sdxl_turbo_3step_denoise_latency",
                "value": round(dt / n * 1000, 1),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


def main_xl1024():
    """Secondary metric: SDXL 50-step CFG denoise latency at the reference's
    native 1024px eval resolution (generate_images_xl.py protocol: 50 steps,
    CFG ~7.5, batch 1, slider on) — the BASELINE.md target-table row that
    was still TBD."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.pipelines import text2image as t2i

    cfg = unet2d.SDXL
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    fn = t2i.make_sampling_fn(
        cfg, sampler, use_cfg=True, guidance_rescale=0.7,
        compute_dtype=jnp.bfloat16, is_xl=True,
    )
    ks = jax.random.split(jax.random.key(2), 3)
    cond = jax.random.normal(ks[0], (1, 77, 2048), jnp.bfloat16)
    uncond = jax.random.normal(ks[1], (1, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(ks[2], (1, 1280), jnp.bfloat16)
    tid = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32)
    added = {
        "text_embeds": pooled, "time_ids": tid,
        "uncond_text_embeds": pooled, "uncond_time_ids": tid,
    }
    lats = t2i.initial_latents(jax.random.key(3), 1, 1024, 1024, sampler.init_noise_sigma)

    def run(key, latents):
        return fn(
            unet_params, latents, cond, uncond, lora,
            jnp.asarray(1.0), jnp.asarray(750.0), jnp.asarray(7.5), key,
            added,
        )

    out = run(jax.random.key(4), lats)
    _ = np.asarray(out[0, 0, 0, 0])
    n = 2

    def run_once():
        nonlocal out
        for i in range(n):
            # chained so the final fetch data-depends on all timed runs
            out = run(jax.random.key(5 + i), lats + out * 1e-6)
        _ = np.asarray(out[0, 0, 0, 0])

    dt = best_sample(run_once)
    print(
        json.dumps(
            {
                "metric": "sdxl_1024px_50step_denoise_latency",
                "value": round(dt / n * 1000, 1),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


def main_invert():
    """Secondary metric: full real-image-edit latency — the
    demo_image_editing.ipynb protocol (SURVEY.md §3.5): 50-step DDIM
    inversion (cond-only preds), null-text optimization (10 inner Adam
    steps per timestep, CFG 7.5), then one slider-gated resample from x_T
    (start_noise 500, scale 1). SD1.5 at 512px, bf16 UNet; the optimized
    uncond embedding stays f32 (Adam at lr ~1e-2). The three stages are
    data-dependent (traj -> uncond_opt -> edit), so one final host fetch
    proves the whole chain completed."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.pipelines import inversion as inv

    cfg = unet2d.SD15
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    invert = inv.make_ddim_inversion_fn(cfg, sampler, compute_dtype=jnp.bfloat16)
    null_opt = inv.make_null_text_optimizer(
        cfg, sampler, guidance_scale=7.5, num_inner_steps=10,
        compute_dtype=jnp.bfloat16,
    )
    edit = inv.make_edit_sampling_fn(
        cfg, sampler, guidance_scale=7.5, compute_dtype=jnp.bfloat16
    )
    ks = jax.random.split(jax.random.key(2), 3)
    cond = jax.random.normal(ks[0], (1, 77, 768), jnp.bfloat16)
    uncond = jax.random.normal(ks[1], (1, 77, 768), jnp.float32)
    clean = jax.random.normal(ks[2], (1, 64, 64, 4), jnp.bfloat16) * 0.3

    def run(latents):
        traj = invert(unet_params, latents, cond)
        uncond_opt = null_opt(unet_params, traj, cond, uncond)
        return edit(
            unet_params, traj[0], cond, uncond_opt, lora,
            jnp.asarray(1.0), jnp.asarray(500.0),
        )

    out = run(clean)
    _ = np.asarray(out[0, 0, 0, 0])

    def run_once():
        nonlocal out
        # chain: the next edit's input data-depends on the previous output
        out = run(clean + out.astype(jnp.bfloat16) * 1e-6)
        _ = np.asarray(out[0, 0, 0, 0])

    dt = best_sample(run_once)
    print(
        json.dumps(
            {
                "metric": "null_text_inversion_edit_latency",
                "value": round(dt, 2),
                "unit": "s",
                "vs_baseline": None,
                "protocol": "50-step DDIM invert + 50x10 null-text Adam + 50-step edit resample, 512px",
            }
        )
    )


def main_image():
    """Secondary metric: SD1.5 image-slider train step at the reference
    protocol (train_lora-scale.py: 256px for SD1, batch 1 pair, fused ±s
    one-batch step with VAE encode)."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d, vae
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.image_slider import make_image_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState

    cfg = unet2d.SD15
    vae_cfg = vae.SD_VAE
    unet_params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    vae_params = jax.jit(lambda k: vae.init_params(k, vae_cfg, dtype=jnp.bfloat16))(
        jax.random.key(1)
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=50)
    # imagesliders kaiming a=sqrt(5) drift + conv targets (lora.py drift)
    lora = lnet.create_slider_network(
        jax.random.key(2), unet_params, rank=4, alpha=1.0,
        train_method="noxattn", init_a=5 ** 0.5,
    )
    optimizer = opt_factory.make_optimizer(
        "adamw",
        opt_factory.make_lr_schedule("constant", 2e-4, 1000),
        trainable_mask=lnet.trainable_mask(lora),
    )
    # chunked dispatch (tpu.steps_per_call equivalent): this ~30 ms step is
    # dominated by the ~25 ms/dispatch tunnel overhead, so scan `chunk`
    # iterations per call over a stacked per-iteration batch (fresh images
    # per step, uint8 host->device — exactly what the CLI path ships)
    chunk = 10
    step = make_image_slider_step(
        cfg, vae_cfg, schedule, sampler, optimizer,
        max_denoising_steps=50, compute_dtype=jnp.bfloat16, remat=False,
        donate=True, chunk=chunk,
    )
    state = SliderTrainState.create(jax.random.key(3), lora, optimizer)
    ks = jax.random.split(jax.random.key(4), 5)
    host = np.random.default_rng(0)
    batch = {
        "images_high": host.integers(0, 256, (chunk, 1, 256, 256, 3), dtype=np.uint8),
        "images_low": host.integers(0, 256, (chunk, 1, 256, 256, 3), dtype=np.uint8),
        "scale": jnp.ones((chunk,), jnp.float32),
        "positive": jax.random.normal(ks[2], (77, 768), jnp.bfloat16),
        "neutral": jax.random.normal(ks[3], (77, 768), jnp.bfloat16),
        "unconditional": jax.random.normal(ks[4], (77, 768), jnp.bfloat16),
    }

    state, metrics = step(state, unet_params, vae_params, batch)
    _ = np.asarray(metrics["loss"])
    calls = 2

    def run_once():
        nonlocal state, metrics
        for _ in range(calls):
            state, metrics = step(state, unet_params, vae_params, batch)
        _ = np.asarray(metrics["loss"])

    value = calls * chunk / best_sample(run_once, samples=5)
    print(steps_line("sd15_image_slider_train_steps_per_sec_chip", value))


def main_serve():
    """Serving latency: a warm HTTP /generate request through the FULL stack
    (JSON parse -> cached prompt encode -> 5-scale batched 50-step denoise
    at 512px -> VAE decode -> PNG -> base64), serving/server.py. The 5-scale
    sweep is the reference eval protocol (generate_images_sd1.py scales
    [-2..2]); it pads to the 8-bucket, so this is the executable the server
    keeps warm. Random full-size weights are compute-equivalent."""
    import os
    import tempfile
    import threading

    import numpy as np

    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import clip_text, unet2d, vae
    from sliders_tpu.models.loader import SDModels, TextEncoderBundle
    from sliders_tpu.serving.server import SliderEngine, make_http_server
    from sliders_tpu.text.tokenizer import ClipTokenizer

    tok_dir = os.path.join(tempfile.gettempdir(), "bench_serve_tok")
    if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        from helpers import make_tokenizer_files

        make_tokenizer_files(tok_dir)
    tokenizer = ClipTokenizer.from_pretrained(tok_dir)
    tokenizer.model_max_length = clip_text.CLIP_L.max_positions

    unet_params = jax.jit(
        lambda k: unet2d.init_params(k, unet2d.SD15, dtype=jnp.bfloat16)
    )(jax.random.key(0))
    te_params = jax.jit(lambda k: clip_text.init_params(k, clip_text.CLIP_L))(
        jax.random.key(1)
    )
    vae_params = jax.jit(lambda k: vae.init_params(k, vae.SD_VAE, dtype=jnp.bfloat16))(
        jax.random.key(2)
    )
    models = SDModels(
        unet_params, unet2d.SD15,
        [TextEncoderBundle(tokenizer, te_params, clip_text.CLIP_L)],
        vae_params=vae_params, vae_config=vae.SD_VAE,
    )
    # env overrides exist for CPU smoke-testing the wiring only; the
    # recorded metric is the 50-step 512px default
    engine = SliderEngine(
        models,
        steps=int(os.environ.get("BENCH_SERVE_STEPS", "50")),
        image_size=int(os.environ.get("BENCH_SERVE_SIZE", "512")),
    )
    engine.register_slider("age", lnet.create_slider_network(
        jax.random.key(3), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    ))
    server = make_http_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client

    scales = [-2, -1, 0, 1, 2]

    def request(seed):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=3000)
        conn.request(
            "POST", "/generate",
            body=json.dumps(
                {"prompt": "photo of a person", "slider": "age",
                 "scales": scales, "seed": seed}
            ),
        )
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 200 and len(out["images"]) == len(scales), out
        return out

    request(0)  # warm compile (bucket 8) + embed-cache fill
    seed = [1]

    def run_once():
        # response PNGs are host bytes derived from np.asarray inside the
        # engine, so each request is a completed round trip by construction
        request(seed[0])
        seed[0] += 1

    dt = best_sample(run_once)

    # multi-tenant phase: concurrent requests for DIFFERENT sliders coalesce
    # into one denoise via per-row stacked adapters (lora/batch.py) — the
    # serving throughput story. 4 concurrent 2-scale requests alternating
    # between two sliders fill the 8-bucket exactly.
    engine.register_slider("smile", lnet.create_slider_network(
        jax.random.key(4), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    ))
    names = ["age", "smile", "age", "smile"]

    def mt_round(seed0):
        outs = [None] * len(names)
        errs = []

        def one(i):
            try:
                outs[i] = engine.generate(
                    "photo of a person", seed=seed0 + i, slider=names[i],
                    scales=[-1.0, 1.0],
                )
            except Exception as e:  # surface in the bench, don't hang
                errs.append(e)

        ths = [threading.Thread(target=one, args=(i,)) for i in range(len(names))]
        # the worker coalesces whatever queued while the device is busy; a
        # tiny stagger lets all four enqueue before the first batch drains
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        if errs:
            raise errs[0]
        assert all(o is not None and len(o) == 2 for o in outs)

    mt_round(100)  # warm the stacked-weights executable (bucket 8)
    b0 = engine.stats["batches"]
    mt_seed = [200]

    def mt_once():
        mt_round(mt_seed[0])
        mt_seed[0] += 10

    mt_dt = best_sample(mt_once)
    mt_batches = engine.stats["batches"] - b0

    # ---- continuous phase: STAGGERED arrivals (the regime the boundary
    # worker loses: a request landing mid-denoise waits the full ~10 s
    # denoise before admission; the continuous engine admits it at the
    # next chunk boundary). Same workload through both engines: M 2-scale
    # requests arriving every (request_latency / 4). ----
    import time as _time

    M = int(os.environ.get("BENCH_SERVE_M", "8"))  # CPU smoke: set 2-4
    stagger = dt / 4

    def staggered_round(eng, seed0):
        outs = [None] * M
        errs = []

        def one(i):
            try:
                _time.sleep(i * stagger)
                outs[i] = eng.generate(
                    "photo of a person", seed=seed0 + i,
                    slider=names[i % 2], scales=[-1.0, 1.0],
                )
            except Exception as e:
                errs.append(e)

        ths = [threading.Thread(target=one, args=(i,)) for i in range(M)]
        t0 = _time.perf_counter()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        el = _time.perf_counter() - t0
        if errs:
            raise errs[0]
        assert all(o is not None and len(o) == 2 for o in outs)
        return el

    # boundary engine under the same staggered workload
    bd_t = min(staggered_round(engine, 300), staggered_round(engine, 400))
    engine.close()

    cont = SliderEngine(
        models,
        steps=int(os.environ.get("BENCH_SERVE_STEPS", "50")),
        image_size=int(os.environ.get("BENCH_SERVE_SIZE", "512")),
        continuous=True,
        continuous_rows=8,
        chunk_steps=5,
    )
    for nm in ("age", "smile"):
        cont.register_slider(nm, engine.sliders[nm])
    cont.warmup(with_slider="age", n_scales=2, multi_tenant=True)  # fresh+join
    ct_t = min(staggered_round(cont, 500), staggered_round(cont, 600))
    cont.close()
    server.shutdown()
    print(
        json.dumps(
            {
                "metric": "serve_5scale_512px_request_latency",
                "value": round(dt * 1000, 1),
                "unit": "ms",
                "vs_baseline": None,
                "images_per_sec": round(len(scales) / dt, 2),
                "mt_4req_2slider_images_per_sec": round(8 / mt_dt, 2),
                "mt_denoise_batches_per_round": round(mt_batches / SAMPLES, 2),
                "staggered_8req_boundary_images_per_sec": round(2 * M / bd_t, 2),
                "staggered_8req_continuous_images_per_sec": round(2 * M / ct_t, 2),
                "continuous_vs_boundary_staggered": round(bd_t / ct_t, 2),
                "continuous_vs_mt_images_per_sec": round((2 * M / ct_t) / (8 / mt_dt), 2),
            }
        )
    )


def main_serve_flux():
    """FLUX serving latency through the full HTTP stack (FluxSliderEngine:
    CLIP-pooled + T5 encode -> guidance-embed flow-matching denoise ->
     16ch-VAE decode -> PNG), on the same layer-reduced FLUX as
    `--model flux` (full FLUX-dev exceeds one v5e's HBM; the serving path
    is identical, the block count is not). Random full-size weights are
    compute-equivalent. Phases: warm 3-scale solo request, then a
    2-request cross-slider coalesce (stacked adapters through the MMDiT)."""
    import os
    import tempfile
    import threading
    import time as _time

    import numpy as np

    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import clip_text, flux, t5 as t5_mod, vae
    from sliders_tpu.models.loader import FluxModels, TextEncoderBundle
    from sliders_tpu.serving.server import FluxSliderEngine, make_http_server
    from sliders_tpu.text.tokenizer import ClipTokenizer

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from helpers import make_t5_fast_tokenizer, make_tokenizer_files

    tok_dir = os.path.join(tempfile.gettempdir(), "bench_serve_tok")
    if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
        make_tokenizer_files(tok_dir)
    tokenizer = ClipTokenizer.from_pretrained(tok_dir)
    tokenizer.model_max_length = clip_text.CLIP_L.max_positions
    t5_tok_dir = os.path.join(tempfile.gettempdir(), "bench_serve_t5_tok")
    make_t5_fast_tokenizer(t5_tok_dir)
    import transformers

    t5_tok = transformers.T5TokenizerFast.from_pretrained(t5_tok_dir)

    cfg = flux.FluxConfig(num_layers=4, num_single_layers=8)
    t5_cfg = t5_mod.T5Config(
        vocab_size=32, d_model=cfg.joint_attention_dim, d_kv=64, d_ff=4096,
        num_layers=2, num_heads=8,
    )
    tparams = jax.jit(lambda k: flux.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    te_params = jax.jit(lambda k: clip_text.init_params(k, clip_text.CLIP_L))(
        jax.random.key(1)
    )
    t5_params = jax.jit(lambda k: t5_mod.init_params(k, t5_cfg))(jax.random.key(2))
    vae_params = jax.jit(
        lambda k: vae.init_params(k, vae.FLUX_VAE, dtype=jnp.bfloat16)
    )(jax.random.key(3))
    models = FluxModels(
        tparams, cfg,
        TextEncoderBundle(tokenizer, te_params, clip_text.CLIP_L),
        t5_params, t5_cfg, t5_tok,
        vae_params=vae_params, vae_config=vae.FLUX_VAE,
    )
    engine = FluxSliderEngine(
        models,
        steps=int(os.environ.get("BENCH_SERVE_STEPS", "30")),
        image_size=int(os.environ.get("BENCH_SERVE_SIZE", "512")),
        buckets=(4,),
    )
    for i, name in enumerate(("age", "smile")):
        engine.register_slider(name, lnet.create_slider_network(
            jax.random.key(10 + i), tparams, rank=4, train_method="xattn",
            ortho_up=True,
        ))
    server = make_http_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client

    def request(seed, slider="age", scales=(-4, 0, 4)):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=3000)
        conn.request("POST", "/generate", body=json.dumps(
            {"prompt": "photo of a person", "slider": slider,
             "scales": list(scales), "seed": seed}
        ))
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 200, out
        return out

    request(0)  # compile + warm (solo 3-scale -> bucket 4)
    seed = [1]

    def run_once():
        request(seed[0])
        seed[0] += 1

    dt = best_sample(run_once)

    # cross-slider coalesce: 2 concurrent 2-scale requests, different
    # sliders -> ONE stacked denoise
    engine.warmup(with_slider="age", n_scales=2, multi_tenant=True)
    mt_batches0 = engine.stats["batches"]

    def mt_round(seed0):
        outs, errs = [None, None], []

        def go(i, name):
            try:
                outs[i] = request(seed0 + i, slider=name, scales=(0, 2))
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=go, args=(i, n))
              for i, n in enumerate(("age", "smile"))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs

    t0 = _time.perf_counter()
    for r in range(SAMPLES):
        mt_round(100 + 10 * r)
    mt_dt = (_time.perf_counter() - t0) / SAMPLES
    mt_batches = engine.stats["batches"] - mt_batches0
    engine.close()
    print(json.dumps({
        "metric": "serve_flux_3scale_512px_request_latency",
        "value": round(dt * 1000, 1),
        "unit": "ms",
        "vs_baseline": None,
        "images_per_sec": round(3 / dt, 2),
        "mt_2req_2slider_images_per_sec": round(4 / mt_dt, 2),
        "mt_denoise_batches_per_round": round(mt_batches / SAMPLES, 2),
    }))


def main_all():
    """Run EVERY bench mode in one process (one TPU owner, modes serialized)
    and emit one JSON line per mode (VERDICT r3 item 6: BENCH_r0N.json
    records only the default sd15 headline; this gives the full HEAD table
    for BASELINE.md). Each mode already prints its own line; failures are
    reported per mode and don't stop the rest."""
    modes = [
        ("sd15", main),
        ("sdxl", main_sdxl),
        ("fleet", main_fleet),
        ("fleet_image", main_fleet_image),
        ("flux", main_flux),
        ("sample", main_sample),
        ("turbo", main_turbo),
        ("image", main_image),
        ("xl1024", main_xl1024),
        ("invert", main_invert),
        ("serve", main_serve),
        ("serve_flux", main_serve_flux),
    ]
    for name, fn in modes:
        print(json.dumps({"bench_mode": name}), flush=True)
        try:
            fn()
        except Exception as e:  # record and continue — partial table > none
            print(json.dumps({"metric": f"{name}_FAILED", "value": None,
                              "unit": "", "vs_baseline": None,
                              "error": repr(e)}), flush=True)


if __name__ == "__main__":
    if "--all" in sys.argv:
        main_all()
    elif "--model" in sys.argv and "fleet_image" in sys.argv:
        main_fleet_image()
    elif "--model" in sys.argv and "fleet" in sys.argv:
        main_fleet()
    elif "--model" in sys.argv and "flux" in sys.argv:
        main_flux()
    elif "--model" in sys.argv and "sdxl" in sys.argv:
        main_sdxl()
    elif "--model" in sys.argv and "sample" in sys.argv:
        main_sample()
    elif "--model" in sys.argv and "turbo" in sys.argv:
        main_turbo()
    elif "--model" in sys.argv and "image" in sys.argv:
        main_image()
    elif "--model" in sys.argv and "xl1024" in sys.argv:
        main_xl1024()
    elif "--model" in sys.argv and "invert" in sys.argv:
        main_invert()
    elif "--model" in sys.argv and "serve_flux" in sys.argv:
        main_serve_flux()
    elif "--model" in sys.argv and "serve" in sys.argv:
        main_serve()
    else:
        main()
