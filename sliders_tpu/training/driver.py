"""Host-side training orchestration (the reference `train()` loop,
train_lora.py:32-340 / train_lora_xl.py, re-designed around one jitted step).

Adds what the reference lacks (SURVEY.md §5): full train-state
checkpoint/resume (optimizer state included), run-metadata JSON sidecar,
step timing, and NaN guarding — while keeping the reference's observable
behavior: prompt-embedding cache, periodic slider saves named
`{name}_{i}steps.{ext}` and `{name}_last.{ext}`, stdout/wandb metrics.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.core.config import RootConfig
from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import io as lora_io
from sliders_tpu.lora import network as lnet
from sliders_tpu.models.loader import SDModels
from sliders_tpu.pipelines import text2image as t2i
from sliders_tpu.pipelines.encoding import encode_prompts, encode_prompts_xl
from sliders_tpu.prompts import PromptSettings
from sliders_tpu.training import optimizers as opt_factory
from sliders_tpu.training.text_slider import (
    SliderTrainState,
    make_text_slider_step,
    stack_prompt_pairs,
)


class PromptEmbedsCache:
    """Encode each unique prompt once (reference PromptEmbedsCache,
    prompt_util.py:31-41 + train_lora.py:109-146)."""

    def __init__(self, models: SDModels):
        self.models = models
        self._cache: dict[str, object] = {}

    def __getitem__(self, prompt: str):
        if prompt not in self._cache:
            m = self.models
            if m.is_xl:
                text, pooled = encode_prompts_xl(
                    [te.tokenizer for te in m.text_encoders],
                    [te.params for te in m.text_encoders],
                    [te.config for te in m.text_encoders],
                    [prompt],
                )
                self._cache[prompt] = (text[0], pooled[0])
            else:
                te = m.text_encoders[0]
                emb = encode_prompts(
                    te.tokenizer, te.params, te.config, [prompt],
                    num_layers=te.clip_skip_layers,
                )
                self._cache[prompt] = emb[0]
        return self._cache[prompt]


def build_pairs(
    settings: list[PromptSettings], cache: PromptEmbedsCache, is_xl: bool,
    resolution_hw=None,
):
    """PromptSettings -> stacked embedding pytree for the jitted step.
    erase folds into the guidance sign (erase == enhance at −g).
    `resolution_hw` overrides per-setting resolution (dynamic buckets)."""
    pairs = []
    for s in settings:
        sign = 1.0 if s.action == "enhance" else -1.0
        pair = {"guidance_signed": jnp.asarray(sign * s.guidance_scale, jnp.float32)}
        for k, prompt in (
            ("target", s.target),
            ("positive", s.positive),
            ("neutral", s.neutral),
            ("unconditional", s.unconditional),
        ):
            e = cache[prompt]
            if is_xl:
                pair[k] = e[0]
                pair[f"pooled_{k}"] = e[1]
            else:
                pair[k] = e
        if is_xl:
            h, w = resolution_hw or (s.resolution, s.resolution)
            pair["time_ids"] = t2i.get_add_time_ids(h, w)[0]
            # per-iteration crop resampling happens INSIDE the jitted step
            # (text_slider.py) when this flag is set, matching the reference
            # calling get_add_time_ids every iteration (train_lora_xl.py:198)
            pair["dynamic_crops"] = jnp.asarray(float(s.dynamic_crops))
        pairs.append(pair)
    return stack_prompt_pairs(pairs)


def random_resolution_in_bucket(rng, bucket_resolution: int = 512) -> tuple[int, int]:
    """Reference train_util.get_random_resolution_in_bucket
    (train_util.py:407-419): 64-px steps in [res/2, res)."""
    step = 64
    min_step = bucket_resolution // 2 // step
    max_step = bucket_resolution // step
    h = int(rng.integers(min_step, max_step)) * step
    w = int(rng.integers(min_step, max_step)) * step
    return h, w


def _state_bytes(state) -> bytes:
    from flax import serialization

    # typed PRNG keys are not serializable; store the raw key data
    host = jax.device_get(state.replace(key=jax.random.key_data(state.key)))
    return serialization.to_bytes(host)


def _state_from_bytes(template, data: bytes):
    from flax import serialization

    tmpl = template.replace(key=jax.random.key_data(template.key))
    restored = serialization.from_bytes(tmpl, data)
    return restored.replace(key=jax.random.wrap_key_data(jnp.asarray(restored.key)))


def train_text_sliders(
    config: RootConfig,
    prompts: list[PromptSettings],
    models: SDModels,
    *,
    mesh=None,
    resume_from: Optional[str] = None,
    seed: int = 0,
    on_step=None,
) -> dict:
    """Run the text-slider training loop; returns the final LoRA weights."""
    tpu = config.tpu
    save_dir = Path(config.save.path)
    ext = ".safetensors" if config.save.format == "safetensors" else ".pt"

    # all pairs must share a resolution/batch bucket per compiled step;
    # group and round-robin buckets (reference samples uniformly over pairs)
    buckets: dict[tuple, list[PromptSettings]] = {}
    for s in prompts:
        buckets.setdefault((s.resolution, s.batch_size), []).append(s)

    cache = PromptEmbedsCache(models)
    compute_dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                     "fp16": jnp.float16, "float16": jnp.float16}.get(
        config.train.precision, jnp.float32
    )

    schedule = make_schedule(
        prediction_type="v_prediction" if config.pretrained_model.v_pred else "epsilon"
    )
    sampler = make_sampler(
        schedule, config.train.noise_scheduler, config.train.max_denoising_steps
    )

    lora = lnet.create_slider_network(
        jax.random.key(seed + 1),
        models.unet_params,
        rank=config.network.rank,
        alpha=config.network.alpha,
        train_method=config.network.training_method,
        network_type=config.network.type,
        dtype=jnp.float32,  # master LoRA weights in f32; compute casts
    )
    print(f"create LoRA for U-Net: {len(lora)} modules.")

    lr_schedule = opt_factory.make_lr_schedule(
        config.train.lr_scheduler, config.train.lr, config.train.iterations
    )
    optimizer = opt_factory.make_optimizer(
        config.train.optimizer,
        lr_schedule,
        opt_factory.parse_optimizer_args(config.train.optimizer_args),
        trainable_mask=lnet.trainable_mask(lora),
    )

    n_dp = 1 if mesh is None else mesh.shape["dp"]
    steps: dict = {}
    bucket_pairs: dict = {}

    def get_step(bucket_key, hw, chunk=1):
        """Lazily compile one step per (bucket, resolution[, chunk]) — dynamic
        resolution (train_util.py:407-419) samples a new 64-px bucket per
        iteration; each bucket compiles once and is cached."""
        resolution, batch = bucket_key
        ck = (bucket_key, hw, chunk)
        if ck not in steps:
            steps[ck] = make_text_slider_step(
                models.unet_config, schedule, sampler, optimizer,
                max_denoising_steps=config.train.max_denoising_steps,
                resolution=hw,
                batch_size=batch * max(tpu.per_device_batch, 1) * n_dp,
                compute_dtype=compute_dtype,
                remat=tpu.remat,
                mesh=mesh,
                is_xl=models.is_xl,
                donate=tpu.donate,
                chunk=chunk,
            )
            bucket_pairs.setdefault(
                (bucket_key, hw),
                build_pairs(buckets[bucket_key], cache, models.is_xl, resolution_hw=hw),
            )
        return steps[ck], bucket_pairs[(bucket_key, hw)]

    state = SliderTrainState.create(jax.random.key(seed), lora, optimizer)
    if resume_from is not None:
        if Path(resume_from).is_dir():  # orbax sharded checkpoint
            from sliders_tpu.training import checkpoint as sharded_ckpt

            if mesh is not None:
                # target placement first: orbax then reshards each array
                # straight onto this run's mesh (which may differ from the
                # mesh the checkpoint was written on)
                from sliders_tpu.parallel.mesh import replicate

                state = replicate(mesh, state)
            state = sharded_ckpt.restore_sharded(resume_from, state)
        else:
            with open(resume_from, "rb") as f:
                state = _state_from_bytes(state, f.read())
        print(f"resumed from {resume_from} at step {int(state.step)}")

    metadata = {
        "prompts": [p.model_dump() for p in prompts],
        "config": json.loads(config.model_dump_json()),
    }
    save_dir.mkdir(parents=True, exist_ok=True)
    with open(save_dir / f"{config.save.name}_metadata.json", "w") as f:
        json.dump(metadata, f, indent=2)

    if config.logging.use_wandb:
        import wandb

        wandb.init(project=f"LECO_{config.save.name}", config=metadata)

    if tpu.profile_dir:
        jax.profiler.start_trace(tpu.profile_dir)

    bucket_keys = list(buckets.keys())
    host_rng = np.random.default_rng(seed)
    t_last = time.perf_counter()

    # dispatch-amortization: scan tpu.steps_per_call iterations per compiled
    # call. Only sound with one static bucket — bucket/resolution resampling
    # happens on the host between dispatches (reference resamples per
    # iteration, train_util.py:407-419), so fall back to 1 otherwise.
    chunk_cfg = max(1, tpu.steps_per_call)
    if chunk_cfg > 1 and (
        len(bucket_keys) > 1 or any(s.dynamic_resolution for s in prompts)
    ):
        print("steps_per_call > 1 needs a single static bucket; using 1")
        chunk_cfg = 1

    i = start = int(state.step)
    while i < config.train.iterations:
        bk = bucket_keys[host_rng.integers(len(bucket_keys))] if len(bucket_keys) > 1 else bucket_keys[0]
        resolution, _batch = bk
        if any(s.dynamic_resolution for s in buckets[bk]):
            hw = random_resolution_in_bucket(host_rng, resolution)
        else:
            hw = (resolution, resolution)
        n = min(chunk_cfg, config.train.iterations - i)
        # align chunk ends to the save/checkpoint cadences so a periodic
        # artifact always contains exactly the weights of its labeled step
        # (host only sees end-of-chunk state)
        for period in (config.save.per_steps, tpu.state_checkpoint_every):
            if period and period > 0:
                boundary = max(((i + period - 1) // period) * period, period)
                n = min(n, boundary - i + 1)
        step_fn, pairs_for_bucket = get_step(bk, hw, chunk=n)
        state, metrics = step_fn(state, models.unet_params, pairs_for_bucket)
        per_step = (
            [jax.tree.map(lambda a, j=j: a[j], metrics) for j in range(n)]
            if n > 1
            else [metrics]
        )

        for j, m in enumerate(per_step):
            sj = i + j
            if tpu.nan_check and not np.isfinite(float(m["loss"])):
                raise FloatingPointError(f"non-finite loss at step {sj}: {m}")

            if sj % config.logging.log_every == 0 or sj == config.train.iterations - 1:
                loss = float(m["loss"])
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                print(
                    f"step {sj}: loss*1k={loss * 1000:.4f} t_to={int(m['t_to'])} "
                    f"pair={int(m['pair'])} ({dt:.2f}s since last log)"
                )
                if config.logging.use_wandb:
                    import wandb

                    wandb.log({"loss": loss, "iteration": sj, "lr": float(lr_schedule(sj))})
            if on_step is not None:
                on_step(sj, state, m)

            if (
                config.save.per_steps
                and config.save.per_steps > 0
                and sj % config.save.per_steps == 0
                and sj != 0
                and sj != config.train.iterations - 1
            ):
                # chunk ends are aligned to the cadence above, so `state`
                # here is exactly the post-step-sj state the label claims
                print("Saving...")
                lora_io.save_slider(
                    str(save_dir / f"{config.save.name}_{sj}steps{ext}"),
                    jax.device_get(state.lora),
                    dtype=lora_io.numpy_precision(config.save.precision),
                )

            if tpu.state_checkpoint_every and sj % tpu.state_checkpoint_every == 0 and sj != 0:
                if mesh is not None:
                    # sharded save: each process writes only its own shards
                    # (training/checkpoint.py); resumable on a different mesh
                    from sliders_tpu.training import checkpoint as sharded_ckpt

                    sharded_ckpt.save_sharded(
                        str(save_dir / f"{config.save.name}_trainstate.orbax"), state
                    )
                else:
                    with open(save_dir / f"{config.save.name}_trainstate.msgpack", "wb") as f:
                        f.write(_state_bytes(state))
        i += n

    if tpu.profile_dir:
        jax.profiler.stop_trace()

    print("Saving...")
    lora_io.save_slider(
        str(save_dir / f"{config.save.name}_last{ext}"),
        jax.device_get(state.lora),
        dtype=lora_io.numpy_precision(config.save.precision),
    )
    print("Done.")
    return jax.device_get(state.lora)
