"""Image-slider training: paired ±scale supervision as ONE jitted step.

Reference semantics (trainscripts/imagesliders/train_lora-scale.py:180-335,
SURVEY.md §3.3), per iteration:
  1. pick scale s; pair the −s and +s folders; sample the SAME filename
  2. VAE-encode both images; add the SAME noise at the t_to grid timestep
     (get_noisy_image, imagesliders/train_util.py:199-235)
  3. with slider at +s: predict eps for the "high" image with the positive
     prompt; MSE against the injected noise
  4. with slider at −s: predict eps for the "low" image with the neutral
     prompt; MSE against the injected noise
  5. accumulate both gradients, single optimizer step

TPU re-design:
  - the two ±s passes are ONE batched UNet call using per-sample LoRA
    multipliers [+s, −s] (ops/basic.py); guidance 1 means no CFG doubling
    (identical math to the reference's batch-doubled call at g=1);
  - the reference also computes two frozen (slider-off) predictions that are
    DEAD CODE — never used in the loss (train_lora-scale.py:254-278); we
    skip them (~50% less UNet compute per iteration, bit-identical loss);
  - the reference's timestep quirk is reproduced exactly: noise is added at
    the 50-step-grid timestep ts50[t_to] while predictions run at the
    1000-grid timestep ts1000[t_to*1000/50] (train_lora-scale.py:228-250);
  - loss = MSE_high + MSE_low (sum, matching the accumulated backward).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sliders_tpu.diffusion.guidance import train_grid_tables
from sliders_tpu.diffusion.schedulers import DiffusionSchedule, Sampler
from sliders_tpu.models import unet2d, vae
from sliders_tpu.ops.basic import SliderLora
from sliders_tpu.training.text_slider import SliderTrainState


def make_image_slider_step(
    unet_cfg: unet2d.UNetConfig,
    vae_cfg: vae.VaeConfig,
    schedule: DiffusionSchedule,
    sampler: Sampler,
    optimizer: optax.GradientTransformation,
    *,
    max_denoising_steps: int = 50,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    is_xl: bool = False,
    mesh=None,
    donate: bool = True,
    chunk: int = 1,
):
    """step(state, unet_params, vae_params, batch) -> (new_state, metrics).

    `chunk > 1` scans N iterations per dispatch (see
    text_slider.make_text_slider_step); metrics come back stacked. The
    per-iteration leaves (images_low/images_high/scale — the reference
    resamples the folder pair every iteration, train_lora-scale.py:211-220)
    must then carry a leading (chunk,) axis and are scanned over; the
    prompt-embedding leaves stay unstacked and are transferred ONCE per
    dispatch. This keeps chunked dispatch protocol-honest AND amortizes the
    ~25 ms/dispatch tunnel overhead that dominates this 30 ms step.

    batch:
      images_low / images_high: (B, H, W, 3) float in [-1, 1], or uint8
        [0, 255] (normalized on DEVICE — 4x less host->device traffic
        through the tunnel; uint8 quantization is the reference's own
        regime, PIL resize output feeding VaeImageProcessor)
      scale: () — the iteration's slider scale s (>0)
      positive / neutral / unconditional: (L, D) prompt embeddings
      [+ pooled_* / time_ids for XL]
    """
    ts1000, scale1000 = train_grid_tables(schedule, sampler.kind)
    grid_stride = schedule.num_train_timesteps // max_denoising_steps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("dp"))

    def constrain_batch(x):
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, batch_sharding)
        return x

    def unet_fn(unet_params, x, t, ehs, mult, lora_weights, added):
        lora = SliderLora(weights=lora_weights, multiplier=mult)
        return unet2d.apply(
            unet_params, unet_cfg, x, t, ehs, added_cond=added, lora=lora, remat=remat
        )

    def step_fn(state: SliderTrainState, unet_params, vae_params, batch):
        key = jax.random.fold_in(state.key, state.step)
        k_t, k_post, k_noise = jax.random.split(key, 3)

        B = batch["images_high"].shape[0]
        t_to = jax.random.randint(k_t, (), 1, max_denoising_steps - 1)

        # VAE-encode both sides in one batch-2B call; posterior noise is
        # independent per image, the ADDED noise is shared within a pair
        # (reference re-seeds only randn_tensor, train_lora-scale.py:222-246)
        imgs = jnp.concatenate([batch["images_high"], batch["images_low"]])
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 127.5 - 1.0
        imgs = constrain_batch(imgs.astype(jnp.float32))
        mean, logvar = vae.encode(vae_params, vae_cfg, imgs)
        lat = vae.normalize_latents(vae_cfg, vae.sample_latents(mean, logvar, k_post))

        noise1 = jax.random.normal(k_noise, lat[:B].shape, lat.dtype)
        noise = jnp.concatenate([noise1, noise1])  # same noise for ±s
        t_add = sampler.timesteps[t_to].astype(jnp.int32)  # 50-grid value (reference quirk)
        noisy = schedule.add_noise(lat, noise, jnp.broadcast_to(t_add, (2 * B,)))

        t_idx = t_to * grid_stride
        t_cur = ts1000[t_idx]
        x_in = constrain_batch((noisy * scale1000[t_idx]).astype(compute_dtype))

        def rep(e):
            return jnp.broadcast_to(e, (B,) + e.shape).astype(compute_dtype)

        ehs = jnp.concatenate([rep(batch["positive"]), rep(batch["neutral"])])
        added = None
        if is_xl:
            added = {
                "text_embeds": jnp.concatenate(
                    [rep(batch["pooled_positive"]), rep(batch["pooled_neutral"])]
                ),
                "time_ids": jnp.concatenate(
                    [rep(batch["time_ids"]), rep(batch["time_ids"])]
                ),
            }

        s = batch["scale"]
        mult = jnp.concatenate(
            [jnp.full((B,), 1.0), jnp.full((B,), -1.0)]
        ) * s  # [+s ... , -s ...]

        noise_f32 = jax.lax.stop_gradient(noise.astype(jnp.float32))

        def loss_fn(lora_weights):
            eps = unet_fn(unet_params, x_in, t_cur, ehs, mult, lora_weights, added)
            diff = eps.astype(jnp.float32) - noise_f32
            # sum of the two per-side MSEs (reference accumulates both
            # backwards before one optimizer step)
            return 2.0 * jnp.mean(diff * diff)

        loss, grads = jax.value_and_grad(loss_fn)(state.lora)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)

        new_state = state.replace(step=state.step + 1, lora=lora, opt_state=opt_state)
        return new_state, {"loss": loss, "t_to": t_to, "scale": s}

    donate_argnums = (0,) if donate else ()
    if chunk == 1:
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    SCANNED = ("images_high", "images_low", "scale")

    def multi_fn(state, unet_params, vae_params, batch):
        xs = {k: batch[k] for k in SCANNED}
        static = {k: v for k, v in batch.items() if k not in SCANNED}

        def body(s, x):
            return step_fn(s, unet_params, vae_params, {**static, **x})

        return jax.lax.scan(body, state, xs, length=chunk)

    return jax.jit(multi_fn, donate_argnums=donate_argnums)
