"""Real-image editing: DDIM inversion + null-text optimization + slider
re-sampling.

Reference behavior (demo_image_editing.ipynb cells 3-10, SURVEY.md §3.5):
  1. DDIM-invert the VAE latent of a real image with conditional-only
     predictions (50 reverse `next_step`s);
  2. per timestep, optimize the unconditional embedding with Adam
     (lr 1e-2·(1−i/100), ≤10 inner steps, early stop at eps+i·2e-5) so the
     CFG trajectory reconstructs the recorded inversion trajectory;
  3. re-sample from x_T with the per-step optimized uncond embeddings and
     the slider gated at start_noise (500 in the notebook).

TPU re-design: inversion is one `lax.scan`; the null-text optimization is a
single jitted scan over timesteps with a `lax.while_loop` inner Adam loop
that exits early once the loss passes the threshold (the notebook's
`break`), skipping the remaining UNet evals instead of masking them. The
conditional eps is computed ONCE per timestep and reused across the inner
loop and the trajectory advance — it does not depend on the optimized
embedding, and the notebook hoists it the same way (`noise_pred_cond` is
computed before the inner loop, demo_image_editing.ipynb null_optimization).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from sliders_tpu.diffusion.schedulers import Sampler
from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora


def make_ddim_inversion_fn(unet_cfg: unet2d.UNetConfig, sampler: Sampler, compute_dtype=jnp.float32):
    """fn(unet_params, clean_latents, cond_emb) -> trajectory (n+1, B, ...)
    with traj[0] = x_T (most noisy) and traj[n] = the clean latents."""
    n = sampler.num_steps

    def fn(unet_params, latents, cond_emb):
        latents = latents.astype(compute_dtype)

        def body(x, i):
            eps = unet2d.apply(
                unet_params, unet_cfg, x, sampler.timesteps[i], cond_emb
            )
            x = sampler.ddim_inverse_step(i, eps, x).astype(compute_dtype)
            return x, x

        # i = n-1 .. 0 (adding noise)
        x_T, traj_rev = jax.lax.scan(body, latents, jnp.arange(n - 1, -1, -1))
        # traj_rev[k] is the latent at position n-1-k; reorder to position i
        traj = jnp.flip(traj_rev, axis=0)  # traj[i] = latent at position i
        traj = jnp.concatenate([traj, latents[None]], axis=0)
        return traj

    return jax.jit(fn)


def make_null_text_optimizer(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    guidance_scale: float = 7.5,
    num_inner_steps: int = 10,
    base_lr: float = 1e-2,
    epsilon: float = 1e-5,
    compute_dtype=jnp.float32,
):
    """fn(unet_params, traj, cond_emb, uncond_emb) -> (n, B, L, D) per-step
    optimized uncond embeddings."""
    n = sampler.num_steps

    def fn(unet_params, traj, cond_emb, uncond_emb):
        def outer(carry, i):
            x = carry
            target = traj[i + 1]
            lr = base_lr * (1.0 - i.astype(jnp.float32) / 100.0)
            tx = optax.adam(lr)
            threshold = epsilon + i.astype(jnp.float32) * 2e-5

            # hoisted: the conditional eps does not depend on u (and x is
            # fixed across the inner loop) — one forward per timestep
            eps_c = unet2d.apply(unet_params, unet_cfg, x, sampler.timesteps[i], cond_emb)

            def loss_fn(u):
                eps_u = unet2d.apply(unet_params, unet_cfg, x, sampler.timesteps[i], u)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                x_prev, _ = sampler.step(i, eps, x, {})
                d = (x_prev - target).astype(jnp.float32)
                return jnp.mean(d * d)

            # notebook break semantics: apply the update that crossed the
            # threshold, then stop — remaining UNet evals are actually
            # skipped (while_loop), not masked
            def inner_cond(state):
                j, _, _, done = state
                return jnp.logical_and(j < num_inner_steps, jnp.logical_not(done))

            def inner_body(state):
                j, u, opt_state, _ = state
                loss, g = jax.value_and_grad(loss_fn)(u)
                updates, opt_state = tx.update(g, opt_state, u)
                u = optax.apply_updates(u, updates)
                return j + 1, u, opt_state, loss < threshold

            u0 = uncond_emb
            _, u, _, _ = jax.lax.while_loop(
                inner_cond, inner_body,
                (jnp.asarray(0), u0, tx.init(u0), jnp.asarray(False)),
            )

            # advance the trajectory with the optimized uncond (eps_c reused)
            eps_u = unet2d.apply(unet_params, unet_cfg, x, sampler.timesteps[i], u)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            x_next, _ = sampler.step(i, eps, x, {})
            return x_next.astype(compute_dtype), u

        _, uncond_per_step = jax.lax.scan(outer, traj[0], jnp.arange(n))
        return uncond_per_step

    return jax.jit(fn)


def make_edit_sampling_fn(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    guidance_scale: float = 7.5,
    compute_dtype=jnp.float32,
):
    """Sampling from x_T with PER-STEP uncond embeddings (null-text) and the
    slider gated by start_noise (notebook cell 10 uses start_noise=500).

    `slider_scale` may be a scalar (merged-delta path) or a (batch,) vector
    of per-sample scales — the whole scale sweep of notebook cell 10 as ONE
    batched denoise (same design as text2image.make_sampling_fn)."""
    n = sampler.num_steps

    def fn(unet_params, x_T, cond_emb, uncond_per_step, lora_weights, slider_scale, start_noise):
        deltas = None
        vector = lora_weights is not None and jnp.ndim(slider_scale) == 1
        if lora_weights is not None and not vector:
            from sliders_tpu.lora.merge import lora_deltas

            deltas = lora_deltas(lora_weights, slider_scale)

        def body(carry, i):
            x, s_state = carry
            t = sampler.timesteps[i]
            params, lora = unet_params, None
            if deltas is not None:
                from sliders_tpu.lora.merge import add_deltas

                params = add_deltas(unet_params, deltas, jnp.where(t > start_noise, 0.0, 1.0))
            elif vector:
                mult = jnp.where(t > start_noise, 0.0, slider_scale)
                lora = SliderLora(
                    weights=lora_weights, multiplier=jnp.concatenate([mult, mult])
                )
            ehs = jnp.concatenate([uncond_per_step[i], cond_emb])
            x2 = jnp.concatenate([x, x])
            eps = unet2d.apply(params, unet_cfg, x2, t, ehs, lora=lora)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            x, s_state = sampler.step(i, eps, x, s_state)
            return (x.astype(compute_dtype), s_state), None

        (x, _), _ = jax.lax.scan(
            body, (x_T.astype(compute_dtype), sampler.init_state(x_T)), jnp.arange(n)
        )
        return x

    return jax.jit(fn)


def edit_image(
    models,
    image,  # (H, W, 3) in [-1, 1]
    prompt: str,
    slider_weights: Optional[dict],
    scales=(0.0, 1.0),
    *,
    num_steps: int = 50,
    start_noise: float = 500.0,
    guidance_scale: float = 7.5,
    num_inner_steps: int = 10,
    key=None,
):
    """Full editing flow; returns {scale: uint8 image}."""
    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.models import vae as vae_mod
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.encoding import encode_prompts

    key = key if key is not None else jax.random.key(0)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps)
    te = models.text_encoders[0]
    cond = encode_prompts(te.tokenizer, te.params, te.config, [prompt],
                          num_layers=te.clip_skip_layers)
    uncond = encode_prompts(te.tokenizer, te.params, te.config, [""],
                            num_layers=te.clip_skip_layers)

    mean, logvar = vae_mod.encode(models.vae_params, models.vae_config, image[None].astype(jnp.float32))
    lat = mean * models.vae_config.scaling_factor  # mode, not sample (notebook)

    invert = make_ddim_inversion_fn(models.unet_config, sampler)
    traj = invert(models.unet_params, lat, cond)

    null_opt = make_null_text_optimizer(
        models.unet_config, sampler,
        guidance_scale=guidance_scale, num_inner_steps=num_inner_steps,
    )
    uncond_per_step = null_opt(models.unet_params, traj, cond, uncond)

    edit_fn = make_edit_sampling_fn(
        models.unet_config, sampler, guidance_scale=guidance_scale
    )
    # the whole scale sweep (notebook cell 10 loops scales [0,2,4] through
    # the full 50-step loop each) is ONE batched denoise here: per-sample
    # LoRA multipliers, len(scales)x fewer UNet programs
    ns = len(scales)
    if slider_weights is None:
        x = edit_fn(
            models.unet_params, traj[0], cond, uncond_per_step,
            None, jnp.asarray(0.0), jnp.asarray(start_noise),
        )
        img = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
        return {s: img[0] for s in scales}
    x = edit_fn(
        models.unet_params,
        jnp.tile(traj[0], (ns, 1, 1, 1)),
        jnp.tile(cond, (ns, 1, 1)),
        jnp.tile(uncond_per_step, (1, ns, 1, 1)),
        slider_weights,
        jnp.asarray([float(s) for s in scales]),
        jnp.asarray(start_noise),
    )
    imgs = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
    return {s: imgs[i] for i, s in enumerate(scales)}
