"""Text-to-image sampling with slider-scale gating.

The reference inference twist (SURVEY.md §3.4; generate_images_xl.py:323-362
and the open-coded SD1 loop in generate_images_sd1.py:129-211): a stock
denoising loop where (a) the LoRA multiplier is the user's slider scale and
(b) the slider is OFF for early timesteps (t > start_noise) to preserve
structure.

TPU re-design: the whole sampling loop is one `lax.scan`; the gating is a
`jnp.where` on the traced timestep (branch-free), and the slider scale is a
traced scalar — a single compiled program serves every (scale, start_noise)
pair and every checkpoint of the same rank layout, including SDXL-Turbo
few-step sampling (num_steps=3, guidance 1 -> no CFG batch doubling,
demo_SDXL_Turbo.ipynb cell 6).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.diffusion.guidance import cfg_combine, rescale_noise_cfg
from sliders_tpu.diffusion.schedulers import Sampler
from sliders_tpu.models import unet2d, vae
from sliders_tpu.ops.basic import SliderLora


def make_sampling_fn(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    compute_dtype=jnp.bfloat16,
    is_xl: bool = False,
    mesh=None,
):
    """Build a jitted sampling fn:

    fn(unet_params, latents, cond_emb, uncond_emb, lora_weights,
       slider_scale, start_noise, guidance_scale, key, added_cond) -> latents

    - `latents` are the initial noise * sampler.init_noise_sigma
    - `lora_weights` may be None (no slider)
    - `start_noise`: slider is OFF while t > start_noise
      (generate_images_xl.py:325-328; -1 keeps it always off, 1000 always on)
    - with a VECTOR `slider_scale`, `start_noise` and `guidance_scale` may
      also be per-row (B,) vectors — the serving engine batches requests
      with different gates/strengths into one denoise. The scalar-scale
      merged-delta fast path requires scalar start_noise.
    - `mesh`: optional dp mesh — the sweep batch (latents / embeddings /
      scale vector / added conds) is row-sharded over the ``dp`` axis and
      params are replicated, so a 500-prompt eval sweep scales across
      chips (SURVEY.md §7.1 "scale sweeps batched across the mesh"). The
      batch must be a multiple of the dp size, `slider_scale` must be a
      batch vector, and all 10 args must be passed (in_shardings are
      positional).
    """
    needs_step_key = sampler.kind in ("ddpm", "euler_a")
    n = sampler.num_steps

    def fn(
        unet_params,
        latents,
        cond_emb,
        uncond_emb,
        lora_weights,
        slider_scale,
        start_noise,
        guidance_scale,
        key,
        added_cond: Optional[dict] = None,
    ):
        latents = latents.astype(compute_dtype)
        if use_cfg:
            ehs = jnp.concatenate([uncond_emb, cond_emb]).astype(compute_dtype)
            added = (
                None
                if added_cond is None
                else {k: jnp.concatenate([added_cond["uncond_" + k], added_cond[k]]) for k in ("text_embeds", "time_ids")}
            )
        else:
            ehs = cond_emb.astype(compute_dtype)
            added = (
                None
                if added_cond is None
                else {k: added_cond[k] for k in ("text_embeds", "time_ids")}
            )

        # all paths are a single STATIC lax.scan (dynamic-trip loops pay a
        # large per-iteration cost on this backend). Scalar slider scales
        # gate via a precomputed full-rank delta added to the targeted
        # weights each step (lora/merge.py add_deltas — a cheap elementwise
        # add); vector scales use per-sample LoRA branch multipliers.
        deltas = None
        stacked = False
        if lora_weights is not None:
            from sliders_tpu.lora.batch import is_stacked

            # per-row stacked adapters (multi-slider serving batch): the
            # row axis must be CFG-doubled to line up with x_in's rows
            stacked = is_stacked(lora_weights)
            if stacked and use_cfg:
                lora_weights = jax.tree.map(
                    lambda w: jnp.concatenate([w, w]), lora_weights
                )
        if lora_weights is not None and not stacked and jnp.ndim(slider_scale) == 0:
            from sliders_tpu.lora.merge import lora_deltas

            deltas = lora_deltas(lora_weights, slider_scale)

        def body(carry, i):
            x, s_state = carry
            t = sampler.timesteps[i]
            params, lora = unet_params, None
            if deltas is not None:
                from sliders_tpu.lora.merge import add_deltas

                gate = jnp.where(t > start_noise, 0.0, 1.0)
                params = add_deltas(unet_params, deltas, gate)
            elif lora_weights is not None:
                mult = jnp.where(t > start_noise, 0.0, slider_scale)
                if use_cfg and jnp.ndim(mult) > 0:
                    # CFG-doubled rows; a scalar multiplier broadcasts as-is
                    mult = jnp.concatenate([mult, mult])
                lora = SliderLora(weights=lora_weights, multiplier=mult)
            x_in = jnp.concatenate([x, x]) if use_cfg else x
            x_in = sampler.scale_model_input(x_in, i).astype(compute_dtype)
            eps = unet2d.apply(
                params, unet_cfg, x_in, t, ehs, added_cond=added, lora=lora
            )
            if use_cfg:
                eps_text = jnp.split(eps, 2, axis=0)[1]
                eps = cfg_combine(eps, guidance_scale)
                if guidance_rescale > 0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            step_key = jax.random.fold_in(key, i) if needs_step_key else None
            x, s_state = sampler.step(i, eps, x, s_state, key=step_key)
            return (x.astype(compute_dtype), s_state), None

        (x, _), _ = jax.lax.scan(
            body, (latents, sampler.init_state(latents)), jnp.arange(n)
        )
        return x

    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from sliders_tpu.parallel.mesh import DATA_AXIS

    batch = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        # (params, latents, cond, uncond, lora, scale_vec, start_noise,
        #  guidance, key, added) — batch-major rows over dp, rest replicated
        in_shardings=(repl, batch, batch, batch, repl, batch, repl, repl, repl, batch),
        out_shardings=batch,
    )


def make_continuous_step_fn(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    chunk: int,
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    compute_dtype=jnp.bfloat16,
):
    """Build the jitted CHUNK program for step-level continuous batching
    (serving/server.py): one fixed-bucket row batch where every row sits at
    its OWN step position, advanced `chunk` denoise steps per call.

    fn(unet_params, x, s_state, step_idx, cond_emb, uncond_emb,
       lora_weights, slider_scale, start_noise, guidance_scale, added_cond)
      -> (x, s_state)

    - `step_idx` is the per-row (B,) int32 step position at call entry; a
      row advances while step_idx < num_steps and freezes after (both its
      latent and its sampler-state column), so finished rows hold their
      final latents and free slots never move. The caller tracks positions
      host-side (they advance deterministically by `chunk`), so nothing
      needs fetching between chunks.
    - `lora_weights` is a per-row stacked tree (lora/batch.py) or None
      (slider-less batch — a separate, LoRA-free executable).
    - Per-row math is identical to make_sampling_fn's loop body with the
      scalar step index replaced by the per-row gather (same tables, same
      elementwise ops), which is what makes a row's trajectory bit-equal
      to the whole-loop program at the same batch size — pinned by
      tests/test_serving.py.

    Stochastic samplers (ddpm/euler_a) draw one noise tensor per step for
    the whole batch, so a row's noise would depend on when it joined;
    they are rejected. The reference loop this segments is
    generate_images_xl.py:323-362."""
    if sampler.kind in ("ddpm", "euler_a"):
        raise NotImplementedError(
            f"continuous batching does not support the stochastic "
            f"'{sampler.kind}' sampler (per-step batch-shared noise would "
            "make a row's output depend on co-riders); use ddim or lms"
        )
    n = sampler.num_steps

    def fn(
        unet_params,
        x,
        s_state,
        step_idx,
        cond_emb,
        uncond_emb,
        lora_weights,
        slider_scale,
        start_noise,
        guidance_scale,
        added_cond: Optional[dict] = None,
    ):
        if use_cfg:
            ehs = jnp.concatenate([uncond_emb, cond_emb]).astype(compute_dtype)
            added = (
                None
                if added_cond is None
                else {
                    k: jnp.concatenate(
                        [added_cond["uncond_" + k], added_cond[k]]
                    )
                    for k in ("text_embeds", "time_ids")
                }
            )
        else:
            ehs = cond_emb.astype(compute_dtype)
            added = (
                None
                if added_cond is None
                else {k: added_cond[k] for k in ("text_embeds", "time_ids")}
            )
        weights = lora_weights
        if weights is not None and use_cfg:
            weights = jax.tree.map(lambda w: jnp.concatenate([w, w]), weights)

        def body(carry, k):
            x, s_state = carry
            idx = step_idx + k  # (B,)
            adv = idx < n
            i = jnp.clip(idx, 0, n - 1)
            t = sampler.timesteps[i]  # (B,)
            lora = None
            if weights is not None:
                mult = jnp.where(t > start_noise, 0.0, slider_scale)
                if use_cfg:
                    mult = jnp.concatenate([mult, mult])
                lora = SliderLora(weights=weights, multiplier=mult)
            x_in = jnp.concatenate([x, x]) if use_cfg else x
            i_in = jnp.concatenate([i, i]) if use_cfg else i
            x_in = sampler.scale_model_input(x_in, i_in).astype(compute_dtype)
            t_in = jnp.concatenate([t, t]) if use_cfg else t
            eps = unet2d.apply(
                unet_params, unet_cfg, x_in, t_in, ehs, added_cond=added,
                lora=lora,
            )
            if use_cfg:
                eps_text = jnp.split(eps, 2, axis=0)[1]
                eps = cfg_combine(eps, guidance_scale)
                if guidance_rescale > 0:
                    eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
            x_new, s_new = sampler.step(i, eps, x, s_state)
            # freeze finished/free rows: latents row-major, sampler-state
            # leaves history-major ((ORDER, B, ...) — the LMS derivs carry)
            adv_x = adv.reshape((-1,) + (1,) * (x.ndim - 1))
            x = jnp.where(adv_x, x_new.astype(compute_dtype), x)
            s_state = jax.tree.map(
                lambda new, old: jnp.where(
                    adv.reshape((1, -1) + (1,) * (new.ndim - 2)), new, old
                ),
                s_new, s_state,
            )
            return (x, s_state), None

        (x, s_state), _ = jax.lax.scan(
            body, (x.astype(compute_dtype), s_state), jnp.arange(chunk)
        )
        return x, s_state

    return jax.jit(fn, donate_argnums=(1, 2))


def initial_latents(key, batch, height, width, init_noise_sigma, channels=4, n_prompts=1):
    """train_util.get_initial_latents semantics (train_util.py:43-57):
    noise repeated across prompts, scaled by init_noise_sigma. NHWC."""
    noise = jax.random.normal(key, (batch, height // 8, width // 8, channels))
    noise = jnp.tile(noise, (n_prompts, 1, 1, 1))
    return noise * init_noise_sigma


def decode_images(vae_params, vae_cfg: vae.VaeConfig, latents) -> jnp.ndarray:
    """latents -> uint8 HWC images (applies the scaling/shift factors and the
    [-1,1]->[0,255] postprocess of the reference pipelines)."""
    imgs = vae.decode(
        vae_params, vae_cfg, vae.denormalize_latents(vae_cfg, latents).astype(jnp.float32)
    )
    imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
    return (imgs * 255).astype(jnp.uint8)


def encode_conditioning(models, prompt: str, negative: str, image_size: int):
    """Encode one (prompt, negative) pair into sampler conditioning: returns
    (cond [1,77,D], uncond [1,77,D], added-cond 1-row dict or None).

    Shared by cli/generate_images.py and serving/server.py so the XL
    added-cond contract (pooled embeds + time ids, train_util.py:298-333)
    lives in exactly one place."""
    from sliders_tpu.pipelines.encoding import encode_prompts, encode_prompts_xl

    if models.is_xl:
        toks = [te.tokenizer for te in models.text_encoders]
        ps = [te.params for te in models.text_encoders]
        cs = [te.config for te in models.text_encoders]
        cond, pooled_c = encode_prompts_xl(toks, ps, cs, [prompt])
        uncond, pooled_u = encode_prompts_xl(toks, ps, cs, [negative])
        tid = get_add_time_ids(image_size, image_size)
        added = {
            "text_embeds": pooled_c,
            "time_ids": tid,
            "uncond_text_embeds": pooled_u,
            "uncond_time_ids": tid,
        }
        return cond, uncond, added
    te = models.text_encoders[0]
    cond = encode_prompts(
        te.tokenizer, te.params, te.config, [prompt], num_layers=te.clip_skip_layers
    )
    uncond = encode_prompts(
        te.tokenizer, te.params, te.config, [negative], num_layers=te.clip_skip_layers
    )
    return cond, uncond, None


def tile_conditioning(cond, uncond, added, n: int):
    """Tile 1-row conditioning from encode_conditioning to an n-row batch."""
    return (
        jnp.tile(cond, (n, 1, 1)),
        jnp.tile(uncond, (n, 1, 1)),
        None if added is None else {k: jnp.tile(v, (n, 1)) for k, v in added.items()},
    )


def get_add_time_ids(
    height: int,
    width: int,
    dynamic_crops: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """SDXL micro-conditioning ids (train_util.get_add_time_ids,
    train_util.py:298-333): (original_size, crop_top_left, target_size)."""
    if dynamic_crops:
        if key is None:
            raise ValueError("dynamic_crops needs a key")
        k1, k2, k3 = jax.random.split(key, 3)
        scale = jax.random.uniform(k1, (), minval=1.0, maxval=3.0)
        oh = jnp.floor(height * scale)
        ow = jnp.floor(width * scale)
        top = jnp.floor(jax.random.uniform(k2, (), maxval=1.0) * (oh - height))
        left = jnp.floor(jax.random.uniform(k3, (), maxval=1.0) * (ow - width))
        ids = jnp.stack([oh, ow, top, left, jnp.asarray(float(height)), jnp.asarray(float(width))])
    else:
        ids = jnp.asarray([height, width, 0, 0, height, width], jnp.float32)
    return ids[None, :]  # (1, 6)
