"""FLUX text-to-image sampling with slider gating.

Reimplements the behaviors of flux-sliders' custom FluxPipeline
(custom_flux_pipeline.py): CLIP-pooled + T5 dual encoding (:201-371), 2x2
latent packing + RoPE ids (:420-455), FlowMatch-Euler with
resolution-dependent mu shift (:67-137), guidance embedding (distilled CFG,
:687-692), and the slider hook — the LoRA is active only when the step index
exceeds `skip_slider_timestep_till` (:694-731).

TPU design: one lax.scan over steps; the gate is a branch-free where on the
step index; scalar slider scales use the merged-weight fast path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.diffusion.schedulers import FlowMatchSampler
from sliders_tpu.lora.merge import merge_lora_weights
from sliders_tpu.models import clip_text, flux, t5 as t5_mod


def encode_prompts_flux(models, prompts: list[str], t5_ids=None, max_t5_len: int = 512):
    """(pooled (B, 768), t5_embeds (B, L, 4096)). CLIP provides only the
    pooled projection; T5 provides the sequence features
    (custom_flux_pipeline.py:201-287)."""
    clip_ids = jnp.asarray(models.clip.tokenizer(prompts))
    clip_out = clip_text.apply(models.clip.params, clip_ids, models.clip.config)
    pooled = clip_out["pooler_output"]

    if t5_ids is None:
        if models.t5_tokenizer is None:
            raise RuntimeError(
                "T5 tokenizer unavailable (sentencepiece not installed); "
                "pass precomputed t5_ids"
            )
        enc = models.t5_tokenizer(
            prompts, padding="max_length", max_length=max_t5_len,
            truncation=True, return_tensors="np",
        )
        t5_ids = jnp.asarray(enc.input_ids)
    t5_embeds = t5_mod.apply(models.t5_params, t5_ids, models.t5_config)
    return pooled, t5_embeds


def make_flux_sampling_fn(
    cfg: flux.FluxConfig,
    sampler: FlowMatchSampler,
    *,
    latent_hw: int,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    num_microbatches: int = 1,
):
    """fn(params, packed_latents, pooled, t5_embeds, lora_weights,
    slider_scale, skip_slider_timestep_till, guidance, key_unused)
    -> packed latents after all steps.

    Slider gate: active when step index i > skip_slider_timestep_till
    (custom_flux_pipeline.py:703-711); pass -1 to keep it always on.

    ``slider_scale`` / ``skip_till`` / ``guidance`` may be per-row (B,)
    vectors (the serving engine's scale sweeps and coalesced batches), and
    ``lora_weights`` may be a per-row STACKED tree (lora/batch.py,
    multi-tenant FLUX serving). Scalar scales keep the merged-weight fast
    path; vector/stacked inputs use the per-row LoRA branch multiplier —
    same numerics, chosen at trace time by input shape.

    Pass a mesh with a ``pp`` axis to run the block stacks
    pipeline-parallel (parallel/pipeline.flux_apply_pp) — the capacity
    path for full FLUX-dev, which exceeds one v5e chip's HBM. Params
    should then be pre-placed with parallel.pipeline.flux_pp_params
    (layer-sharded). Under pp the gate cannot use the merged-weight fast
    path (per-layer name lookups don't cross a traced stage index), so it
    becomes a branch-free ``scale * (i > skip_till)`` LoRA multiplier —
    the same numerics, one shared compiled program."""
    n = sampler.num_steps
    img_ids_arr = jnp.asarray(flux.image_ids(latent_hw, latent_hw))
    use_pp = mesh is not None
    if use_pp:
        from sliders_tpu.parallel.mesh import PIPE_AXIS

        if PIPE_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh has no '{PIPE_AXIS}' axis: {mesh.axis_names}")

    def fn(params, latents, pooled, t5_embeds, lora_weights, slider_scale,
           skip_till, guidance):
        latents = latents.astype(compute_dtype)
        tids = jnp.asarray(flux.text_ids(t5_embeds.shape[1]))
        B = latents.shape[0]
        g = jnp.broadcast_to(guidance, (B,)) if cfg.guidance_embeds else None

        # per-row scales / stacked adapters can't pre-merge one delta tree;
        # they ride the LoRA branch with a (B,) multiplier instead
        per_row = jnp.ndim(slider_scale) > 0
        if lora_weights is not None and not per_row:
            from sliders_tpu.lora.batch import is_stacked

            per_row = is_stacked(lora_weights)
        deltas = None
        if lora_weights is not None and not use_pp and not per_row:
            from sliders_tpu.lora.merge import lora_deltas

            deltas = lora_deltas(lora_weights, slider_scale)

        def body(x, i):
            t_norm = jnp.broadcast_to(sampler.timesteps[i] / 1000.0, (B,))
            lora = None
            if lora_weights is not None and (use_pp or per_row):
                from sliders_tpu.ops.basic import SliderLora

                gated = slider_scale * jnp.where(i > skip_till, 1.0, 0.0)
                lora = SliderLora(weights=lora_weights, multiplier=gated)
            if use_pp:
                from sliders_tpu.parallel.pipeline import flux_apply_pp

                v = flux_apply_pp(
                    params, cfg, x, t_norm, pooled.astype(compute_dtype),
                    t5_embeds.astype(compute_dtype), tids, img_ids_arr, mesh,
                    guidance=g, lora=lora, num_microbatches=num_microbatches,
                )
            else:
                p = params
                if deltas is not None:
                    from sliders_tpu.lora.merge import add_deltas

                    p = add_deltas(params, deltas, jnp.where(i > skip_till, 1.0, 0.0))
                v = flux.apply(
                    p, cfg, x, t_norm, pooled.astype(compute_dtype),
                    t5_embeds.astype(compute_dtype), tids, img_ids_arr,
                    guidance=g, lora=lora,
                )
            return sampler.step(i, v, x).astype(compute_dtype), None

        x, _ = jax.lax.scan(body, latents, jnp.arange(n))
        return x

    return jax.jit(fn)


def initial_packed_latents(key, batch: int, height: int, width: int, latent_channels: int = 16):
    """Pure-noise packed latents for a height x width pixel canvas."""
    h, w = height // 8, width // 8
    lat = jax.random.normal(key, (batch, h, w, latent_channels))
    return flux.pack_latents(lat)
