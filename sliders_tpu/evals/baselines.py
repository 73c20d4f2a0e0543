"""Baseline methods the reference eval harness compares sliders against
(SURVEY.md §2.4).

- UCE (unified concept editing): full-model weight-delta interpolation
  `old + scale * (edited - old)` per slider scale, swapped in mid-sampling
  at the start_noise boundary (eval-scripts/generate_images-uce.py:106-111,
  193-215). With our two-segment sampler this is just: segment 1 runs the
  base params, segment 2 runs the interpolated params.

- Textual inversion: a learned token embedding injected into the prompt
  (eval-scripts/generate_images_textinversion.py:20-36): we splice the
  learned vector(s) into the token-embedding matrix under a placeholder id.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sliders_tpu.diffusion.schedulers import Sampler
from sliders_tpu.models import unet2d
from sliders_tpu.utils import pytree


def interpolate_params(old: dict, edited: dict, scale) -> dict:
    """UCE per-scale model: old + scale * (edited - old), leafwise."""
    return jax.tree.map(
        lambda a, b: (
            a.astype(jnp.float32) + scale * (b.astype(jnp.float32) - a.astype(jnp.float32))
        ).astype(a.dtype),
        old,
        edited,
    )


def make_uce_sampling_fn(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    guidance_scale_default: float = 7.5,
    compute_dtype=jnp.bfloat16,
):
    """fn(old_params, edited_params, latents, cond, uncond, scale,
    start_noise, guidance_scale, key) — base weights while t > start_noise,
    the scale-interpolated weights after (the reference's state_dict swap)."""
    from sliders_tpu.diffusion.guidance import cfg_combine

    n = sampler.num_steps
    needs_step_key = sampler.kind in ("ddpm", "euler_a")

    def fn(old_params, edited_params, latents, cond, uncond, scale, start_noise,
           guidance_scale, key):
        ehs = jnp.concatenate([uncond, cond]).astype(compute_dtype)
        interp = interpolate_params(old_params, edited_params, scale)

        def make_body(p):
            def body(i, carry):
                x, s_state = carry
                x2 = sampler.scale_model_input(jnp.concatenate([x, x]), i).astype(compute_dtype)
                eps = unet2d.apply(p, unet_cfg, x2, sampler.timesteps[i], ehs)
                eps = cfg_combine(eps, guidance_scale)
                k = jax.random.fold_in(key, i) if needs_step_key else None
                x, s_state = sampler.step(i, eps, x, s_state, key=k)
                return (x.astype(compute_dtype), s_state)
            return body

        active = sampler.timesteps <= start_noise
        boundary = jnp.where(jnp.any(active), jnp.argmax(active), n)
        carry = (latents.astype(compute_dtype), sampler.init_state(latents))
        carry = jax.lax.fori_loop(0, boundary, make_body(old_params), carry)
        carry = jax.lax.fori_loop(boundary, n, make_body(interp), carry)
        return carry[0]

    return jax.jit(fn)


def apply_custom_diffusion(unet_params: dict, state: dict, unet_cross_attn_paths=None) -> dict:
    """Custom-diffusion baseline (eval-scripts/generate_images_customdiffusion.py):
    fine-tuned cross-attention K/V projections are loaded over the base UNet
    (the method trains only attn2 to_k/to_v + a modifier token embedding).

    `state`: flat dict of torch-layout weights keyed like
    'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight'
    (any 'unet.' prefix is stripped)."""
    flat = pytree.flatten(unet_params)
    out = dict(flat)
    n = 0
    for k, w in state.items():
        k = k.removeprefix("unet.")
        if not (("attn2.to_k" in k or "attn2.to_v" in k) and k.endswith(".weight")):
            continue
        if k not in out:
            raise KeyError(f"custom-diffusion weight {k} not in UNet")
        import numpy as np

        out[k] = jnp.asarray(np.asarray(w).T, out[k].dtype)  # (out,in)->(in,out)
        n += 1
    if n == 0:
        raise ValueError("no attn2 K/V weights found in the checkpoint")
    return pytree.unflatten(out)


def inject_learned_token(
    te_params: dict, learned_embeddings: jnp.ndarray, token_ids: list[int]
) -> dict:
    """Textual-inversion baseline: write learned vectors into the token
    embedding rows `token_ids` (the reference loads a <token> embedding and
    adds it to the tokenizer/prompt)."""
    flat = pytree.flatten(te_params)
    key = "text_model.embeddings.token_embedding.weight"
    emb = flat[key]
    if learned_embeddings.ndim == 1:
        learned_embeddings = learned_embeddings[None]
    emb = emb.at[jnp.asarray(token_ids)].set(learned_embeddings.astype(emb.dtype))
    flat = dict(flat)
    flat[key] = emb
    return pytree.unflatten(flat)
