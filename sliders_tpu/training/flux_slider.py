"""FLUX text-slider training (flow matching) as ONE jitted step.

The reference's FLUX training notebook is missing from its snapshot
(flux-sliders/.MISSING_LARGE_BLOBS); per SURVEY.md §2.3 the behavior is
specified by flux-sliders/utils/* + README: rank-r LoRA on the
FluxTransformer blocks, the same slider objective family, CLIP+T5 prompt
conditioning, FlowMatch-Euler schedule with resolution shift, no CFG
batch-doubling (guidance is an embedding, custom_flux_pipeline.py:687-692).

Structure mirrors training/text_slider.py in velocity space:
  1. sample t_to; partially integrate the flow from pure noise with the
     slider ON;
  2. predict velocities for positive/neutral/unconditional prompts with the
     slider OFF (one batched pass) and for the target prompt with the
     slider ON (grad pass);
  3. MSE against neutral ± g·(positive − unconditional).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from sliders_tpu.diffusion.schedulers import FlowMatchSampler
from sliders_tpu.lora.merge import merge_lora_weights
from sliders_tpu.models import flux
from sliders_tpu.training.text_slider import SliderTrainState


def make_flux_slider_step(
    cfg: flux.FluxConfig,
    sampler: FlowMatchSampler,
    optimizer: optax.GradientTransformation,
    *,
    resolution: int = 512,
    batch_size: int = 1,
    transformer_guidance: float = 1.0,  # guidance EMBEDDING value during training
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    mesh=None,
    donate: bool = True,
    trainable_mask=None,
    chunk: int = 1,
    pp_microbatches: int = 1,
):
    """step(state, flux_params, pairs) -> (new_state, metrics).

    `chunk > 1` scans N iterations per dispatch (see
    text_slider.make_text_slider_step); metrics come back stacked.

    pairs: stacked dict with t5 (n, L_t5, joint_dim) and pooled (n, pooled_dim)
    per prompt role + guidance_signed (n,).

    When `mesh` carries a ``pp`` axis, every transformer apply routes
    through parallel/pipeline.flux_apply_pp (layer-sharded block stacks,
    GPipe microbatching over `pp_microbatches`) — the capacity path that
    makes FULL FLUX-dev slider training fit a v5e-8 (its bf16 params alone
    exceed one chip's HBM). Pass flux_params pre-placed with
    parallel.pipeline.flux_pp_params; the slider then rides the stacked
    LoRA branch instead of the merged-weight path (per-layer name lookups
    cannot cross a traced stage index). dp composes: the batch shards over
    dp inside the same shard_map.
    """
    latent_hw = resolution // 8  # VAE factor 8, then 2x2 packing
    l_img = (latent_hw // 2) * (latent_hw // 2)
    img_ids = jnp.asarray(flux.image_ids(latent_hw, latent_hw))
    n_steps = sampler.num_steps

    use_pp = False
    pp_batch_axis = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sliders_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

        batch_sharding = NamedSharding(mesh, P("dp"))
        use_pp = PIPE_AXIS in mesh.axis_names
        if use_pp and mesh.shape[DATA_AXIS] > 1:
            pp_batch_axis = DATA_AXIS

    def constrain_batch(x):
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, batch_sharding)
        return x

    def model(params, lora_weights, mult, x, t_norm, pooled, txt):
        tids = jnp.asarray(flux.text_ids(txt.shape[1]))
        g = jnp.full((x.shape[0],), transformer_guidance) if cfg.guidance_embeds else None
        tb = jnp.broadcast_to(t_norm, (x.shape[0],))
        if use_pp:
            from sliders_tpu.ops.basic import SliderLora
            from sliders_tpu.parallel.pipeline import flux_apply_pp

            lora = None
            if mult is not None:
                lora = SliderLora(
                    weights=lora_weights,
                    multiplier=jnp.asarray(mult, jnp.float32),
                )
            return flux_apply_pp(
                params, cfg, x, tb, pooled, txt, tids, img_ids, mesh,
                guidance=g, lora=lora, num_microbatches=pp_microbatches,
                batch_axis=pp_batch_axis, remat=remat,
            )
        p = merge_lora_weights(params, lora_weights, mult) if mult is not None else params
        return flux.apply(
            p, cfg, x, tb, pooled, txt,
            tids, img_ids, guidance=g, remat=remat,
        )

    def rep(e):
        return jnp.broadcast_to(e, (batch_size,) + e.shape).astype(compute_dtype)

    def step_fn(state: SliderTrainState, params: dict, pairs: dict):
        key = jax.random.fold_in(state.key, state.step)
        k_pair, k_t, k_lat = jax.random.split(key, 3)

        n_pairs = pairs["target_t5"].shape[0]
        idx = jax.random.randint(k_pair, (), 0, n_pairs)
        pair = jax.tree.map(lambda a: a[idx], pairs)
        t_to = jax.random.randint(k_t, (), 1, n_steps)

        x = constrain_batch(
            jax.random.normal(
                k_lat, (batch_size, l_img, cfg.in_channels)
            ).astype(compute_dtype)
        )

        # partial flow integration with the slider ON (Euler steps);
        # merge once OUTSIDE the loop, STATIC scan with masked updates past
        # t_to (dynamic-trip loops pay ~55 ms/iter on this backend). Under
        # pp there is nothing to merge into (stacked per-stage params) —
        # the frozen slider rides the LoRA branch at multiplier 1 instead.
        if use_pp:
            dn_params = params
            dn_lora = jax.lax.stop_gradient(state.lora)
            dn_mult = 1.0
        else:
            dn_params = jax.lax.stop_gradient(
                merge_lora_weights(params, state.lora, 1.0)
            )
            dn_lora, dn_mult = None, None

        def body(xi, i):
            t_norm = sampler.timesteps[i] / 1000.0
            v = model(
                dn_params, dn_lora, dn_mult, xi, t_norm,
                rep(pair["target_pooled"]), rep(pair["target_t5"]),
            )
            x_new = sampler.step(i, v, xi).astype(compute_dtype)
            return jnp.where(i < t_to, x_new, xi), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_steps - 1))
        x = jax.lax.stop_gradient(x)
        t_norm = sampler.timesteps[t_to] / 1000.0

        # frozen velocities: one batched pass (positive, neutral, uncond)
        txt3 = jnp.concatenate(
            [rep(pair["positive_t5"]), rep(pair["neutral_t5"]), rep(pair["unconditional_t5"])]
        )
        pooled3 = jnp.concatenate(
            [rep(pair["positive_pooled"]), rep(pair["neutral_pooled"]), rep(pair["unconditional_pooled"])]
        )
        x3 = jnp.tile(x, (3, 1, 1))
        frozen = model(params, state.lora, None, x3, t_norm, pooled3, txt3)
        v_pos, v_neu, v_unc = jnp.split(
            jax.lax.stop_gradient(frozen.astype(jnp.float32)), 3, axis=0
        )
        goal = v_neu + pair["guidance_signed"] * (v_pos - v_unc)

        def loss_fn(lora_weights):
            v_t = model(
                params, lora_weights, 1.0, x, t_norm,
                rep(pair["target_pooled"]), rep(pair["target_t5"]),
            ).astype(jnp.float32)
            d = v_t - goal
            return jnp.mean(d * d)

        loss, grads = jax.value_and_grad(loss_fn)(state.lora)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        new_state = state.replace(step=state.step + 1, lora=lora, opt_state=opt_state)
        return new_state, {"loss": loss, "t_to": t_to, "pair": idx}

    donate_argnums = (0,) if donate else ()
    if chunk == 1:
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    def multi_fn(state, flux_params, pairs):
        def body(s, _):
            return step_fn(s, flux_params, pairs)

        return jax.lax.scan(body, state, None, length=chunk)

    return jax.jit(multi_fn, donate_argnums=donate_argnums)
