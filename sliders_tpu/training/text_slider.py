"""Text-slider training: the reference hot loop as ONE jitted TPU step.

Reference semantics (trainscripts/textsliders/train_lora.py:155-309, §3.1 of
SURVEY.md), per iteration:
  1. sample a prompt pair and t_to ∈ [1, max_denoising_steps)
  2. from pure noise, partially denoise t_to steps on the
     max_denoising_steps-grid with the slider ON at guidance 3
  3. jump to the 1000-grid timestep ts1000[t_to * 1000/max_steps]
  4. frozen eps for positive / neutral / unconditional prompts (slider OFF)
  5. eps for the target prompt with the slider ON (grad pass)
  6. MSE against neutral ± guidance·(positive − unconditional)

TPU re-design (not a translation):
  - the whole iteration is one compiled function; pair index, t_to and all
    noise come from a folded PRNG key, so steps are reproducible/resumable;
  - the partial denoise is a `lax.fori_loop` with traced trip count — one
    compile serves every t_to;
  - the three frozen eps passes run as ONE batched UNet call (guidance 1
    makes the reference's CFG-doubled pass mathematically equal to the
    plain conditional prediction, so 3 CFG pairs = batch-of-3, ~2.3x less
    frozen-pass compute than the reference);
  - erase/enhance folds into the SIGN of the guidance scalar
    (erase == enhance with −g), so one program serves both actions;
  - LoRA on/off is the traced multiplier (1.0 vs 0.0) — no recompiles;
  - batch is shardable over the mesh dp axis; the loss mean makes XLA psum
    the LoRA grads.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sliders_tpu.diffusion.guidance import train_grid_tables
from sliders_tpu.diffusion.schedulers import DiffusionSchedule, Sampler
from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora


@struct.dataclass
class SliderTrainState:
    step: jax.Array
    lora: dict
    opt_state: Any
    key: jax.Array

    @classmethod
    def create(cls, key: jax.Array, lora: dict, optimizer) -> "SliderTrainState":
        return cls(
            step=jnp.asarray(0, jnp.int32),
            lora=lora,
            opt_state=optimizer.init(lora),
            key=key,
        )


def stack_prompt_pairs(pairs: list[dict]) -> dict:
    """Stack per-pair embedding dicts into arrays with a leading pair axis.

    Each pair dict: target/positive/neutral/unconditional (L, D) [+ pooled_*
    (Dp,) and time_ids (6,) for XL] + guidance_signed scalar (+g enhance,
    −g erase — reference guidance_scale with the action folded in).
    """
    keys = pairs[0].keys()
    return {k: jnp.stack([jnp.asarray(p[k]) for p in pairs]) for k in keys}


def make_text_slider_step(
    unet_cfg: unet2d.UNetConfig,
    schedule: DiffusionSchedule,
    sampler: Sampler,
    optimizer: optax.GradientTransformation,
    *,
    max_denoising_steps: int = 50,
    resolution: int = 512,
    batch_size: int = 1,
    denoise_guidance: float = 3.0,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    mesh=None,
    is_xl: bool = False,
    donate: bool = True,
    denoise_merged: bool = False,
    fused_tail: bool = False,
    chunk: int = 1,
):
    """Build the jitted train step:
    step(state, unet_params, pairs) -> (new_state, metrics).

    `chunk > 1` scans `chunk` reference iterations inside ONE compiled
    program (metrics come back stacked with a leading (chunk,) axis).
    Per-step semantics are identical — pair/t_to/noise RNG folds in the
    per-step counter either way — but host->device dispatch overhead
    (measured ~70 ms/step through remote-device tunnels, BASELINE.md) is
    paid once per chunk. Checkpoint granularity coarsens to chunk
    boundaries; `tpu.steps_per_call` wires this through the driver."""
    ts1000, scale1000 = train_grid_tables(schedule, sampler.kind)
    grid_stride = schedule.num_train_timesteps // max_denoising_steps
    if isinstance(resolution, tuple):
        height, width = resolution  # dynamic-resolution bucket
    else:
        height = width = resolution
    latent_h, latent_w = height // 8, width // 8
    needs_step_key = sampler.kind in ("ddpm", "euler_a")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("dp"))

    def constrain_batch(x):
        """Shard a (rows, ...) tensor's leading dim over the dp mesh axis.

        Applied to the per-iteration latents AND to every internal fan-out
        batch: the CFG-doubled denoise input (2B rows) and the frozen
        positive/neutral/unconditional pass (3B rows). The reference
        protocol is batch_size=1, so plain batch-dp cannot use a mesh —
        but the fan-outs are embarrassingly parallel (SURVEY.md §5.8), and
        sharding their row axis lets a (dp>=2, tp) mesh split the dominant
        denoise-loop UNet call across chips. The per-iteration gather of
        the CFG halves is one ~32 KB latent over ICI — negligible against
        the ~10 ms UNet call it parallelizes. Parity vs the unsharded step
        is pinned by tests/test_parallel.py and the driver dryrun."""
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, batch_sharding)
        return x

    def unet_fn(p, x, t, ehs, added, lora=None):
        return unet2d.apply(
            p, unet_cfg, x, t, ehs, added_cond=added, lora=lora, remat=remat
        )

    def rep(e):
        """(…) -> (B, …) broadcast of a per-pair tensor."""
        return jnp.broadcast_to(e, (batch_size,) + e.shape).astype(compute_dtype)

    def added_from(pair, pooled_key):
        if not is_xl:
            return None
        return {
            "text_embeds": rep(pair[f"pooled_{pooled_key}"]),
            "time_ids": rep(pair["time_ids"]),
        }

    def added_concat(*adds):
        if adds[0] is None:
            return None
        return {
            k: jnp.concatenate([a[k] for a in adds], axis=0) for k in adds[0]
        }

    def step_fn(state: SliderTrainState, unet_params: dict, pairs: dict):
        key = jax.random.fold_in(state.key, state.step)
        k_pair, k_t, k_lat, k_anc, k_crop = jax.random.split(key, 5)

        n_pairs = pairs["target"].shape[0]
        idx = jax.random.randint(k_pair, (), 0, n_pairs)
        pair = jax.tree.map(lambda a: a[idx], pairs)
        t_to = jax.random.randint(k_t, (), 1, max_denoising_steps)

        if is_xl and "dynamic_crops" in pair:
            # reference resamples the crop EVERY iteration when the prompt
            # sets dynamic_crops (train_lora_xl.py:198-203); one crop per
            # iteration, shared by all four prompt roles
            from sliders_tpu.pipelines.text2image import get_add_time_ids

            dyn_ids = get_add_time_ids(height, width, dynamic_crops=True, key=k_crop)[0]
            pair = dict(pair)
            pair["time_ids"] = jnp.where(
                pair["dynamic_crops"] > 0, dyn_ids.astype(pair["time_ids"].dtype), pair["time_ids"]
            )

        latents = (
            jax.random.normal(k_lat, (batch_size, latent_h, latent_w, unet_cfg.in_channels))
            * sampler.init_noise_sigma
        ).astype(compute_dtype)
        latents = constrain_batch(latents)

        # ---- 2. partial denoise, slider ON, CFG at denoise_guidance ----
        # branch LoRA (per-call multiplier) vs pre-merged weights for the
        # loop is selectable; round-1's "merged loses in loops" A/B was
        # taken with non-blocking timing (BASELINE.md round-2 methodology)
        # and needs honest re-measurement per backend.
        denoise_params = unet_params
        lora_on = SliderLora(
            weights=jax.lax.stop_gradient(state.lora), multiplier=jnp.asarray(1.0)
        )
        if denoise_merged:
            from sliders_tpu.lora.merge import merge_lora_weights

            denoise_params = jax.lax.stop_gradient(
                merge_lora_weights(unet_params, state.lora, 1.0)
            )
            lora_on = None
        ehs_cfg = jnp.concatenate([rep(pair["unconditional"]), rep(pair["target"])])
        added_cfg = added_concat(added_from(pair, "unconditional"), added_from(pair, "target"))

        def denoise_body(i, carry):
            x, s_state = carry
            x_in = constrain_batch(jnp.concatenate([x, x]))
            x_in = sampler.scale_model_input(x_in, i).astype(compute_dtype)
            eps = unet_fn(
                denoise_params, x_in, sampler.timesteps[i], ehs_cfg, added_cfg, lora=lora_on
            )
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + denoise_guidance * (eps_c - eps_u)
            step_key = jax.random.fold_in(k_anc, i) if needs_step_key else None
            x_new, s_new = sampler.step(i, eps_g, x, s_state, key=step_key)
            return (x_new.astype(compute_dtype), s_new)

        denoised, _ = jax.lax.fori_loop(
            0, t_to, denoise_body, (latents, sampler.init_state(latents))
        )
        denoised = jax.lax.stop_gradient(denoised)

        # ---- 3. jump onto the 1000-step grid ----
        t_idx = t_to * grid_stride
        t_cur = ts1000[t_idx]
        x_scaled = (denoised * scale1000[t_idx]).astype(compute_dtype)

        if fused_tail:
            # ---- 4+5 fused: ONE batch-4 pass for pos/neu/unc (slider OFF
            # via per-sample multiplier 0) + target (slider ON). The frozen
            # samples contribute exactly-zero LoRA grads (the LoRA branch is
            # mult*up(down(x))), so slicing the cotangent to the target rows
            # reproduces the unfused grads. Measured NEGATIVE (BASELINE.md
            # round-3): SD1.5 1.463 vs 1.679 steps/s, SDXL 1.281 vs 1.402 —
            # the batch-4 backward pays the dx-chain for all four samples
            # (XLA does not prune zero-cotangent rows), outweighing the
            # forward batching gain. Kept off by default as a recorded,
            # parity-tested experiment. ----
            ehs4 = jnp.concatenate(
                [rep(pair[r]) for r in ("positive", "neutral", "unconditional", "target")]
            )
            added4 = added_concat(
                *[added_from(pair, r) for r in ("positive", "neutral", "unconditional", "target")]
            ) if is_xl else None
            x4 = constrain_batch(jnp.tile(x_scaled, (4, 1, 1, 1)))
            mult4 = jnp.concatenate(
                [jnp.zeros(3 * batch_size), jnp.ones(batch_size)]
            )

            def fwd4(lora_weights):
                return unet_fn(
                    unet_params, x4, t_cur, ehs4, added4,
                    lora=SliderLora(weights=lora_weights, multiplier=mult4),
                )

            eps4, vjp_fn = jax.vjp(fwd4, state.lora)
            eps4_f = jax.lax.stop_gradient(eps4.astype(jnp.float32))
            eps_pos, eps_neu, eps_unc, eps_t = jnp.split(eps4_f, 4, axis=0)
            goal = eps_neu + pair["guidance_signed"] * (eps_pos - eps_unc)
            diff = eps_t - goal
            loss = jnp.mean(diff * diff)
            # dL/deps_t of mean(diff^2), zero on the frozen rows
            ct = jnp.zeros_like(eps4_f).at[3 * batch_size :].set(2.0 / diff.size * diff)
            (grads,) = vjp_fn(ct.astype(eps4.dtype))
        else:
            # ---- 4. frozen eps: ONE batched pass for positive/neutral/uncond ----
            ehs3 = jnp.concatenate(
                [rep(pair["positive"]), rep(pair["neutral"]), rep(pair["unconditional"])]
            )
            added3 = added_concat(
                added_from(pair, "positive"),
                added_from(pair, "neutral"),
                added_from(pair, "unconditional"),
            )
            x3 = constrain_batch(jnp.tile(x_scaled, (3, 1, 1, 1)))
            frozen = unet_fn(unet_params, x3, t_cur, ehs3, added3)  # slider OFF
            eps_pos, eps_neu, eps_unc = jnp.split(
                jax.lax.stop_gradient(frozen.astype(jnp.float32)), 3, axis=0
            )

            # ---- 5+6. grad pass on the target prompt, slider ON ----
            goal = eps_neu + pair["guidance_signed"] * (eps_pos - eps_unc)
            added1 = added_from(pair, "target")

            def loss_fn(lora_weights):
                eps_t = unet_fn(
                    unet_params, x_scaled, t_cur, rep(pair["target"]), added1,
                    lora=SliderLora(weights=lora_weights, multiplier=jnp.asarray(1.0)),
                ).astype(jnp.float32)
                diff = eps_t - goal
                return jnp.mean(diff * diff)

            loss, grads = jax.value_and_grad(loss_fn)(state.lora)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)

        new_state = state.replace(step=state.step + 1, lora=lora, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "t_to": t_to,
            "pair": idx,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if chunk == 1:
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    def multi_fn(state: SliderTrainState, unet_params: dict, pairs: dict):
        def body(s, _):
            return step_fn(s, unet_params, pairs)

        return jax.lax.scan(body, state, None, length=chunk)

    return jax.jit(multi_fn, donate_argnums=donate_argnums)
