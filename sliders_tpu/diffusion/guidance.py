"""Classifier-free guidance + training-grid tables.

`cfg_combine` is the guidance arithmetic of the reference predict_noise
(train_util.py:145-171): eps_u + g * (eps_c - eps_u) over a batch-doubled
forward. `rescale_noise_cfg` reproduces train_util.py:199-217.

`train_grid_tables` precomputes, for the 1000-step training grid the
reference creates with `set_timesteps(1000)` (train_lora.py:209-213), the
timestep value and model-input scale at each grid index, so the jitted train
step can index them with a traced t_to.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.diffusion.schedulers import DiffusionSchedule


def cfg_combine(eps: jax.Array, guidance_scale) -> jax.Array:
    """eps is the batch-doubled output [uncond..., cond...].

    `guidance_scale` may be a scalar or a per-row (B,) vector (dynamic
    request batching mixes guidance strengths in one denoise)."""
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    if jnp.ndim(guidance_scale) > 0:
        guidance_scale = jnp.reshape(
            guidance_scale, (-1,) + (1,) * (eps_u.ndim - 1)
        )
    return eps_u + guidance_scale * (eps_c - eps_u)


def rescale_noise_cfg(noise_cfg: jax.Array, noise_pred_text: jax.Array, guidance_rescale: float = 0.0) -> jax.Array:
    """Guidance rescale (arXiv 2305.08891 §3.4), train_util.py:199-217."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def apply_noise_offset(latents: jax.Array, noise_offset: float, key: jax.Array) -> jax.Array:
    """Offset noise (crosslabs.org blog): adds a per-channel constant shift.
    Defined by the reference (train_util.py:36-40) though its drivers never
    call it; exposed here as an opt-in for training latents."""
    B = latents.shape[0]
    C = latents.shape[-1]
    shift = jax.random.normal(key, (B, 1, 1, C), latents.dtype)
    return latents + noise_offset * shift


def compose_velocities(uncond: jax.Array, preds: jax.Array, guidance_scale) -> jax.Array:
    """Multi-prompt composition guidance (flux train_util.diffusion
    composition branch, flux train_util.py:178-217):
    uncond + g * sum_i (pred_i - uncond)... the reference sums g*pred_i and
    adds uncond once; preds: (n_prompts, B, ...)."""
    return uncond + guidance_scale * jnp.sum(preds, axis=0)


def train_grid_tables(schedule: DiffusionSchedule, kind: str):
    """(timestep value, model-input scale) per index of the 1000-step grid."""
    T = schedule.num_train_timesteps
    ts = np.arange(T - 1, -1, -1, dtype=np.float64)  # [999, ..., 0]
    if kind in ("lms", "euler_a"):
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        sigmas = np.sqrt((1 - acp) / acp)[ts.astype(int)]
        scale = 1.0 / np.sqrt(sigmas**2 + 1.0)
    else:
        scale = np.ones_like(ts)
    return jnp.asarray(ts, jnp.float32), jnp.asarray(scale, jnp.float32)
