"""Diffusion noise schedulers as pure functions over precomputed tables.

Reimplements, with identical numerics, the four schedulers the reference
instantiates in `trainscripts/textsliders/model_util.py:230-278` (DDIM, DDPM,
LMSDiscrete, EulerAncestral — all with beta_start=0.00085, beta_end=0.012,
"scaled_linear" betas, 1000 train timesteps, clip_sample=False, epsilon or
v-prediction), plus the FlowMatch-Euler scheduler used by the FLUX pipeline
(`flux-sliders/utils/custom_flux_pipeline.py:67-137`, resolution-shifted mu).

Design differences from the torch originals (deliberate, TPU-first):
  - No mutable scheduler objects. `make_schedule` builds the 1000-step
    training tables; `make_sampler(schedule, kind, num_steps)` precomputes
    every per-step quantity (timesteps, sigmas, LMS coefficients) on the host
    with numpy, returning an immutable pytree whose `step(i, ...)` is indexed
    by *step position* — so the whole sampling loop is one `lax.scan` with
    static shapes.
  - LMS Adams–Bashforth coefficients are integrated exactly (the Lagrange
    basis is a degree<=3 polynomial) instead of adaptive quadrature.
  - Ancestral noise comes from an explicit `key` argument, not global RNG.

Timestep spacing matches the diffusers defaults the reference relies on:
"leading" for DDIM/DDPM, "linspace" for LMS/EulerAncestral; steps_offset=0;
set_alpha_to_one=True for DDIM (all defaults of the constructors called at
model_util.py:237-274).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------------------
# training schedule (the 1000-step beta/alpha tables)
# ---------------------------------------------------------------------------


@struct.dataclass
class DiffusionSchedule:
    betas: jax.Array  # (T,)
    alphas_cumprod: jax.Array  # (T,)
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")

    # ---- closed-form helpers shared by training and sampling ----

    def add_noise(self, x0: jax.Array, noise: jax.Array, t) -> jax.Array:
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        acp = self.alphas_cumprod[t]
        acp = _bcast(acp, x0)
        return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise

    def velocity(self, x0: jax.Array, noise: jax.Array, t) -> jax.Array:
        acp = _bcast(self.alphas_cumprod[t], x0)
        return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0

    def to_eps_x0(self, model_out: jax.Array, t, x_t: jax.Array):
        """Convert a model output under prediction_type to (eps, x0)."""
        acp = _bcast(self.alphas_cumprod[t], x_t)
        sq_a, sq_1ma = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
        if self.prediction_type == "epsilon":
            eps = model_out
            x0 = (x_t - sq_1ma * eps) / sq_a
        elif self.prediction_type == "v_prediction":
            x0 = sq_a * x_t - sq_1ma * model_out
            eps = sq_a * model_out + sq_1ma * x_t
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type}")
        return eps, x0


def _bcast(v: jax.Array, like: jax.Array) -> jax.Array:
    """Right-pad dims so a per-sample scalar broadcasts over `like`."""
    v = jnp.asarray(v, dtype=like.dtype)
    return v.reshape(v.shape + (1,) * (like.ndim - v.ndim))


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    raise ValueError(f"unknown beta_schedule {beta_schedule}")


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
) -> DiffusionSchedule:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------

LMS_ORDER = 4


@struct.dataclass
class Sampler:
    """Precomputed sampling plan for `num_steps` denoising steps.

    `step(i, model_out, x, state, key)` advances x_t -> x_{t-1} where `i` is
    the step *position* (0 = most noisy). All per-step tables are (n,)-shaped
    and indexed with traced `i`, so the loop scans.
    """

    kind: str = struct.field(pytree_node=False)
    schedule: DiffusionSchedule
    timesteps: jax.Array  # (n,) float32 — value fed to the model
    init_noise_sigma: jax.Array  # scalar
    # sigma-based samplers (lms / euler_a): sigma per step, with final 0
    sigmas: Optional[jax.Array] = None  # (n+1,)
    # alpha-based samplers (ddim / ddpm): alpha_cumprod at t and t_prev
    alpha_prod: Optional[jax.Array] = None  # (n,)
    alpha_prod_prev: Optional[jax.Array] = None  # (n,)
    ddpm_variance: Optional[jax.Array] = None  # (n,)
    lms_coeffs: Optional[jax.Array] = None  # (n, LMS_ORDER)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    # ---- model input scaling (scheduler.scale_model_input) ----

    def scale_model_input(self, x: jax.Array, i) -> jax.Array:
        if self.kind in ("lms", "euler_a"):
            # `i` may be a per-row (B,) vector (continuous serving batches
            # rows at different step positions); _bcast right-pads so the
            # scalar case divides by the identical f32 value bit-for-bit
            sigma = self.sigmas[i]
            return x / _bcast(jnp.sqrt(sigma**2 + 1.0), x)
        return x  # ddim / ddpm: identity

    def init_state(self, x: jax.Array) -> dict:
        """Sampler carry (LMS derivative history)."""
        if self.kind == "lms":
            return {
                "derivs": jnp.zeros((LMS_ORDER,) + x.shape, x.dtype),
            }
        return {}

    # ---- one reverse step ----

    def step(self, i, model_out: jax.Array, x: jax.Array, state: dict,
             key=None, noise=None):
        """`noise` overrides the ancestral draw (ddpm/euler_a): callers that
        need a finer-grained stream than one-key-per-call (the fleet's
        per-row solo streams, training/fleet.py) pass the x-shaped tensor
        directly; with noise=None the draw from `key` is unchanged."""
        if self.kind == "ddim":
            return self._ddim_step(i, model_out, x), state
        if self.kind == "ddpm":
            return self._ddpm_step(i, model_out, x, key, noise), state
        if self.kind == "euler_a":
            return self._euler_a_step(i, model_out, x, key, noise), state
        if self.kind == "lms":
            return self._lms_step(i, model_out, x, state)
        raise ValueError(f"unknown sampler kind {self.kind}")

    def _pred_eps_x0_alpha(self, i, model_out, x):
        acp = _bcast(self.alpha_prod[i], x)
        sq_a, sq_1ma = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
        if self.schedule.prediction_type == "epsilon":
            eps = model_out
            x0 = (x - sq_1ma * eps) / sq_a
        else:  # v_prediction
            x0 = sq_a * x - sq_1ma * model_out
            eps = sq_a * model_out + sq_1ma * x
        return eps, x0

    def _ddim_step(self, i, model_out, x):
        # diffusers DDIMScheduler.step with eta=0, clip_sample=False
        eps, x0 = self._pred_eps_x0_alpha(i, model_out, x)
        acp_prev = _bcast(self.alpha_prod_prev[i], x)
        return jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps

    def _ddpm_step(self, i, model_out, x, key, noise=None):
        # diffusers DDPMScheduler.step, variance_type="fixed_small"
        eps, x0 = self._pred_eps_x0_alpha(i, model_out, x)
        acp = _bcast(self.alpha_prod[i], x)
        acp_prev = _bcast(self.alpha_prod_prev[i], x)
        alpha_t = acp / acp_prev
        beta_t = 1.0 - alpha_t
        coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp)
        mean = coef_x0 * x0 + coef_xt * x
        if noise is None:
            if key is None:
                raise ValueError("ddpm step needs an rng key or noise")
            noise = jax.random.normal(key, x.shape, x.dtype)
        else:
            noise = noise.astype(x.dtype)
        var = _bcast(self.ddpm_variance[i], x)
        is_last = self.timesteps[i] <= 0
        return mean + jnp.where(is_last, 0.0, jnp.sqrt(var)) * noise

    def _sigma_eps_x0(self, i, model_out, x):
        sigma = _bcast(self.sigmas[i], x)
        if self.schedule.prediction_type == "epsilon":
            x0 = x - sigma * model_out
        else:  # v_prediction: diffusers sigma-space conversion
            x0 = model_out * (-sigma / jnp.sqrt(sigma**2 + 1)) + (x / (sigma**2 + 1))
        deriv = (x - x0) / sigma
        return deriv, x0

    def _euler_a_step(self, i, model_out, x, key, noise=None):
        sigma_from = _bcast(self.sigmas[i], x)
        sigma_to = _bcast(self.sigmas[i + 1], x)
        deriv, _ = self._sigma_eps_x0(i, model_out, x)
        sigma_up2 = sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
        sigma_up = jnp.sqrt(sigma_up2)
        sigma_down = jnp.sqrt(sigma_to**2 - sigma_up2)
        x = x + deriv * (sigma_down - sigma_from)
        if noise is None:
            if key is None:
                raise ValueError("euler_a step needs an rng key or noise")
            noise = jax.random.normal(key, x.shape, x.dtype)
        else:
            noise = noise.astype(x.dtype)
        return x + noise * sigma_up

    def _lms_step(self, i, model_out, x, state):
        deriv, _ = self._sigma_eps_x0(i, model_out, x)
        # history: derivs[0] = newest
        derivs = jnp.concatenate([deriv[None], state["derivs"][:-1]], axis=0)
        coeffs = self.lms_coeffs[i].astype(x.dtype)
        if coeffs.ndim == 1:  # scalar step position
            # (LMS_ORDER,) zero-padded for warmup
            upd = jnp.tensordot(coeffs, derivs, axes=1)
        else:  # per-row (B,) step positions -> (B, LMS_ORDER) coeff rows
            upd = jnp.einsum("bo,ob...->b...", coeffs, derivs)
        return x + upd, {"derivs": derivs}

    # ---- inversion (DDIM only): x_t -> x_{t+1} along the same grid ----

    def ddim_inverse_step(self, i, model_out, x):
        """Exact inverse of `_ddim_step(i, ...)`: moves x from the noise level
        of alpha_prod_prev[i] up to alpha_prod[i] (more noise). Running
        i = n-1 .. 0 inverts a clean latent to x_T, mirroring the null-text
        inversion notebook's `next_step` (demo_image_editing.ipynb cell 3).
        """
        acp_from = _bcast(self.alpha_prod_prev[i], x)
        acp_to = _bcast(self.alpha_prod[i], x)
        sq_a, sq_1ma = jnp.sqrt(acp_from), jnp.sqrt(1.0 - acp_from)
        if self.schedule.prediction_type == "epsilon":
            eps = model_out
            x0 = (x - sq_1ma * eps) / sq_a
        else:  # v_prediction
            x0 = sq_a * x - sq_1ma * model_out
            eps = sq_a * model_out + sq_1ma * x
        return jnp.sqrt(acp_to) * x0 + jnp.sqrt(1.0 - acp_to) * eps


# ---------------------------------------------------------------------------
# sampler construction (host-side numpy)
# ---------------------------------------------------------------------------


def _leading_timesteps(T: int, n: int) -> np.ndarray:
    step_ratio = T // n
    return (np.arange(0, n) * step_ratio).round()[::-1].copy().astype(np.int64)


def _linspace_timesteps(T: int, n: int) -> np.ndarray:
    return np.linspace(0, T - 1, n, dtype=np.float64)[::-1].copy()


def _lms_coefficients(sigmas: np.ndarray, order: int = LMS_ORDER) -> np.ndarray:
    """Exact Adams–Bashforth coefficients on the sigma grid.

    coeff[i, j] = ∫_{sigma_i}^{sigma_{i+1}} Π_{k≠j, k<ord_i} (s - c_k)/(c_j - c_k) ds
    with c_m = sigmas[i - m] and ord_i = min(i+1, order). The integrand is a
    polynomial of degree < order, integrated in closed form (the reference's
    scheduler uses adaptive quadrature for the same integral).
    """
    n = len(sigmas) - 1
    out = np.zeros((n, order))
    for i in range(n):
        ord_i = min(i + 1, order)
        for j in range(ord_i):
            ck = [sigmas[i - k] for k in range(ord_i) if k != j]
            num = np.poly(ck) if ck else np.array([1.0])  # roots -> coeffs
            den = np.prod([sigmas[i - j] - c for c in ck]) if ck else 1.0
            integ = np.polyint(num / den)
            out[i, j] = np.polyval(integ, sigmas[i + 1]) - np.polyval(integ, sigmas[i])
    return out


def make_sampler(
    schedule: DiffusionSchedule,
    kind: str = "ddim",
    num_steps: int = 50,
) -> Sampler:
    T = schedule.num_train_timesteps
    acp = np.asarray(schedule.alphas_cumprod, np.float64)

    if kind in ("ddim", "ddpm"):
        ts = _leading_timesteps(T, num_steps)
        prev_ts = ts - T // num_steps
        alpha_prod = acp[ts]
        # set_alpha_to_one=True -> final alpha is exactly 1.0
        alpha_prod_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, T - 1)], 1.0)
        ddpm_var = None
        if kind == "ddpm":
            alpha_t = alpha_prod / alpha_prod_prev
            var = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod) * (1.0 - alpha_t)
            ddpm_var = np.clip(var, 1e-20, None)
        return Sampler(
            kind=kind,
            schedule=schedule,
            timesteps=jnp.asarray(ts, jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            alpha_prod=jnp.asarray(alpha_prod, jnp.float32),
            alpha_prod_prev=jnp.asarray(alpha_prod_prev, jnp.float32),
            ddpm_variance=None if ddpm_var is None else jnp.asarray(ddpm_var, jnp.float32),
        )

    if kind in ("lms", "euler_a"):
        ts = _linspace_timesteps(T, num_steps)
        train_sigmas = np.sqrt((1.0 - acp) / acp)
        sig = np.interp(ts, np.arange(T), train_sigmas)
        sigmas = np.concatenate([sig, [0.0]])
        # "linspace" spacing -> init_noise_sigma = sigmas.max()
        init_sigma = sigmas.max()
        lms_coeffs = None
        if kind == "lms":
            lms_coeffs = _lms_coefficients(sigmas)
        return Sampler(
            kind=kind,
            schedule=schedule,
            timesteps=jnp.asarray(ts, jnp.float32),
            init_noise_sigma=jnp.asarray(init_sigma, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            lms_coeffs=None if lms_coeffs is None else jnp.asarray(lms_coeffs, jnp.float32),
        )

    raise ValueError(f"Unknown scheduler name: {kind}")


def sigma_add_noise(sampler: Sampler, x0: jax.Array, noise: jax.Array, i) -> jax.Array:
    """add_noise for sigma-based samplers: x0 + sigma_i * noise."""
    return x0 + _bcast(sampler.sigmas[i], x0) * noise


# ---------------------------------------------------------------------------
# FlowMatch Euler (FLUX) — custom_flux_pipeline.py:67-137 semantics
# ---------------------------------------------------------------------------


@struct.dataclass
class FlowMatchSampler:
    timesteps: jax.Array  # (n,) in [0, 1000)
    sigmas: jax.Array  # (n+1,)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def step(self, i, model_out, x):
        dt = _bcast(self.sigmas[i + 1] - self.sigmas[i], x)
        return x + dt * model_out

    def add_noise(self, x0, noise, i):
        s = _bcast(self.sigmas[i], x0)
        return (1.0 - s) * x0 + s * noise


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.16,
) -> float:
    """Resolution-dependent mu (custom_flux_pipeline.py:67-77)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def make_flowmatch_sampler(
    num_steps: int,
    image_seq_len: Optional[int] = None,
    mu: Optional[float] = None,
    num_train_timesteps: int = 1000,
    use_dynamic_shifting: bool = True,
) -> FlowMatchSampler:
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if use_dynamic_shifting:
        if mu is None:
            if image_seq_len is None:
                raise ValueError("need image_seq_len or mu for dynamic shifting")
            mu = calculate_shift(image_seq_len)
        # time_shift: exp(mu) / (exp(mu) + (1/s - 1))
        sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
    timesteps = sigmas * num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return FlowMatchSampler(
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
    )
