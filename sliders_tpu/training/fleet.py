"""Fleet training: K INDEPENDENT sliders trained in ONE jitted TPU step.

The reference trains one slider per process (trainscripts/textsliders/
train_lora.py:32-340 — one LoRANetwork monkey-patched into one pipeline), so
producing the repo's dozens of example sliders (data/prompts-*.yaml) means
dozens of sequential runs. On TPU the economics invert twice over:

  - K sliders' iterations ride ONE UNet call per phase instead of K —
    one process, one compiled program, K artifacts;
  - fleet rows are *embarrassingly parallel*: unlike data parallelism
    (which all-reduces gradients every step), each row's loss/grads/update
    touch only that row's adapter — sharding the row axis over the mesh
    `dp` axis trains K sliders with ZERO gradient collectives.

Measured one-chip economics (BASELINE.md round-4 fleet table): the SD1.5
512px UNet is MXU-bound at the solo CFG batch already, so batching K=4
sliders costs ~3.9x a solo iteration — per-row-t_to fleet-4 is 0.656x
FOUR sequential runs (E[max_K t_to] adds another 1.6x loop inflation) and
shared_t_to fleet-4 is 1.036x. On one chip fleet is an OPERATIONAL
feature; the throughput story is the zero-collective dp sharding.

Mechanics: the per-row stacked-LoRA machinery built for multi-tenant
serving (lora/batch.py + ops/basic.py batched einsum / grouped conv) is
reused for the *training* pytree — every adapter leaf carries a leading
(K,) slider axis, and row r of every UNet call applies (and backprops
into) row r's factors only.

RNG contract: row r's stream is `fold_in(fleet_key, r)` followed by the
solo per-step folds — so slider r draws the SAME pair index, t_to and
noise as a solo `make_text_slider_step` run created with
`key=fold_in(fleet_key, r)`, and its trajectory matches that solo run to
float tolerance (measured <=2e-6 after two full adamw steps on the
tiny UNet: the fleet batches 2K/3K/K rows where solo batches 2/3/1, so
XLA tiles the row-local reductions differently — a few ULP, no semantic
divergence; rows within one fleet program ARE exactly isolated,
bit-for-bit). One deliberate structural difference: the partial-denoise
loop runs to max_r(t_to_r) with per-row freeze masking (a `fori_loop`
needs one trip count), costing E[max of K uniforms] ≈ 50·K/(K+1)
iterations instead of E ≈ 25. Both contracts are pinned by
tests/test_fleet.py.

Supported samplers: all four. ddim / lms are deterministic (stateless or
row-separable carry); the ancestral samplers (ddpm / euler_a) get a
PER-ROW noise stream — the solo step draws normal(fold_in(k_anc, i)) once
per call (schedulers.py one-key API), and the fleet reproduces row r's
exact draw by vmapping that fold over the per-row k_anc keys and passing
the stacked tensor through `Sampler.step(..., noise=)`; frozen rows'
draws are discarded by the freeze mask, so parity with solo runs holds
for every sampler (tests/test_fleet.py ancestral parity test).

Optimizers: per-row independence holds for element-local transforms
(adam/adamw/lion — the reference default is adamw, train_util.py:336-404).
prodigy/dadapt estimate a GLOBAL d from the whole tree and would couple
rows; they are rejected at build time.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from sliders_tpu.diffusion.guidance import train_grid_tables
from sliders_tpu.diffusion.schedulers import DiffusionSchedule, Sampler
from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora
from sliders_tpu.training.text_slider import SliderTrainState


# ---------------------------------------------------------------------------
# fleet pytree helpers
# ---------------------------------------------------------------------------


def stack_fleet(loras: Sequence[dict]) -> dict:
    """Stack K solo adapter trees into one per-row fleet tree.

    Unlike the serving stacker (lora/batch.stack_sliders) this requires
    IDENTICAL factor shapes (same rank/alpha config — a fleet is one train
    config over many concepts) and adds no `rank` leaf, so ops/basic falls
    back to the static `down.shape[-1]` rank and `trainable_mask` covers
    every leaf."""
    if not loras:
        raise ValueError("stack_fleet needs at least one adapter")
    names = sorted(loras[0])
    for w in loras[1:]:
        if sorted(w) != names:
            raise ValueError("fleet adapters target different module sets")
    out = {}
    for name in names:
        shapes = {tuple(w[name]["down"].shape) for w in loras}
        if len(shapes) != 1:
            raise ValueError(
                f"fleet adapters disagree on {name} down shape: {shapes} "
                "(fleet training requires one rank for all sliders)"
            )
        out[name] = {
            k: jnp.stack([w[name][k] for w in loras]) for k in ("down", "up", "alpha")
        }
    return out


def unstack_fleet(stacked: dict) -> list[dict]:
    """Inverse of `stack_fleet`: fleet tree -> list of K solo trees."""
    k = next(iter(stacked.values()))["alpha"].shape[0]
    return [
        {name: {key: leaf[key][r] for key in ("down", "up", "alpha")}
         for name, leaf in stacked.items()}
        for r in range(k)
    ]


def fleet_size(stacked: dict) -> int:
    return next(iter(stacked.values()))["alpha"].shape[0]


def stack_fleet_pairs(pair_sets: Sequence[dict]) -> dict:
    """Stack K per-slider stacked-pairs dicts (driver.build_pairs output,
    each (n_r, ...)) into one (K, n_max, ...) tree + an `n_pairs` (K,)
    bound vector. Sliders may have different pair counts: rows past a
    slider's n_r are edge-padded and NEVER sampled (the per-row randint is
    bounded by n_pairs[r])."""
    if not pair_sets:
        raise ValueError("stack_fleet_pairs needs at least one pair set")
    keys = set(pair_sets[0])
    for p in pair_sets[1:]:
        if set(p) != keys:
            raise ValueError("fleet pair sets have different keys (XL vs SD mix?)")
    n = [next(iter(p.values())).shape[0] for p in pair_sets]
    n_max = max(n)

    def pad(a):
        a = jnp.asarray(a)
        if a.shape[0] == n_max:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (n_max - a.shape[0],) + a.shape[1:])]
        )

    out = {k: jnp.stack([pad(p[k]) for p in pair_sets]) for k in keys}
    out["n_pairs"] = jnp.asarray(n, jnp.int32)
    return out


def _repeat_rows(tree: dict, reps: int) -> dict:
    """(K, ...) leaves -> (K*reps, ...) with each row repeated `reps` times
    consecutively (row layout [s0 x reps, s1 x reps, ...])."""
    if reps == 1:
        return tree
    return jax.tree.map(lambda a: jnp.repeat(a, reps, axis=0), tree)


def _tile_tree(tree: dict, reps: int) -> dict:
    """(R, ...) leaves -> (R*reps, ...) by whole-block tiling (CFG halves)."""
    if reps == 1:
        return tree
    return jax.tree.map(
        lambda a: jnp.concatenate([a] * reps, axis=0), tree
    )


# ---------------------------------------------------------------------------
# the fleet step
# ---------------------------------------------------------------------------


def draw_fleet_t_to(fleet_key, step, k_t, max_denoising_steps, *, mode, strata=8):
    """The K rows' partial-denoise depths for one fleet iteration.

    `k_t` is the (K, key) array of per-row t_to keys (row r's solo stream);
    `fleet_key`/`step` seed the step-level SHARED stratum draw. Every mode
    keeps each row's marginal exactly Uniform{1..max_denoising_steps-1}
    (the reference draw, train_lora.py:163-170); they differ only in the
    joint distribution — see make_fleet_text_step's docstring for the
    E[max_K] economics."""
    K = k_t.shape[0]
    if mode == "stratified":
        # one coarse stratum per STEP (shared key: no row fold), exact
        # per-row uniform marginal via the inverse-CDF of (s+u)/S
        shared_key = jax.random.fold_in(
            jax.random.fold_in(fleet_key, 0x5742A7), step
        )
        s = jax.random.randint(shared_key, (), 0, strata)
        u = jax.vmap(lambda k: jax.random.uniform(k))(k_t)  # (K,)
        R = max_denoising_steps - 1
        t_to = 1 + jnp.floor(
            (s.astype(jnp.float32) + u) * R / strata
        ).astype(jnp.int32)  # (K,) in {1..R}
        # f32 rounding of (S-1)+u can hit S exactly at u ~ 1-ulp;
        # clamp so the 1000-step grid lookup stays in range
        return jnp.clip(t_to, 1, R)
    t_to = jax.vmap(
        lambda k: jax.random.randint(k, (), 1, max_denoising_steps)
    )(k_t)  # (K,)
    if mode == "shared":
        t_to = jnp.broadcast_to(t_to[0], (K,))
    return t_to


def make_fleet_text_step(
    unet_cfg: unet2d.UNetConfig,
    schedule: DiffusionSchedule,
    sampler: Sampler,
    optimizer: optax.GradientTransformation,
    *,
    n_sliders: int,
    optimizer_name: str = "adamw",
    max_denoising_steps: int = 50,
    resolution: int = 512,
    batch_size: int = 1,
    denoise_guidance: float = 3.0,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    mesh=None,
    is_xl: bool = False,
    donate: bool = True,
    chunk: int = 1,
    shared_t_to: bool = False,
    t_to_mode: Optional[str] = None,
    t_to_strata: int = 8,
):
    """Build the jitted fleet step:
    step(state, unet_params, pairs) -> (new_state, metrics).

    `state.lora` is a `stack_fleet` tree; `pairs` a `stack_fleet_pairs`
    tree. Metrics come back with a leading (K,) slider axis (loss, t_to,
    pair, grad_norm). Reference iteration semantics per row follow
    training/text_slider.py (train_lora.py:155-309); see the module
    docstring for the exact solo-parity contract.

    ``t_to_mode`` picks how the K rows draw their partial-denoise depth
    t_to (the reference's `timesteps_to`, train_lora.py:163-170 — an
    exogenous Uniform{1..T-1} draw; sliders never interact through it).
    The denoise fori_loop runs to max_r(t_to_r), so the draws' JOINT
    distribution sets the loop length while each row's training
    distribution only needs the MARGINAL to stay Uniform{1..T-1}:

    - ``"per_row"`` (default): i.i.d. per row; row r reproduces the solo
      stream exactly, but E[max_K] ~ (T-1)*K/(K+1) inflates the loop 1.6x
      at K=4 (measured, BASELINE.md round-4 fleet table).
    - ``"shared"``: every row gets ROW 0's draw — E[loop] = (T-1)/2
      (optimal: with fixed uniform marginals, E[max] is minimized by
      comonotone draws), but all rows' timestep noise is perfectly
      correlated. Row 0 keeps exact solo parity.
    - ``"stratified"``: one stratum index s ~ Uniform{0..S-1} is drawn
      PER STEP (shared across rows, S = ``t_to_strata``), then row r
      jitters independently within the stratum:
          t_to_r = 1 + floor((s + u_r) * (T-1) / S),  u_r ~ U[0,1).
      s uniform + u_r uniform makes (s+u_r)/S exactly U[0,1), so each
      row's marginal is exactly Uniform{1..T-1}; rows correlate ONLY
      through the shared coarse stratum (spread <= ceil((T-1)/S)), and
      E[loop] = (T-1)/S * ((S-1)/2 + K/(K+1)) + 1 — inflation
      1 + (K-1)/((K+1)*... ~ 7% at K=4, S=8, T=50 vs per_row's 60%.
      (NB: giving rows DISJOINT strata per step would instead pin the max
      in the top stratum every step — E[max] ~ (T-1)*(2S-1)/(2S), WORSE
      than i.i.d.; negatively-correlated draws are the wrong direction
      for a max.) No row keeps the solo stream; marginal uniformity is
      pinned by tests/test_fleet.py::test_fleet_stratified_t_to_marginal.

    ``shared_t_to=True`` is back-compat sugar for t_to_mode="shared"."""
    if t_to_mode is None:
        t_to_mode = "shared" if shared_t_to else "per_row"
    elif shared_t_to and t_to_mode != "shared":
        raise ValueError(
            f"shared_t_to=True conflicts with t_to_mode={t_to_mode!r}"
        )
    if t_to_mode not in ("per_row", "shared", "stratified"):
        raise ValueError(
            f"t_to_mode must be per_row/shared/stratified, got {t_to_mode!r}"
        )
    if t_to_mode == "stratified" and not (
        1 <= t_to_strata <= max_denoising_steps - 1
    ):
        raise ValueError(
            f"t_to_strata={t_to_strata} must be in [1, {max_denoising_steps - 1}]"
        )
    needs_step_noise = sampler.kind in ("ddpm", "euler_a")
    if optimizer_name.lower().replace("8bit", "").rstrip("_") in (
        "prodigy", "dadaptadam", "dadaptadamw", "dadaptlion",
    ):
        raise NotImplementedError(
            f"'{optimizer_name}' estimates a global step size over the whole "
            "tree and would couple fleet rows; use adamw/adam/lion"
        )

    K, B = n_sliders, batch_size
    KB = K * B
    ts1000, scale1000 = train_grid_tables(schedule, sampler.kind)
    grid_stride = schedule.num_train_timesteps // max_denoising_steps
    if isinstance(resolution, tuple):
        height, width = resolution
    else:
        height = width = resolution
    latent_h, latent_w = height // 8, width // 8

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if K % mesh.shape["dp"] != 0:
            raise ValueError(
                f"fleet size {K} must divide over dp={mesh.shape['dp']}"
            )
        row_sharding = NamedSharding(mesh, P("dp"))

    def constrain_rows(x):
        """Shard the leading (slider-row) axis over dp. Applied to the
        latents, every fan-out batch AND the per-row adapter leaves: rows
        never exchange data (per-row weights, per-row loss), so the step
        runs with ZERO gradient collectives — each chip trains its own
        K/dp sliders (the scalar loss-sum psum is the only cross-chip
        traffic). Contrast parallel/mesh.py data parallelism, which
        all-reduces the full LoRA grad tree every step."""
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, row_sharding)
        return x

    def constrain_tree(tree):
        if mesh is None:
            return tree
        return jax.tree.map(constrain_rows, tree)

    def unet_fn(p, x, t, ehs, added, lora=None):
        return unet2d.apply(
            p, unet_cfg, x, t, ehs, added_cond=added, lora=lora, remat=remat
        )

    def rep(e):
        """(K, ...) per-slider tensor -> (K*B, ...) per-row tensor."""
        return jnp.repeat(e, B, axis=0).astype(compute_dtype) if B > 1 else e.astype(compute_dtype)

    def rep_scalar(v):
        """(K,) per-slider scalar -> (K*B,) per-row scalar (kept f32)."""
        return jnp.repeat(v, B, axis=0) if B > 1 else v

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
        return {k: jnp.concatenate([a[k] for a in adds], axis=0) for k in adds[0]}

    def bcast_rows(v):
        """(K,) -> (K*B, 1, 1, 1) for latent-shaped broadcasts."""
        return rep_scalar(v).reshape(KB, 1, 1, 1)

    def freeze_rows(new, old, active):
        """Freeze inactive slider rows STRUCTURALLY: the latent carry is
        row-major ((KB, ...)) and every sampler-state leaf is history-major
        ((ORDER, KB, ...) — the LMS derivs carry; ddim/ddpm/euler_a carry
        an empty dict). Shape sniffing here is unsafe: when KB == LMS_ORDER
        (e.g. the default fleet-4 with batch 1) a (4, KB, ...) derivs leaf
        is indistinguishable from a row-major one by shape alone and the
        mask would silently land on the history axis."""
        act = rep_scalar(active)
        (x_new, s_new), (x_old, s_old) = new, old

        x = jnp.where(act.reshape((KB,) + (1,) * (x_new.ndim - 1)), x_new, x_old)

        def sel_state(n, o):
            m = act.reshape((1, KB) + (1,) * (n.ndim - 2))
            return jnp.where(m, n, o)

        return x, jax.tree.map(sel_state, s_new, s_old)

    def step_fn(state: SliderTrainState, unet_params: dict, pairs: dict):
        # ---- per-row RNG: row r == solo run keyed fold_in(fleet_key, r) ----
        rows = jnp.arange(K)
        keys = jax.vmap(
            lambda r: jax.random.fold_in(jax.random.fold_in(state.key, r), state.step)
        )(rows)
        ks = jax.vmap(lambda k: jax.random.split(k, 5))(keys)  # (K, 5)
        k_pair, k_t, k_lat, k_anc, k_crop = (ks[:, j] for j in range(5))

        n_pairs = pairs["n_pairs"]
        embeds = {k: v for k, v in pairs.items() if k != "n_pairs"}
        idx = jax.vmap(lambda k, n: jax.random.randint(k, (), 0, n))(k_pair, n_pairs)
        pair = jax.tree.map(lambda a: a[rows, idx], embeds)  # (K, ...)
        t_to = draw_fleet_t_to(
            state.key, state.step, k_t, max_denoising_steps,
            mode=t_to_mode, strata=t_to_strata,
        )

        if is_xl and "dynamic_crops" in pair:
            from sliders_tpu.pipelines.text2image import get_add_time_ids

            dyn_ids = jax.vmap(
                lambda k: get_add_time_ids(height, width, dynamic_crops=True, key=k)[0]
            )(k_crop)  # (K, 6)
            pair = dict(pair)
            pair["time_ids"] = jnp.where(
                pair["dynamic_crops"][:, None] > 0,
                dyn_ids.astype(pair["time_ids"].dtype),
                pair["time_ids"],
            )

        latents = jax.vmap(
            lambda k: jax.random.normal(
                k, (B, latent_h, latent_w, unet_cfg.in_channels)
            )
        )(k_lat).reshape(KB, latent_h, latent_w, unet_cfg.in_channels)
        latents = (latents * sampler.init_noise_sigma).astype(compute_dtype)
        latents = constrain_rows(latents)

        lora_rows = constrain_tree(jax.lax.stop_gradient(state.lora))
        lora_on = SliderLora(
            weights=_tile_tree(_repeat_rows(lora_rows, B), 2),
            multiplier=jnp.asarray(1.0),
        )

        # ---- 2. partial denoise to max_r(t_to_r), per-row freeze mask ----
        ehs_cfg = jnp.concatenate([rep(pair["unconditional"]), rep(pair["target"])])
        added_cfg = added_concat(
            added_from(pair, "unconditional"), added_from(pair, "target")
        )

        def denoise_body(i, carry):
            x, s_state = carry
            x_in = constrain_rows(jnp.concatenate([x, x]))
            x_in = sampler.scale_model_input(x_in, i).astype(compute_dtype)
            eps = unet_fn(
                unet_params, x_in, sampler.timesteps[i], ehs_cfg, added_cfg,
                lora=lora_on,
            )
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + denoise_guidance * (eps_c - eps_u)
            noise = None
            if needs_step_noise:
                # per-row ancestral stream: row r's draw is EXACTLY the solo
                # run's normal(fold_in(k_anc, i), (B,h,w,c), x.dtype) — the
                # one-key-per-call sampler API is bypassed via the `noise`
                # override (schedulers.Sampler.step)
                noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, i),
                        (B, latent_h, latent_w, unet_cfg.in_channels),
                        x.dtype,
                    )
                )(k_anc).reshape(KB, latent_h, latent_w, unet_cfg.in_channels)
            x_new, s_new = sampler.step(i, eps_g, x, s_state, noise=noise)
            active = i < t_to  # (K,) rows still denoising
            x_new, s_new = freeze_rows(
                (x_new.astype(compute_dtype), s_new), (x, s_state), active
            )
            return (x_new, s_new)

        denoised, _ = jax.lax.fori_loop(
            0, t_to.max(), denoise_body, (latents, sampler.init_state(latents))
        )
        denoised = jax.lax.stop_gradient(denoised)

        # ---- 3. per-row jump onto the 1000-step grid ----
        t_idx = t_to * grid_stride  # (K,)
        t_cur = rep_scalar(ts1000[t_idx])  # (KB,)
        x_scaled = (denoised * bcast_rows(scale1000[t_idx])).astype(compute_dtype)

        # ---- 4. frozen eps: one (3*KB)-row pass, slider OFF ----
        ehs3 = jnp.concatenate(
            [rep(pair["positive"]), rep(pair["neutral"]), rep(pair["unconditional"])]
        )
        added3 = added_concat(
            added_from(pair, "positive"),
            added_from(pair, "neutral"),
            added_from(pair, "unconditional"),
        )
        x3 = constrain_rows(jnp.tile(x_scaled, (3, 1, 1, 1)))
        t3 = jnp.tile(t_cur, 3)
        frozen = unet_fn(unet_params, x3, t3, ehs3, added3)
        eps_pos, eps_neu, eps_unc = jnp.split(
            jax.lax.stop_gradient(frozen.astype(jnp.float32)), 3, axis=0
        )

        # ---- 5+6. grad pass: per-row adapters, per-row loss ----
        g = bcast_rows(pair["guidance_signed"]).astype(jnp.float32)
        goal = eps_neu + g * (eps_pos - eps_unc)
        added1 = added_from(pair, "target")
        ehs1 = rep(pair["target"])

        def loss_fn(fleet_weights):
            w_rows = _repeat_rows(constrain_tree(fleet_weights), B)
            eps_t = unet_fn(
                unet_params, x_scaled, t_cur, ehs1, added1,
                lora=SliderLora(weights=w_rows, multiplier=jnp.asarray(1.0)),
            ).astype(jnp.float32)
            diff = eps_t - goal
            # per-slider mean over its own (B, h, w, c) elements — each
            # row's loss/grads match its solo run exactly; the SUM makes
            # every row's gradient unscaled by K
            loss_vec = jnp.mean(diff.reshape(K, -1) ** 2, axis=1)
            return loss_vec.sum(), loss_vec

        (_, loss_vec), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.lora)
        grads = constrain_tree(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = constrain_tree(optax.apply_updates(state.lora, updates))

        new_state = state.replace(step=state.step + 1, lora=lora, opt_state=opt_state)
        per_row_sq = jax.tree.map(
            lambda a: jnp.sum(jnp.square(a.astype(jnp.float32)).reshape(K, -1), axis=1),
            grads,
        )
        metrics = {
            "loss": loss_vec,
            "t_to": t_to,
            "pair": idx,
            "grad_norm": jnp.sqrt(sum(jax.tree.leaves(per_row_sq))),
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


# ---------------------------------------------------------------------------
# image-slider fleet step
# ---------------------------------------------------------------------------


def make_fleet_image_step(
    unet_cfg: unet2d.UNetConfig,
    vae_cfg,
    schedule: DiffusionSchedule,
    sampler: Sampler,
    optimizer: optax.GradientTransformation,
    *,
    n_sliders: int,
    optimizer_name: str = "adamw",
    max_denoising_steps: int = 50,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    is_xl: bool = False,
    mesh=None,
    donate: bool = True,
    chunk: int = 1,
):
    """K image sliders (training/image_slider.py semantics, one fused ±s
    batch each) in one jitted step — the concurrent path for e.g. the
    reference's --stylecheck loop (imagesliders/train_lora-scale.py), which
    trains one slider per style folder SEQUENTIALLY.

    batch leaves carry a leading (K,) slider axis:
      images_high/low (K, B, H, W, 3) float [-1,1] or uint8, scale (K,),
      positive/neutral (K, L, D) [+ pooled_* (K, Dp) / time_ids (K, 6)].

    Unlike the text fleet there is NO shared loop: every per-slider draw
    (t_to, posterior noise, injected noise) vectorizes freely, so row r is
    solo-equivalent with no masking caveat. Same RNG contract as
    make_fleet_text_step (row r == solo run keyed fold_in(fleet_key, r));
    any sampler kind works (the image step never calls sampler.step)."""
    from sliders_tpu.models import vae as vae_mod

    if optimizer_name.lower().replace("8bit", "").rstrip("_") in (
        "prodigy", "dadaptadam", "dadaptadamw", "dadaptlion",
    ):
        raise NotImplementedError(
            f"'{optimizer_name}' estimates a global step size over the whole "
            "tree and would couple fleet rows; use adamw/adam/lion"
        )
    K = n_sliders
    ts1000, scale1000 = train_grid_tables(schedule, sampler.kind)
    grid_stride = schedule.num_train_timesteps // max_denoising_steps

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if K % mesh.shape["dp"] != 0:
            raise ValueError(
                f"fleet size {K} must divide over dp={mesh.shape['dp']}"
            )
        row_sharding = NamedSharding(mesh, P("dp"))

    def constrain_rows(x):
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, row_sharding)
        return x

    def constrain_tree(tree):
        if mesh is None:
            return tree
        return jax.tree.map(constrain_rows, tree)

    def step_fn(state: SliderTrainState, unet_params, vae_params, batch):
        B = batch["images_high"].shape[1]
        KB = K * B

        def to_slider_blocks(a):
            """(2KB, ...) side-major rows -> (K, 2B, ...) per-slider blocks
            laid out [high x B, low x B] exactly like the solo step's
            concat — so one vmapped key draw per slider reproduces the
            solo bits."""
            a = a.reshape((2, K, B) + a.shape[1:])
            a = jnp.swapaxes(a, 0, 1)
            return a.reshape((K, 2 * B) + a.shape[3:])

        def from_slider_blocks(a):
            a = a.reshape((K, 2, B) + a.shape[2:])
            a = jnp.swapaxes(a, 0, 1)
            return a.reshape((2 * K * B,) + a.shape[3:])

        rows = jnp.arange(K)
        keys = jax.vmap(
            lambda r: jax.random.fold_in(jax.random.fold_in(state.key, r), state.step)
        )(rows)
        ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
        k_t, k_post, k_noise = (ks[:, j] for j in range(3))

        t_to = jax.vmap(
            lambda k: jax.random.randint(k, (), 1, max_denoising_steps - 1)
        )(k_t)  # (K,)

        imgs = jnp.concatenate(
            [
                batch["images_high"].reshape((KB,) + batch["images_high"].shape[2:]),
                batch["images_low"].reshape((KB,) + batch["images_low"].shape[2:]),
            ]
        )
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 127.5 - 1.0
        imgs = constrain_rows(imgs.astype(jnp.float32))
        mean, logvar = vae_mod.encode(vae_params, vae_cfg, imgs)
        lat = jax.vmap(vae_mod.sample_latents)(
            to_slider_blocks(mean), to_slider_blocks(logvar), k_post
        )
        lat = constrain_rows(vae_mod.normalize_latents(vae_cfg, from_slider_blocks(lat)))

        noise1 = jax.vmap(
            lambda k: jax.random.normal(k, (B,) + lat.shape[1:], lat.dtype)
        )(k_noise).reshape((KB,) + lat.shape[1:])
        noise = jnp.concatenate([noise1, noise1])  # same noise for ±s

        def per_row(v):
            """(K,) per-slider scalar -> (2KB,) per-row."""
            return jnp.tile(jnp.repeat(v, B, axis=0), 2)

        t_add = sampler.timesteps[t_to].astype(jnp.int32)  # 50-grid (quirk)
        noisy = schedule.add_noise(lat, noise, per_row(t_add))
        t_idx = t_to * grid_stride
        t_rows = per_row(ts1000[t_idx])
        x_in = constrain_rows(
            (noisy * per_row(scale1000[t_idx]).reshape(-1, 1, 1, 1)).astype(compute_dtype)
        )

        def rep(e):
            return jnp.repeat(e, B, axis=0).astype(compute_dtype) if B > 1 else e.astype(compute_dtype)

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
        sign = jnp.concatenate([jnp.ones(KB), -jnp.ones(KB)])
        mult = sign * per_row(batch["scale"])
        noise_f32 = jax.lax.stop_gradient(noise.astype(jnp.float32))

        def loss_fn(fleet_weights):
            w_rows = _tile_tree(
                _repeat_rows(constrain_tree(fleet_weights), B), 2
            )
            eps = unet2d.apply(
                unet_params, unet_cfg, x_in, t_rows, ehs, added_cond=added,
                lora=SliderLora(weights=w_rows, multiplier=mult), remat=remat,
            )
            diff = eps.astype(jnp.float32) - noise_f32
            # per-slider 2*mean over its own (2B, h, w, c) rows — the solo
            # step's accumulated-±s loss, slider by slider
            d2 = (diff * diff).reshape(2, K, -1)
            loss_vec = 2.0 * jnp.mean(d2, axis=(0, 2))
            return loss_vec.sum(), loss_vec

        (_, loss_vec), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.lora)
        grads = constrain_tree(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = constrain_tree(optax.apply_updates(state.lora, updates))
        new_state = state.replace(step=state.step + 1, lora=lora, opt_state=opt_state)
        return new_state, {"loss": loss_vec, "t_to": t_to, "scale": batch["scale"]}

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


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------


def train_fleet(
    config,
    prompt_sets: "list[tuple[str, list]]",
    models,
    *,
    mesh=None,
    resume_from: Optional[str] = None,
    seed: int = 0,
    on_step=None,
    shared_t_to: bool = False,
    t_to_mode: Optional[str] = None,
    t_to_strata: int = 8,
) -> "list[dict]":
    """Train len(prompt_sets) sliders concurrently; returns the solo LoRA
    trees in input order. `prompt_sets` is [(slider_name, [PromptSettings])].

    Fleet constraints vs the solo driver (training/driver.py): one static
    resolution/batch bucket across all sliders (rows share the compiled
    step), no dynamic_resolution, element-local optimizer.
    Each slider is saved as `{name}_last.{ext}` plus periodic
    `{name}_{i}steps.{ext}`, exactly the solo artifact format."""
    import json
    import time
    from pathlib import Path

    import numpy as np

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.driver import (
        PromptEmbedsCache,
        _state_bytes,
        _state_from_bytes,
        build_pairs,
    )

    tpu = config.tpu
    save_dir = Path(config.save.path)
    ext = ".safetensors" if config.save.format == "safetensors" else ".pt"
    names = [n for n, _ in prompt_sets]
    K = len(prompt_sets)

    buckets = {
        (s.resolution, s.batch_size)
        for _, settings in prompt_sets
        for s in settings
    }
    if len(buckets) != 1:
        raise ValueError(
            f"fleet training needs ONE (resolution, batch) bucket, got {buckets}"
        )
    if any(s.dynamic_resolution for _, ss in prompt_sets for s in ss):
        raise ValueError("fleet training does not support dynamic_resolution")
    (resolution, batch), = buckets

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

    # per-slider init keys: slider r trains exactly as a solo run seeded
    # fold_in(key(seed+1), r) / fold_in(key(seed), r)
    loras = [
        lnet.create_slider_network(
            jax.random.fold_in(jax.random.key(seed + 1), r),
            models.unet_params,
            rank=config.network.rank,
            alpha=config.network.alpha,
            train_method=config.network.training_method,
            network_type=config.network.type,
            dtype=jnp.float32,
        )
        for r in range(K)
    ]
    fleet_lora = stack_fleet(loras)
    print(f"fleet: {K} sliders x {len(loras[0])} LoRA modules")

    lr_schedule = opt_factory.make_lr_schedule(
        config.train.lr_scheduler, config.train.lr, config.train.iterations
    )
    optimizer = opt_factory.make_optimizer(
        config.train.optimizer,
        lr_schedule,
        opt_factory.parse_optimizer_args(config.train.optimizer_args),
        trainable_mask=lnet.trainable_mask(fleet_lora),
    )

    pairs = stack_fleet_pairs(
        [build_pairs(settings, cache, models.is_xl) for _, settings in prompt_sets]
    )

    chunk_cfg = max(1, tpu.steps_per_call)
    step_fns: dict = {}

    def get_step(chunk):
        if chunk not in step_fns:
            step_fns[chunk] = make_fleet_text_step(
                models.unet_config, schedule, sampler, optimizer,
                n_sliders=K,
                optimizer_name=config.train.optimizer,
                max_denoising_steps=config.train.max_denoising_steps,
                resolution=resolution,
                batch_size=batch * max(tpu.per_device_batch, 1),
                compute_dtype=compute_dtype,
                remat=tpu.remat,
                mesh=mesh,
                is_xl=models.is_xl,
                donate=tpu.donate,
                chunk=chunk,
                shared_t_to=shared_t_to,
                t_to_mode=t_to_mode,
                t_to_strata=t_to_strata,
            )
        return step_fns[chunk]

    state = SliderTrainState.create(jax.random.key(seed), fleet_lora, optimizer)
    if resume_from is not None:
        with open(resume_from, "rb") as f:
            state = _state_from_bytes(state, f.read())
        print(f"fleet resumed from {resume_from} at step {int(state.step)}")

    save_dir.mkdir(parents=True, exist_ok=True)
    with open(save_dir / f"{config.save.name}_fleet_metadata.json", "w") as f:
        json.dump(
            {
                "sliders": names,
                "prompts": {
                    n: [p.model_dump() for p in ss] for n, ss in prompt_sets
                },
                "config": json.loads(config.model_dump_json()),
            },
            f,
            indent=2,
        )

    def save_all(suffix: str):
        for name, solo in zip(names, unstack_fleet(jax.device_get(state.lora))):
            lora_io.save_slider(
                str(save_dir / f"{name}{suffix}{ext}"),
                solo,
                dtype=lora_io.numpy_precision(config.save.precision),
            )

    t_last = time.perf_counter()
    i = int(state.step)
    while i < config.train.iterations:
        n = min(chunk_cfg, config.train.iterations - i)
        for period in (config.save.per_steps, tpu.state_checkpoint_every):
            if period and period > 0:
                boundary = max(((i + period - 1) // period) * period, period)
                n = min(n, boundary - i + 1)
        state, metrics = get_step(n)(state, models.unet_params, pairs)
        per_step = (
            [jax.tree.map(lambda a, j=j: a[j], metrics) for j in range(n)]
            if n > 1
            else [metrics]
        )
        for j, m in enumerate(per_step):
            sj = i + j
            loss = np.asarray(m["loss"])
            if tpu.nan_check and not np.all(np.isfinite(loss)):
                raise FloatingPointError(f"non-finite fleet loss at step {sj}: {loss}")
            if sj % config.logging.log_every == 0 or sj == config.train.iterations - 1:
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                mean_loss = float(loss.mean())
                print(
                    f"fleet step {sj}: mean loss*1k={mean_loss * 1000:.4f} "
                    f"({K} sliders, {dt:.2f}s since last log)"
                )
            if on_step is not None:
                on_step(sj, state, m)
            if (
                config.save.per_steps
                and config.save.per_steps > 0
                and sj % config.save.per_steps == 0
                and sj != 0
                and sj != config.train.iterations - 1
            ):
                print("Saving...")
                save_all(f"_{sj}steps")
            if (
                tpu.state_checkpoint_every
                and sj % tpu.state_checkpoint_every == 0
                and sj != 0
            ):
                with open(save_dir / f"{config.save.name}_fleet_trainstate.msgpack", "wb") as f:
                    f.write(_state_bytes(state))
        i += n

    print("Saving...")
    save_all("_last")
    print("Done.")
    return unstack_fleet(jax.device_get(state.lora))
