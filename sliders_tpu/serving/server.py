"""Slider serving: a warm, compiled sampler behind a small HTTP API.

The reference has no serving story — its inference surface is batch eval
scripts and notebooks (eval-scripts/generate_images_sd1.py, the gradio
space is a separate HF repo). For production slider serving on TPU the
design constraints are different from a CUDA script:

  - Compilation is the expensive event (minutes through a remote-compile
    tunnel, CLAUDE.md), so the server keeps ONE jitted sampling program warm
    and shapes every request to hit it. LoRA weights are *inputs* to the
    jitted fn, so swapping sliders — or re-scaling a composition
    (lora/compose.py) — never recompiles as long as the adapter's pytree
    structure (module set + ranks) matches one already compiled; a new
    structure compiles once and is cached by jax.jit alongside the others.
  - The scale sweep IS the batch dimension: a request for k scales runs one
    batched denoise, padded up to a fixed bucket size (powers of two) so k=3
    and k=4 share an executable.
  - One process owns the TPU, so a single worker thread drains a request
    queue — and DYNAMICALLY BATCHES it: queued requests whose adapters
    share one pytree STRUCTURE — including DIFFERENT sliders — are
    coalesced into one larger denoise (start_noise and guidance ride as
    per-row vectors; distinct adapters — even of different RANKS, which
    zero-pad to a pow2 rank bucket — stack per row, lora/batch.py, the
    multi-tenant many-adapters-one-base pattern), rows split back per
    request afterwards. Per-row math is independent (per-sample
    norms/attention, per-row LoRA multipliers/weights), so batched results
    match solo runs bit-for-bit; bigger batches raise MXU utilization
    instead of queueing latency. Stochastic samplers (ddpm/euler_a) draw
    per-step noise from one key for the whole batch, so coalescing is
    DISABLED for them — outputs must not depend on concurrent traffic.

Endpoints (JSON in, JSON out; images as base64 PNG):
  GET  /healthz            -> {ok, is_xl, image_size, steps, sliders: [...]}
  POST /sliders            -> {name, path} or {name, compose: [{path, scale}]}
  POST /generate           -> {prompt, seed?, slider?, scales?, start_noise?,
                               negative_prompt?, guidance_scale?}
                           -> {images: [{scale, png: b64}, ...], latency_ms}
                              (ordered like the request's scales, so
                              duplicate scales each get their own image)

Run it: python -m sliders_tpu.cli.serve --base <snapshot> [--xl] [--port N]
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from typing import Optional

import numpy as np


_SCALE_BUCKETS = (1, 2, 4, 8, 16)


def _bucket(n: int, buckets=_SCALE_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"at most {buckets[-1]} scales per request, got {n}")


class _Pending:
    """One queued /generate request awaiting the batching worker."""

    __slots__ = (
        "prompt", "negative", "seed", "scales", "slider", "weights", "sig",
        "start_noise", "guidance", "event", "result", "error",
    )

    def __init__(self, prompt, negative, seed, scales, slider, weights,
                 sig, start_noise, guidance):
        self.prompt = prompt
        self.negative = negative
        self.seed = seed
        self.scales = scales
        self.slider = slider
        self.weights = weights
        self.sig = sig
        self.start_noise = start_noise
        self.guidance = guidance
        self.event = threading.Event()
        self.result = None
        self.error = None

    def compat_key(self):
        """Requests batch together iff their adapters share one pytree
        STRUCTURE (lora/batch.structure_signature) — different sliders
        coalesce into one denoise via per-row stacked weights. Prompt,
        negative, seed, scales, start_noise and guidance all vary per row
        (start_noise/guidance ride as (B,) vectors, cfg_combine broadcasts);
        slider-less requests group separately (their program has no LoRA
        branch at all)."""
        return self.sig


class SliderEngine:
    """Owns the models, the registry of loaded sliders, and the compiled
    sampler. Thread-safe: all device work happens under one lock."""

    def __init__(
        self,
        models,
        *,
        scheduler: str = "ddim",
        steps: int = 50,
        image_size: int = 512,
        guidance_scale: float = 7.5,
        start_noise: float = 750.0,
        compute_dtype=None,
        mesh=None,
        buckets=None,
        continuous: bool = False,
        continuous_rows: Optional[int] = None,
        chunk_steps: int = 5,
    ):
        import jax.numpy as jnp

        from sliders_tpu.diffusion import make_sampler, make_schedule
        from sliders_tpu.pipelines import text2image as t2i

        if models.vae_params is None:
            raise ValueError("serving needs the VAE (load with load_vae=True)")
        self.models = models
        self._base_params = models.unet_params  # LoRA target tree
        self.image_size = int(image_size)
        self.steps = int(steps)
        self.default_guidance = float(guidance_scale)
        self.default_start_noise = float(start_noise)
        self.dtype = compute_dtype if compute_dtype is not None else jnp.bfloat16
        self.sampler = make_sampler(make_schedule(), scheduler, num_steps=self.steps)
        self.fn = t2i.make_sampling_fn(
            models.unet_config,
            self.sampler,
            use_cfg=True,
            guidance_rescale=0.7 if models.is_xl else 0.0,
            compute_dtype=self.dtype,
            is_xl=models.is_xl,
            mesh=mesh,
        )
        self.family = "xl" if models.is_xl else "sd"
        if continuous:
            if mesh is not None:
                raise NotImplementedError(
                    "continuous batching + dp mesh is not supported yet; "
                    "use the batch-boundary engine for multi-chip serving"
                )
            # raises for stochastic samplers (per-step batch-shared noise)
            self._cont_fn = t2i.make_continuous_step_fn(
                models.unet_config,
                self.sampler,
                chunk=int(chunk_steps),
                use_cfg=True,
                guidance_rescale=0.7 if models.is_xl else 0.0,
                compute_dtype=self.dtype,
            )
        self._init_runtime(
            buckets,
            coalesce=self.sampler.kind not in ("ddpm", "euler_a"),
            dp=None if mesh is None else mesh.shape["dp"],
            continuous=continuous,
            continuous_rows=continuous_rows,
            chunk_steps=chunk_steps,
        )

    def _init_runtime(
        self, buckets, *, coalesce: bool, dp=None,
        continuous: bool = False, continuous_rows=None, chunk_steps: int = 5,
    ) -> None:
        """Shared engine runtime: bucket table, registry/device locks, embed
        cache, batching worker. Subclasses call this at the end of their
        __init__ after the sampler/fn are built."""
        import threading as _threading

        # multi-chip serving: batch rows shard over the dp axis, so every
        # bucket must be a dp multiple (the sweep pads up to the bucket).
        # `buckets` pins custom sizes: each bucket is one compiled program,
        # so a deployment that always sweeps 5 scales can serve exactly
        # (buckets=(5,)) instead of padding 5 -> 8 (-37% wasted rows).
        self._buckets = _SCALE_BUCKETS
        if buckets is not None:
            buckets = tuple(int(b) for b in buckets)
            if not buckets or any(b < 1 for b in buckets):
                raise ValueError(
                    f"buckets must be non-empty positive ints, got {buckets}"
                )
            if dp is not None and any(b % dp for b in buckets):
                raise ValueError(
                    f"buckets {buckets} must be multiples of dp={dp}"
                )
            self._buckets = tuple(sorted(buckets))
        elif dp is not None:
            self._buckets = tuple(
                dp * k for k in (1, 2, 4, 8, 16)
                if dp * k <= max(2 * dp, 2 * _SCALE_BUCKETS[-1])
            )
        self.sliders: dict[str, dict] = {}
        # _lock guards DEVICE work; _registry_lock guards the sliders dict,
        # so lookups/loads never wait behind a multi-second denoise
        self._lock = _threading.Lock()
        self._registry_lock = _threading.Lock()
        # (prompt, negative) -> encoded conditioning; serving traffic mostly
        # re-sweeps scales over a few prompts, so this skips the
        # tokenize+encode inside the lock on repeats. FIFO-capped.
        self._embed_cache: dict[tuple, tuple] = {}
        self._embed_cache_cap = 32
        # dynamic batching: handler threads enqueue, ONE worker drains —
        # coalescing every compatible queued request into a single denoise.
        # Stochastic samplers share one per-step noise key per denoise, so
        # they are served one request at a time (reproducibility).
        self._coalesce = coalesce
        self._queue: list[_Pending] = []
        self._queue_cv = _threading.Condition()
        self._closed = False
        self.request_timeout = 3600.0
        self.stats = {"requests": 0, "batches": 0, "rows": 0}
        self._continuous = bool(continuous)
        if self._continuous:
            if not coalesce:
                raise ValueError(
                    "continuous batching requires a deterministic sampler "
                    "(coalescing is disabled for ddpm/euler_a)"
                )
            self._cont_rows = int(
                continuous_rows if continuous_rows is not None
                else self._buckets[-1]
            )
            if self._cont_rows < max(self._buckets):
                # a request is validated against _buckets; every request
                # must fit the fixed row budget or it could never be served
                self._buckets = tuple(
                    b for b in self._buckets if b <= self._cont_rows
                )
                if not self._buckets:
                    raise ValueError(
                        f"continuous_rows={self._cont_rows} below the "
                        f"smallest scale bucket"
                    )
            self._cont_chunk = int(chunk_steps)
            if not 1 <= self._cont_chunk <= self.steps:
                raise ValueError(
                    f"chunk_steps={chunk_steps} must be in [1, {self.steps}]"
                )
            self.stats["chunks"] = 0
            target = self._continuous_worker_loop
        else:
            target = self._worker_loop
        _threading.Thread(target=target, daemon=True).start()

    def close(self) -> None:
        """Stop the batching worker (idempotent). Queued requests finish;
        new generate() calls are rejected."""
        with self._queue_cv:
            if self._closed:
                return
            self._closed = True
            self._queue.append(None)  # sentinel: worker exits after drain
            self._queue_cv.notify()

    # -- registry ---------------------------------------------------------

    def register_slider(self, name: str, weights: dict) -> None:
        """Register an in-memory adapter tree under the registry lock (the
        path all registry writes go through — load_slider/load_composition
        and programmatic callers like bench.py)."""
        with self._registry_lock:
            self.sliders[name] = weights

    def load_slider(self, name: str, path: str) -> None:
        from sliders_tpu.lora import io as lora_io

        self.register_slider(
            name, lora_io.load_slider(path, self._base_params)
        )

    def load_composition(self, name: str, parts: list) -> None:
        """parts: [{"path": ... or "name": <loaded slider>, "scale": s}]"""
        from sliders_tpu.lora import io as lora_io
        from sliders_tpu.lora.compose import compose_sliders

        adapters = []
        for part in parts:
            if not isinstance(part, dict) or not ({"name", "path"} & set(part)):
                raise ValueError(f"compose part needs 'name' or 'path': {part!r}")
            if "name" in part:
                with self._registry_lock:
                    if part["name"] not in self.sliders:
                        raise KeyError(f"slider {part['name']!r} not loaded")
                    w = self.sliders[part["name"]]
            else:
                w = lora_io.load_slider(part["path"], self._base_params)
            adapters.append((w, float(part.get("scale", 1.0))))
        composed = compose_sliders(adapters)
        with self._registry_lock:
            self.sliders[name] = composed

    # -- embedding --------------------------------------------------------

    def _encode(self, prompt: str, negative: str):
        """Cached encode_conditioning (pipelines/text2image.py): returns the
        1-row (cond, uncond, added) tuple. Caller holds self._lock."""
        from sliders_tpu.pipelines import text2image as t2i

        key = (prompt, negative)
        hit = self._embed_cache.get(key)
        if hit is None:
            hit = t2i.encode_conditioning(self.models, prompt, negative, self.image_size)
            if len(self._embed_cache) >= self._embed_cache_cap:
                self._embed_cache.pop(next(iter(self._embed_cache)))
            self._embed_cache[key] = hit
        return hit

    # -- generation -------------------------------------------------------

    def _make_pending(
        self,
        prompt: str,
        *,
        seed: int = 0,
        slider: Optional[str] = None,
        scales: Optional[list] = None,
        start_noise: Optional[float] = None,
        negative_prompt: str = "",
        guidance_scale: Optional[float] = None,
    ) -> _Pending:
        """Validate a request and resolve its slider — errors raise in the
        CALLER's thread (per-request), before anything reaches the batch."""
        scales = [float(s) for s in (scales if scales is not None else [0.0])]
        _bucket(len(scales), self._buckets)  # reject oversized sweeps up front
        weights, sig = None, None
        if slider is not None:
            with self._registry_lock:
                if slider not in self.sliders:
                    raise KeyError(f"slider {slider!r} not loaded")
                weights = self.sliders[slider]
            # per-request recompute is microseconds (shape/dtype tuples over
            # ~dozens of modules) and immune to hot-swap staleness
            from sliders_tpu.lora.batch import structure_signature

            sig = structure_signature(weights)
        return _Pending(
            prompt, negative_prompt, int(seed), scales, slider, weights, sig,
            self.default_start_noise if start_noise is None else float(start_noise),
            self.default_guidance if guidance_scale is None else float(guidance_scale),
        )

    def generate(
        self,
        prompt: str,
        *,
        seed: int = 0,
        slider: Optional[str] = None,
        scales: Optional[list] = None,
        start_noise: Optional[float] = None,
        negative_prompt: str = "",
        guidance_scale: Optional[float] = None,
    ) -> list:
        """Returns [(scale, PNG bytes), ...] for one prompt, ordered like the
        request's scales (duplicates each get their own image). Blocks until
        the batching worker has served the request; concurrent callers with
        compatible parameters share one batched denoise."""
        p = self._make_pending(
            prompt, seed=seed, slider=slider, scales=scales,
            start_noise=start_noise, negative_prompt=negative_prompt,
            guidance_scale=guidance_scale,
        )
        with self._queue_cv:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._queue.append(p)
            self._queue_cv.notify()
        if not p.event.wait(timeout=self.request_timeout):
            raise TimeoutError(
                f"request not served within {self.request_timeout}s"
            )
        if p.error is not None:
            raise p.error
        return p.result

    # -- batching worker ---------------------------------------------------

    def _worker_loop(self):
        max_rows = self._buckets[-1]
        while True:
            with self._queue_cv:
                while not self._queue:
                    self._queue_cv.wait()
                if self._queue[0] is None:  # close() sentinel
                    return
                batch = [self._queue.pop(0)]
                rows = len(batch[0].scales)
                key = batch[0].compat_key()
                i = 0
                while self._coalesce and i < len(self._queue):
                    q = self._queue[i]
                    if (
                        q is not None
                        and q.compat_key() == key
                        and rows + len(q.scales) <= max_rows
                    ):
                        batch.append(self._queue.pop(i))
                        rows += len(q.scales)
                    else:
                        i += 1
            try:
                # BaseException too: the worker is the only device owner —
                # if it died silently every caller would hang forever
                try:
                    results = self._generate_batch(batch)
                    for p, r in zip(batch, results):
                        p.result = r
                except BaseException as e:  # surfaced in every waiting caller
                    for p in batch:
                        p.error = e
            finally:
                for p in batch:
                    p.event.set()

    def _generate_batch(self, batch: list) -> list:
        """Run one denoise for all requests in `batch` (same compat_key) and
        split the rows back per request."""
        import jax.numpy as jnp

        rows = [len(p.scales) for p in batch]
        total = sum(rows)
        nb = _bucket(total, self._buckets)
        pad_n = nb - total
        scale_vec = jnp.asarray(
            [s for p in batch for s in p.scales] + [0.0] * pad_n, jnp.float32
        )
        # per-row slider gate and guidance strength (requests in one batch
        # may differ; padding rows reuse request 0's values)
        sn_vec = jnp.asarray(
            [p.start_noise for p, r in zip(batch, rows) for _ in range(r)]
            + [batch[0].start_noise] * pad_n,
            jnp.float32,
        )
        g_vec = jnp.asarray(
            [p.guidance for p, r in zip(batch, rows) for _ in range(r)]
            + [batch[0].guidance] * pad_n,
            jnp.float32,
        )
        # one adapter in flight -> pass its tree unchanged (the solo
        # program). Distinct adapters -> stack one copy per ROW
        # (lora/batch.py): program shapes depend only on the bucket, and
        # every row applies exactly its own request's slider, so the batch
        # stays bit-identical to solo runs. Padding rows ride at scale 0.
        weights = batch[0].weights
        if weights is not None and any(
            p.weights is not weights for p in batch[1:]
        ):
            from sliders_tpu.lora.batch import stack_sliders

            per_row = [p.weights for p, r in zip(batch, rows) for _ in range(r)]
            # pow2 rank buckets: a fleet of assorted-rank sliders compiles
            # O(log max_rank) stacked programs, not one per distinct max
            weights = stack_sliders(
                per_row + [batch[0].weights] * pad_n, round_ranks_pow2=True
            )

        with self._lock:
            imgs = self._run_rows(
                batch, rows, pad_n, weights, scale_vec, sn_vec, g_vec
            )
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["rows"] += total

        from PIL import Image

        results, off = [], 0
        for p, r in zip(batch, rows):
            out = []
            for i, s in enumerate(p.scales):
                buf = io.BytesIO()
                Image.fromarray(imgs[off + i]).save(buf, format="PNG")
                out.append((s, buf.getvalue()))
            results.append(out)
            off += r
        return results

    def _run_rows(self, batch, rows, pad_n, weights, scale_vec, sn_vec, g_vec):
        """Family-specific denoise of one padded row batch -> uint8 images
        (model-parallel point for subclasses; caller holds self._lock)."""
        import jax
        import jax.numpy as jnp

        from sliders_tpu.pipelines import text2image as t2i

        m = self.models
        conds, unconds, addeds, lat_parts = [], [], [], []
        for p, r in zip(batch, rows):
            cond, uncond, added1 = self._encode(p.prompt, p.negative)
            cond_b, uncond_b, added_b = t2i.tile_conditioning(
                cond, uncond, added1, r
            )
            conds.append(cond_b)
            unconds.append(uncond_b)
            addeds.append(added_b)
            lat_parts.append(
                jnp.tile(
                    t2i.initial_latents(
                        jax.random.key(p.seed), 1,
                        self.image_size, self.image_size,
                        self.sampler.init_noise_sigma,
                    ),
                    (r, 1, 1, 1),
                )
            )
        if pad_n:  # repeat the first row into the bucket padding
            conds.append(jnp.tile(conds[0][:1], (pad_n, 1, 1)))
            unconds.append(jnp.tile(unconds[0][:1], (pad_n, 1, 1)))
            lat_parts.append(jnp.tile(lat_parts[0][:1], (pad_n, 1, 1, 1)))
            if addeds[0] is not None:
                addeds.append(
                    {k: jnp.tile(v[:1], (pad_n, 1)) for k, v in addeds[0].items()}
                )
        cond_all = jnp.concatenate(conds)
        uncond_all = jnp.concatenate(unconds)
        added = (
            None
            if addeds[0] is None
            else {
                k: jnp.concatenate([a[k] for a in addeds]) for k in addeds[0]
            }
        )
        x = self.fn(
            m.unet_params,
            jnp.concatenate(lat_parts),
            cond_all,
            uncond_all,
            weights,
            scale_vec,
            sn_vec,
            g_vec,
            jax.random.key(batch[0].seed),
            added,
        )
        return np.asarray(t2i.decode_images(m.vae_params, m.vae_config, x))

    # -- step-level continuous batching -----------------------------------
    #
    # The batch-boundary worker above admits requests only between
    # denoises: an in-flight 50-step 512px denoise (~10 s on one chip)
    # blocks every newcomer for its full duration, so under overlapping
    # arrivals the bucket rows spend most of their time underfilled. The
    # continuous worker (SliderEngine(continuous=True)) instead keeps ONE
    # fixed row bucket permanently in flight and advances it `chunk_steps`
    # denoise steps per device call (pipelines/text2image.py
    # make_continuous_step_fn): every row carries its own step position,
    # requests JOIN mid-flight at chunk boundaries (a scatter into free
    # rows + a per-row sampler-state reset, one jitted dispatch) and EXIT
    # when their 50 steps complete (gather + VAE decode of just the done
    # rows). Per-row math is independent (per-sample norms/attention,
    # per-row stacked LoRA), so outputs stay bit-identical to solo runs at
    # the same bucket size — the vLLM-style continuous-batching economics
    # applied to the denoise loop the reference runs monolithically
    # (generate_images_xl.py:323-362).
    #
    # Admission compatibility = the same structure signature the
    # batch-boundary coalescer uses, PLUS exact pow2 rank-bucket equality
    # per module. Equality (not <=) is deliberate: zero rank-padding is
    # an exact no-op on TPU, but XLA:CPU codegen reassociates the adapter
    # einsum when the contraction width changes (measured ~1e-6 drift,
    # rank-2 rows riding a rank-4 bucket), which would break the
    # bit-identical-to-solo contract; with equal buckets every request
    # runs the same program shape its solo run uses. Mismatched-bucket
    # requests wait for the batch to drain (the boundary engine still
    # mixes them, lora/batch.py). Sliderless requests form their own
    # (LoRA-free) batches. Trade-off vs the boundary worker: the bucket
    # is always computed in full, so an idle engine serving one small
    # request pays the full-bucket step cost — continuous mode is for
    # sustained overlapping traffic.

    def _cont_request_rows(self, q: _Pending):
        """Per-request device inputs: (cond 1-row, uncond 1-row, added
        1-row dict|None, initial latent (1,h,w,4)) — the exact values the
        batch-boundary path feeds _run_rows, so trajectories match."""
        import jax
        import jax.numpy as jnp

        from sliders_tpu.pipelines import text2image as t2i

        cond, uncond, added = self._encode(q.prompt, q.negative)
        lat = t2i.initial_latents(
            jax.random.key(q.seed), 1, self.image_size, self.image_size,
            self.sampler.init_noise_sigma,
        ).astype(self.dtype)
        return cond, uncond, added, lat

    @staticmethod
    def _cont_rank_buckets(stacked) -> dict:
        return {name: e["down"].shape[-1] for name, e in stacked.items()}

    def _cont_fresh_state(self, new: list) -> dict:
        """Build the full bucket state from an admission into an EMPTY
        batch: rows of the admitted requests in their slots, free slots
        padded with row values that never advance (step_idx stays at n)."""
        import jax.numpy as jnp

        from sliders_tpu.lora.batch import stack_sliders

        N = self._cont_rows
        per_req = {}
        row_vals: list = [None] * N
        for slot, q, k in new:
            if id(q) not in per_req:
                per_req[id(q)] = self._cont_request_rows(q)
            row_vals[slot] = (per_req[id(q)], q, k)
        fill = next(v for v in row_vals if v is not None)
        row_vals = [v if v is not None else fill for v in row_vals]

        conds = jnp.concatenate([v[0][0] for v in row_vals])
        unconds = jnp.concatenate([v[0][1] for v in row_vals])
        added = None
        if row_vals[0][0][2] is not None:
            added = {
                k: jnp.concatenate([v[0][2][k] for v in row_vals])
                for k in row_vals[0][0][2]
            }
        x = jnp.concatenate([v[0][3] for v in row_vals])
        w = None
        if new[0][1].weights is not None:
            w = stack_sliders(
                [v[1].weights for v in row_vals], round_ranks_pow2=True
            )
        scale = jnp.asarray(
            [v[1].scales[v[2]] for v in row_vals], jnp.float32
        )
        sn = jnp.asarray([v[1].start_noise for v in row_vals], jnp.float32)
        g = jnp.asarray([v[1].guidance for v in row_vals], jnp.float32)
        return {
            "x": x, "s": self.sampler.init_state(x), "cond": conds,
            "uncond": unconds, "added": added, "w": w,
            "scale": scale, "sn": sn, "g": g,
        }

    def _cont_join_state(self, state: dict, new: list) -> dict:
        """Scatter an admission into a LIVE batch (one jitted dispatch):
        row-major leaves at the joining slots, the sampler-state columns
        (history-major) reset to zero."""
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from sliders_tpu.lora.batch import _pad_rank, stack_sliders

        N = self._cont_rows
        pos = _np.full(N, N, _np.int32)  # sentinel N -> dropped by scatter
        per_req = {}
        rows = []
        for j, (slot, q, k) in enumerate(new):
            pos[j] = slot
            if id(q) not in per_req:
                per_req[id(q)] = self._cont_request_rows(q)
            rows.append((per_req[id(q)], q, k))
        rows += [rows[0]] * (N - len(rows))  # padding rows are dropped

        upd = {
            "x": jnp.concatenate([v[0][3] for v in rows]),
            "cond": jnp.concatenate([v[0][0] for v in rows]),
            "uncond": jnp.concatenate([v[0][1] for v in rows]),
            "scale": jnp.asarray(
                [v[1].scales[v[2]] for v in rows], jnp.float32
            ),
            "sn": jnp.asarray([v[1].start_noise for v in rows], jnp.float32),
            "g": jnp.asarray([v[1].guidance for v in rows], jnp.float32),
            "added": None,
            "w": None,
        }
        if state["added"] is not None:
            upd["added"] = {
                k: jnp.concatenate([v[0][2][k] for v in rows])
                for k in state["added"]
            }
        if state["w"] is not None:
            w_new = stack_sliders(
                [v[1].weights for v in rows], round_ranks_pow2=True
            )
            live = self._cont_rank_buckets(state["w"])
            upd["w"] = {
                name: {
                    "down": _pad_rank(e["down"], e["down"].ndim - 1, live[name]),
                    "up": _pad_rank(e["up"], e["up"].ndim - 2, live[name]),
                    "alpha": e["alpha"],
                    "rank": e["rank"],
                }
                for name, e in w_new.items()
            }

        if self._cont_join_fn is None:
            def join(state, upd, pos):
                def row_set(old, nw):
                    return old.at[pos].set(nw.astype(old.dtype), mode="drop")

                out = dict(state)
                for k in ("x", "cond", "uncond", "scale", "sn", "g",
                          "added", "w"):
                    out[k] = jax.tree.map(row_set, state[k], upd[k])
                # joining rows restart their sampler history (LMS derivs
                # are history-major: (ORDER, N, ...) -> column scatter)
                out["s"] = jax.tree.map(
                    lambda old: old.at[:, pos].set(0.0, mode="drop"),
                    state["s"],
                )
                return out

            self._cont_join_fn = jax.jit(join, donate_argnums=(0,))
        return self._cont_join_fn(state, upd, jnp.asarray(pos))

    @staticmethod
    def _cont_req_buckets(q: _Pending) -> Optional[dict]:
        """pow2 rank bucket per module for a request's adapter (None for
        sliderless). Pure shape arithmetic — safe under the queue lock."""
        if q.weights is None:
            return None
        from sliders_tpu.lora.batch import _rank_axes

        out = {}
        for name, entry in q.weights.items():
            d_ax, _ = _rank_axes(entry)
            r = entry["down"].shape[d_ax]
            out[name] = 1 << (r - 1).bit_length()
        return out

    def _cont_fits(self, q: _Pending, buckets: Optional[dict]) -> bool:
        """Can `q` ride the batch whose per-module rank buckets are
        `buckets`? (signature compat is checked by the caller). EXACT
        equality, not <=: see the continuous-batching design note above."""
        return self._cont_req_buckets(q) == buckets

    def _cont_decode(self, state: dict, slots: list) -> "np.ndarray":
        """Decode just the completed rows (gather -> pow2 pad -> VAE)."""
        import jax
        import jax.numpy as jnp

        from sliders_tpu.pipelines import text2image as t2i

        if self._cont_decode_fn is None:
            m = self.models

            def dec(x, idx):
                return t2i.decode_images(
                    m.vae_params, m.vae_config, jnp.take(x, idx, axis=0)
                )

            self._cont_decode_fn = jax.jit(dec)
        n_done = len(slots)
        nb = min(1 << (n_done - 1).bit_length(), self._cont_rows)
        idx = np.full(max(nb, n_done), slots[0], np.int32)
        idx[:n_done] = slots
        return np.asarray(
            self._cont_decode_fn(state["x"], jnp.asarray(idx))
        )[:n_done]

    def _continuous_worker_loop(self):
        import jax.numpy as jnp

        N, C, n = self._cont_rows, self._cont_chunk, self.steps
        self._cont_join_fn = None
        self._cont_decode_fn = None
        state: Optional[dict] = None
        slot_req: list = [None] * N  # slot -> (pending, scale_index)
        step_idx = np.full(N, n, np.int32)
        batch_sig = None
        batch_buckets: Optional[dict] = None  # per-module pow2 rank bucket
        req_rows: dict = {}  # id(pending) -> (pending, [slots])

        while True:
            new: list = []
            with self._queue_cv:
                busy = any(s is not None for s in slot_req)
                while not self._queue and not busy:
                    self._queue_cv.wait()
                    busy = any(s is not None for s in slot_req)
                if not busy and self._queue and self._queue[0] is None:
                    return  # close(): drained, exit
                free = [j for j in range(N) if slot_req[j] is None]
                i = 0
                while i < len(self._queue):
                    q = self._queue[i]
                    if q is None:  # close sentinel: drain what's before it
                        break
                    if not busy and not new:
                        # empty batch: the head sets the compat class
                        batch_sig = q.sig
                        batch_buckets = self._cont_req_buckets(q)
                    if (
                        q.sig == batch_sig
                        and len(q.scales) <= len(free)
                        and self._cont_fits(q, batch_buckets)
                    ):
                        slots = [free.pop(0) for _ in q.scales]
                        for k, slot in enumerate(slots):
                            slot_req[slot] = (q, k)
                            new.append((slot, q, k))
                        req_rows[id(q)] = (q, slots)
                        self._queue.pop(i)
                    else:
                        i += 1
            try:
                if new:
                    with self._lock:
                        if not busy:
                            state = self._cont_fresh_state(new)
                        else:
                            state = self._cont_join_state(state, new)
                    for slot, q, k in new:
                        step_idx[slot] = 0
                    busy = True
                if not busy:
                    continue
                with self._lock:
                    x, s = self._cont_fn(
                        self.models.unet_params, state["x"], state["s"],
                        jnp.asarray(step_idx), state["cond"],
                        state["uncond"], state["w"], state["scale"],
                        state["sn"], state["g"], state["added"],
                    )
                    state["x"], state["s"] = x, s
                    self.stats["chunks"] += 1
                occupied = np.asarray(
                    [s is not None for s in slot_req], bool
                )
                step_idx = np.where(
                    occupied, np.minimum(step_idx + C, n), step_idx
                ).astype(np.int32)
                done = [
                    j for j in range(N)
                    if slot_req[j] is not None and step_idx[j] >= n
                ]
                if not done:
                    continue
                with self._lock:
                    imgs = self._cont_decode(state, done)
                    self.stats["batches"] += 1
                img_of = {slot: imgs[i] for i, slot in enumerate(done)}
                finished = {}
                for slot in done:
                    q, k = slot_req[slot]
                    finished.setdefault(id(q), q)
                from PIL import Image

                for qid, q in finished.items():
                    _, slots = req_rows.pop(qid)
                    out = []
                    for k, slot in enumerate(slots):
                        buf = io.BytesIO()
                        Image.fromarray(img_of[slot]).save(buf, format="PNG")
                        out.append((q.scales[k], buf.getvalue()))
                        slot_req[slot] = None
                        step_idx[slot] = n
                    q.result = out
                    self.stats["requests"] += 1
                    self.stats["rows"] += len(slots)
                    q.event.set()
            except BaseException as e:
                # device failure mid-flight: fail every slotted request and
                # reset the batch (their latents are unrecoverable)
                failed = {}
                for j in range(N):
                    if slot_req[j] is not None:
                        q, _ = slot_req[j]
                        failed[id(q)] = q
                        slot_req[j] = None
                        step_idx[j] = n
                req_rows.clear()
                state = None
                for q in failed.values():
                    q.error = e
                    q.event.set()

    def warmup(
        self,
        with_slider: Optional[str] = None,
        n_scales: int = 5,
        multi_tenant: bool = False,
    ) -> None:
        """Compile the hot program before serving traffic. Defaults to the
        reference sweep size (5 scales -> bucket 8); requests with other
        bucket sizes compile once on first hit.

        ``multi_tenant=True`` additionally compiles the per-row stacked
        executable of the same bucket (the program cross-SLIDER coalesced
        batches run, lora/batch.py) so the first mixed batch doesn't stall
        traffic on a compile. Requires ``with_slider``."""
        if multi_tenant:
            if with_slider is None:
                raise ValueError("multi_tenant warmup needs with_slider")
            if not self._coalesce:
                # stochastic samplers never coalesce, so the stacked
                # executable would never be hit — "warming" it would be a
                # silent no-op (two SOLO batches); fail before doing work
                raise ValueError(
                    f"multi_tenant warmup is meaningless with the "
                    f"{self.sampler.kind!r} sampler: coalescing is disabled "
                    f"for stochastic samplers, so no stacked program exists"
                )
        self.generate("warmup", seed=0, slider=with_slider,
                      scales=[0.0] * n_scales)
        if not multi_tenant:
            return
        if self._continuous:
            # warm the mid-flight JOIN path (scatter admit): start one
            # request, wait until its batch is actually advancing, then
            # enqueue a second that must join the live batch
            p1 = self._make_pending("warmup", seed=0, slider=with_slider,
                                    scales=[0.0])
            chunks0 = self.stats["chunks"]
            with self._queue_cv:
                if self._closed:
                    raise RuntimeError("engine is closed")
                self._queue.append(p1)
                self._queue_cv.notify()
            deadline = time.monotonic() + self.request_timeout
            while self.stats["chunks"] == chunks0 and not p1.event.is_set():
                if time.monotonic() > deadline:
                    raise TimeoutError("continuous warmup: batch never started")
                time.sleep(0.01)
            p2 = self._make_pending("warmup", seed=1, slider=with_slider,
                                    scales=[0.0])
            with self._queue_cv:
                self._queue.append(p2)
                self._queue_cv.notify()
            for p in (p1, p2):
                if not p.event.wait(timeout=self.request_timeout):
                    raise TimeoutError("continuous warmup timed out")
                if p.error is not None:
                    raise p.error
            return
        # two queued requests whose weight trees are distinct OBJECTS (a
        # shallow copy suffices — coalescing keys on structure, stacking
        # keys on identity) force the worker down the stacked path
        half = max(1, n_scales // 2)
        p1 = self._make_pending("warmup", seed=0, slider=with_slider,
                                scales=[0.0] * half)
        p2 = self._make_pending("warmup", seed=0, slider=with_slider,
                                scales=[0.0] * (n_scales - half or 1))
        p2.weights = dict(p2.weights)
        with self._queue_cv:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._queue.extend([p1, p2])
            self._queue_cv.notify()
        for p in (p1, p2):
            if not p.event.wait(timeout=self.request_timeout):
                raise TimeoutError("multi-tenant warmup timed out")
            if p.error is not None:
                raise p.error


class FluxSliderEngine(SliderEngine):
    """FLUX slider serving: the same queue/registry/dynamic-batching
    machinery over the flow-matching pipeline (the reference's FLUX
    inference surface, custom_flux_pipeline.py:694-766). Differences from
    SD/XL, all isolated here:

      - no CFG batch-doubling: ``guidance_scale`` is the distilled guidance
        EMBEDDING value (flux-dev; ignored for schnell),
      - the slider gate is the step-index skip ``skip_till`` (LoRA active
        when step i > skip_till, :703-711) riding in the start_noise slot;
        default -1.0 = always on; HTTP accepts it as ``skip_till``,
      - the flowmatch sampler is deterministic, so coalescing (and
        multi-tenant stacking, lora/batch.py) is always on,
      - ``mesh`` (with a ``pp`` axis) runs the MMDiT pipeline-parallel —
        the capacity path for full FLUX-dev, which exceeds one chip's HBM;
        params are layer-sharded at construction (parallel/pipeline.py).
    """

    def __init__(
        self,
        models,
        *,
        steps: int = 30,
        image_size: int = 512,
        guidance_scale: float = 3.5,
        skip_till: float = -1.0,
        compute_dtype=None,
        mesh=None,
        buckets=None,
        num_microbatches: int = 1,
    ):
        import jax.numpy as jnp

        from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
        from sliders_tpu.pipelines.flux_t2i import make_flux_sampling_fn

        if models.vae_params is None:
            raise ValueError("serving needs the VAE (load with load_vae=True)")
        self.models = models
        self._base_params = models.transformer_params
        self.family = "flux"
        self.image_size = int(image_size)
        self.steps = int(steps)
        self.default_guidance = float(guidance_scale)
        self.default_start_noise = float(skip_till)  # step-index gate
        self.dtype = compute_dtype if compute_dtype is not None else jnp.bfloat16
        self._latent_hw = self.image_size // 8
        seq_len = (self._latent_hw // 2) ** 2
        self.sampler = make_flowmatch_sampler(
            num_steps=self.steps, image_seq_len=seq_len
        )
        self._params = models.transformer_params
        if mesh is not None:
            from sliders_tpu.parallel.pipeline import flux_pp_params

            self._params = flux_pp_params(
                mesh, models.transformer_params, models.transformer_config
            )
        self.fn = make_flux_sampling_fn(
            models.transformer_config, self.sampler,
            latent_hw=self._latent_hw, compute_dtype=self.dtype, mesh=mesh,
            num_microbatches=num_microbatches,
        )
        self._init_runtime(buckets, coalesce=True)

    def _encode(self, prompt: str, negative: str):
        """Cached (pooled, t5_embeds) 1-row conditioning. FLUX has no CFG
        negative; `negative` is ignored (part of the shared request shape).
        Caller holds self._lock."""
        from sliders_tpu.pipelines.flux_t2i import encode_prompts_flux

        key = (prompt, "")
        hit = self._embed_cache.get(key)
        if hit is None:
            hit = encode_prompts_flux(self.models, [prompt])
            if len(self._embed_cache) >= self._embed_cache_cap:
                self._embed_cache.pop(next(iter(self._embed_cache)))
            self._embed_cache[key] = hit
        return hit

    def _run_rows(self, batch, rows, pad_n, weights, scale_vec, sn_vec, g_vec):
        import jax
        import jax.numpy as jnp

        from sliders_tpu.models import flux
        from sliders_tpu.pipelines import text2image as t2i
        from sliders_tpu.pipelines.flux_t2i import initial_packed_latents

        m = self.models
        pooleds, t5s, lat_parts = [], [], []
        for p, r in zip(batch, rows):
            pooled, t5e = self._encode(p.prompt, p.negative)
            pooleds.append(jnp.tile(pooled, (r, 1)))
            t5s.append(jnp.tile(t5e, (r, 1, 1)))
            lat_parts.append(
                jnp.tile(
                    initial_packed_latents(
                        jax.random.key(p.seed), 1,
                        self.image_size, self.image_size,
                        m.vae_config.latent_channels,
                    ),
                    (r, 1, 1),
                )
            )
        if pad_n:  # repeat the first row into the bucket padding
            pooleds.append(jnp.tile(pooleds[0][:1], (pad_n, 1)))
            t5s.append(jnp.tile(t5s[0][:1], (pad_n, 1, 1)))
            lat_parts.append(jnp.tile(lat_parts[0][:1], (pad_n, 1, 1)))
        x = self.fn(
            self._params,
            jnp.concatenate(lat_parts),
            jnp.concatenate(pooleds),
            jnp.concatenate(t5s),
            weights,
            scale_vec,
            sn_vec,  # per-row skip_till
            g_vec,
        )
        lat = flux.unpack_latents(x, self._latent_hw, self._latent_hw)
        return np.asarray(t2i.decode_images(m.vae_params, m.vae_config, lat))


# -- HTTP layer -----------------------------------------------------------


def make_http_server(engine: SliderEngine, host: str = "127.0.0.1", port: int = 8000):
    """ThreadingHTTPServer over the engine (stdlib only). Handlers validate
    JSON and call the engine; device work serializes on the engine lock."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> dict:
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length) if length else b"{}"
            return json.loads(raw)

        def do_GET(self):
            if self.path == "/healthz":
                with engine._registry_lock:  # snapshot vs concurrent /sliders
                    names = sorted(engine.sliders)
                self._send(
                    200,
                    {
                        "ok": True,
                        "family": engine.family,
                        "is_xl": engine.family == "xl",
                        "image_size": engine.image_size,
                        "steps": engine.steps,
                        "sliders": names,
                        "stats": dict(engine.stats),
                    },
                )
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                req = self._read_json()
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad json: {e}"})
            if not isinstance(req, dict):
                return self._send(400, {"error": "body must be a JSON object"})
            try:
                if self.path == "/sliders":
                    missing = {"name"} - set(req)
                    if "compose" not in req:
                        missing |= {"path"} - set(req)
                    if missing:
                        return self._send(
                            400, {"error": f"missing field(s): {sorted(missing)}"}
                        )
                    name = req["name"]
                    if "compose" in req:
                        engine.load_composition(name, req["compose"])
                    else:
                        engine.load_slider(name, req["path"])
                    return self._send(200, {"ok": True, "name": name})
                if self.path == "/generate":
                    if "prompt" not in req:
                        return self._send(400, {"error": "missing field(s): ['prompt']"})
                    t0 = time.perf_counter()
                    imgs = engine.generate(
                        req["prompt"],
                        seed=req.get("seed", 0),
                        slider=req.get("slider"),
                        scales=req.get("scales"),
                        # FLUX engines gate by step index; "skip_till" is
                        # the family-appropriate alias for the same slot
                        start_noise=req.get("start_noise", req.get("skip_till")),
                        negative_prompt=req.get("negative_prompt", ""),
                        guidance_scale=req.get("guidance_scale"),
                    )
                    return self._send(
                        200,
                        {
                            "images": [
                                {"scale": s, "png": base64.b64encode(png).decode()}
                                for s, png in imgs
                            ],
                            "latency_ms": round((time.perf_counter() - t0) * 1e3, 1),
                        },
                    )
                return self._send(404, {"error": f"no route {self.path}"})
            except KeyError as e:
                # fields were validated above; a KeyError from the engine
                # means an unknown slider/composition name
                return self._send(404, {"error": f"unknown: {e}"})
            except TimeoutError as e:  # before OSError: it's a subclass
                return self._send(504, {"error": str(e)})
            except (TypeError, ValueError, OSError) as e:
                return self._send(400, {"error": str(e)})
            except Exception as e:  # never drop the connection without a reply
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)
