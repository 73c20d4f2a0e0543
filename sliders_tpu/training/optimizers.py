"""Optimizer + LR-schedule factories (optax).

Name-compatible with the reference factories (train_util.py:336-404):
optimizers adamw / adam / lion / prodigy / dadaptadam / dadaptlion
(the 8-bit bitsandbytes variants map to their full-precision optax
equivalents — there is no bnb on TPU), and LR schedules constant / cosine /
cosine_with_restarts / step / linear with the exact torch scheduler
semantics the reference relies on (ConstantLR factor=1,
CosineAnnealingLR eta_min=lr/100, CosineAnnealingWarmRestarts T_0=iters/10
T_mult=2, StepLR step=iters/100 gamma=0.999, LinearLR factor 0.5 over
iters/100).
"""

from __future__ import annotations

import math
import warnings
from typing import Callable, Optional

import optax


def make_lr_schedule(
    name: Optional[str], lr: float, max_iterations: int, lr_min: Optional[float] = None
) -> Callable:
    lr_min = lr / 100 if lr_min is None else lr_min  # train_lora.py:94
    name = (name or "constant").lower()

    if name == "constant":
        return lambda step: lr

    if name == "cosine":
        def cosine(step):
            import jax.numpy as jnp

            t = jnp.minimum(step, max_iterations)
            return lr_min + (lr - lr_min) * (1 + jnp.cos(jnp.pi * t / max_iterations)) / 2
        return cosine

    if name == "cosine_with_restarts":
        T0 = max(max_iterations // 10, 1)

        def restarts(step):
            import jax.numpy as jnp

            step = jnp.asarray(step, jnp.float32)
            # cycle index n: cumulative length T0*(2^n - 1); T_mult=2
            n = jnp.floor(jnp.log2(step / T0 + 1.0))
            start = T0 * (2.0**n - 1.0)
            T_cur = step - start
            T_i = T0 * 2.0**n
            return lr_min + (lr - lr_min) * (1 + jnp.cos(jnp.pi * T_cur / T_i)) / 2
        return restarts

    if name == "step":
        size = max(max_iterations // 100, 1)

        def step_lr(step):
            return lr * 0.999 ** (step // size)
        return step_lr

    if name == "linear":
        total = max(max_iterations // 100, 1)

        def linear(step):
            import jax.numpy as jnp

            frac = jnp.clip(step / total, 0.0, 1.0)
            return lr * (0.5 + 0.5 * frac)
        return linear

    raise ValueError(
        "Scheduler must be cosine, cosine_with_restarts, step, linear or constant"
    )


def make_optimizer(
    name: str,
    lr_schedule: Callable,
    optimizer_kwargs: Optional[dict] = None,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """Build the optax chain; `trainable_mask` freezes non-trainable leaves
    (the LoRA alphas)."""
    kw = dict(optimizer_kwargs or {})
    name = name.lower()

    if name.endswith("8bit"):
        base = name[: -len("8bit")].rstrip("_")
        warnings.warn(f"{name}: bitsandbytes is CUDA-only; using full-precision {base}")
        name = base

    if name == "adamw":
        kw.setdefault("weight_decay", 1e-2)  # torch AdamW default
        tx = optax.adamw(lr_schedule, **kw)
    elif name == "adam":
        tx = optax.adam(lr_schedule, **kw)
    elif name == "lion":
        kw.setdefault("weight_decay", 0.0)
        tx = optax.lion(lr_schedule, **kw)
    elif name == "prodigy":
        tx = optax.contrib.prodigy(lr_schedule if callable(lr_schedule) else lr_schedule, **kw)
    elif name in ("dadaptadam", "dadaptadamw"):
        tx = optax.contrib.dadapt_adamw(lr_schedule, **kw)
    elif name == "dadaptlion":
        warnings.warn("dadaptlion: optax has no D-Adapt Lion; using dadapt_adamw")
        tx = optax.contrib.dadapt_adamw(lr_schedule, **kw)
    else:
        raise ValueError("Optimizer must be adam, adamw, lion or Prodigy")

    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            # hard-zero updates for frozen leaves (alpha buffers)
            optax.masked(optax.set_to_zero(), _invert(trainable_mask)),
        )
    return tx


def _invert(mask):
    import jax

    return jax.tree.map(lambda b: not b, mask)


def parse_optimizer_args(optimizer_args: str) -> dict:
    """Reference `k=v`-string parsing (train_lora.py:82-87)."""
    import ast

    out = {}
    if optimizer_args:
        for arg in optimizer_args.split(" "):
            if not arg:
                continue
            key, value = arg.split("=")
            out[key] = ast.literal_eval(value)
    return out
