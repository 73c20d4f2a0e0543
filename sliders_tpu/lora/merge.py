"""Merged-weight LoRA fast path.

On TPU, evaluating the low-rank branch ``up(down(x))`` at every call site is
bandwidth-hostile: a rank-4 tensor pads to 128 lanes, so each adapter costs a
large fraction of its base matmul. For a SCALAR slider multiplier the branch
is mathematically identical to running the base model with merged weights

    W' = W + multiplier * (alpha / rank) * (down @ up)

computed once per UNet invocation (a few MB of weight updates vs. extra work
inside every attention projection). Measured on v5e: branch forward ~35 ms
vs merged ~2 ms for SD1.5 at 512px.

The merge is differentiable w.r.t. the LoRA weights, so training uses it
inside the loss; per-SAMPLE multipliers (image sliders' fused ±s batch)
still use the branch path in ops/basic.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sliders_tpu.utils import pytree


def lora_deltas(lora_weights: dict, multiplier=1.0) -> dict:
    """Precompute {module_path: full-rank delta} = mult*(alpha/rank)*down@up.

    For per-step gated sampling, compute this ONCE and apply per step with
    `add_deltas(params, deltas, gate)` — an elementwise add over only the
    targeted weights (~tens of MB), instead of re-deriving the merge or
    running dynamic-trip loops."""
    out = {}
    for name, w in lora_weights.items():
        down = w["down"].astype(jnp.float32)
        up = w["up"].astype(jnp.float32)
        rank = down.shape[-1]
        scale = (multiplier * w["alpha"] / rank).astype(jnp.float32)
        if down.ndim == 2:
            delta = down @ up
        else:
            delta = jnp.einsum("hwir,ro->hwio", down, up[0, 0])
        out[name] = scale * delta
    return out


def add_deltas(unet_params: dict, deltas: dict, gate=1.0) -> dict:
    """params with `gate * delta` added to each targeted weight."""
    flat = pytree.flatten(unet_params)
    out = dict(flat)
    for name, delta in deltas.items():
        key = f"{name}.weight"
        base = flat[key]
        out[key] = (base.astype(jnp.float32) + gate * delta).astype(base.dtype)
    return pytree.unflatten(out)


def merge_lora_weights(unet_params: dict, lora_weights: dict, multiplier) -> dict:
    """Return a param tree with LoRA deltas folded into the targeted weights.

    Non-targeted leaves are passed through untouched (no copies under jit).
    """
    flat = pytree.flatten(unet_params)
    out = dict(flat)
    for name, w in lora_weights.items():
        key = f"{name}.weight"
        base = flat[key]
        down = w["down"].astype(jnp.float32)
        up = w["up"].astype(jnp.float32)
        rank = down.shape[-1]
        scale = (multiplier * w["alpha"] / rank).astype(jnp.float32)
        if base.ndim == 2:
            delta = down @ up
        else:
            # conv: down HWIO (kh,kw,in,r), up (1,1,r,out) -> (kh,kw,in,out)
            delta = jnp.einsum("hwir,ro->hwio", down, up[0, 0])
        out[key] = (base.astype(jnp.float32) + scale * delta).astype(base.dtype)
    return pytree.unflatten(out)
