"""Slider checkpoint I/O — interoperable with reference-trained sliders.

Key convention (lora.py:28,206-207,94 + save_weights lora.py:231-248):
  lora_unet_<module path, dots->underscores>.lora_down.weight   (torch layout)
  lora_unet_<...>.lora_up.weight
  lora_unet_<...>.alpha

Both `.safetensors` and torch `.pt` files are supported in both directions,
so sliders trained with the reference load here and vice versa. Because
underscore-flattening is lossy, loading resolves names against the
candidate module paths of the given UNet param tree.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from sliders_tpu.lora.network import target_module_paths

LORA_PREFIX_UNET = "lora_unet"


def numpy_precision(precision: str):
    """Save-precision string -> numpy dtype (bf16 via ml_dtypes)."""
    if precision in ("fp16", "float16"):
        return np.float16
    if precision in ("bf16", "bfloat16"):
        try:
            import ml_dtypes

            return ml_dtypes.bfloat16
        except ImportError:
            return np.float32
    return np.float32


def _flat_name(module_path: str) -> str:
    return f"{LORA_PREFIX_UNET}_{module_path.replace('.', '_')}"


def to_reference_state_dict(weights: dict, dtype=np.float32) -> dict[str, np.ndarray]:
    """Our pytree -> reference-layout flat state dict (torch tensor layouts)."""
    out: dict[str, np.ndarray] = {}
    for module, w in weights.items():
        name = _flat_name(module)
        down, up = np.asarray(w["down"]), np.asarray(w["up"])
        if down.ndim == 2:
            down_t, up_t = down.T, up.T  # (in,r)->(r,in), (r,out)->(out,r)
        else:
            down_t = down.transpose(3, 2, 0, 1)  # HWIO -> OIHW (O=r)
            up_t = up.transpose(3, 2, 0, 1)
        # contiguous copies: transposed views must not be serialized raw
        out[f"{name}.lora_down.weight"] = np.ascontiguousarray(down_t, dtype=dtype)
        out[f"{name}.lora_up.weight"] = np.ascontiguousarray(up_t, dtype=dtype)
        out[f"{name}.alpha"] = np.asarray(w["alpha"], dtype)
    return out


def from_reference_state_dict(state: dict[str, np.ndarray], unet_params: dict) -> dict:
    """Reference-layout flat state dict -> our pytree. Names are resolved
    against all eligible module paths of `unet_params`."""
    candidates = {
        _flat_name(p): p
        for p in target_module_paths(unet_params, "c3lier", "full")
    }
    weights: dict[str, dict] = {}
    for key, val in state.items():
        if not key.endswith(".lora_down.weight"):
            continue
        name = key[: -len(".lora_down.weight")]
        if name not in candidates:
            raise KeyError(f"cannot resolve LoRA module {name!r} against the UNet")
        module = candidates[name]
        down = np.asarray(state[f"{name}.lora_down.weight"])
        up = np.asarray(state[f"{name}.lora_up.weight"])
        alpha = state.get(f"{name}.alpha")
        if down.ndim == 2:
            down_j, up_j = down.T, up.T
            rank = down.shape[0]
        else:
            down_j = down.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            up_j = up.transpose(2, 3, 1, 0)
            rank = down.shape[0]
        a = float(np.asarray(alpha)) if alpha is not None else float(rank)
        weights[module] = {
            "down": jnp.asarray(down_j),
            "up": jnp.asarray(up_j),
            "alpha": jnp.asarray(a, jnp.float32),
        }
    if not weights:
        raise ValueError("no lora_down weights found in state dict")
    return weights


def save_slider(path: str, weights: dict, dtype=np.float32, metadata: Optional[dict] = None):
    """Write a slider checkpoint; format by extension (.safetensors / .pt),
    mirroring LoRANetwork.save_weights (lora.py:245-248)."""
    state = to_reference_state_dict(weights, dtype)
    ext = os.path.splitext(path)[1]
    if ext == ".safetensors":
        from safetensors.numpy import save_file

        save_file(state, path, metadata={k: str(v) for k, v in (metadata or {}).items()})
    else:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, path)


def load_slider(path: str, unet_params: dict) -> dict:
    """Read a slider checkpoint saved by us OR by the reference
    (generate_images_sd1.py:106 loads with torch.load)."""
    ext = os.path.splitext(path)[1]
    if ext == ".safetensors":
        from safetensors import safe_open

        state = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        state = {k: v.float().numpy() for k, v in raw.items()}
    return from_reference_state_dict(state, unet_params)
