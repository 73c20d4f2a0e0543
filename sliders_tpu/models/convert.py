"""HF checkpoint -> sliders_tpu param-tree conversion.

The reference loads weights through diffusers/transformers `from_pretrained`
(model_util.py:29-176). Here the conversion is mechanical because our param
trees mirror the HF state_dict paths exactly; the only transforms are layout
transposes into TPU-friendly shapes, done once at load:
  - nn.Linear weights  (out, in)        -> (in, out)
  - nn.Conv2d weights  (out, in, kh, kw) -> (kh, kw, in, out)  [OIHW -> HWIO]
  - nn.Embedding / norm weights unchanged.

Works from safetensors files on local disk (a HF snapshot directory) — no
hub access required.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Mapping

import numpy as np

from sliders_tpu.utils import pytree

# 2-D weights that are NOT linear layers (keep (rows, cols) as stored)
_EMBEDDING_SUFFIXES = (
    "token_embedding.weight",
    "position_embedding.weight",
    "shared.weight",  # T5 token embedding
    "embed_tokens.weight",
    "relative_attention_bias.weight",
    "pos_embed.weight",
)


def is_embedding_path(path: str) -> bool:
    return any(path.endswith(s) for s in _EMBEDDING_SUFFIXES)


def convert_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    """torch-layout flat state dict -> nested JAX-layout param tree."""
    out: dict[str, np.ndarray] = {}
    for path, w in state.items():
        w = np.asarray(w)
        if path.endswith(".weight") and not is_embedding_path(path):
            if w.ndim == 2:
                w = w.T  # (out, in) -> (in, out)
            elif w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[path] = w
    return pytree.unflatten(out)


def to_torch_layout(tree: dict) -> dict[str, np.ndarray]:
    """Inverse of convert_state_dict (for exporting checkpoints)."""
    out: dict[str, np.ndarray] = {}
    for path, w in pytree.flatten(tree).items():
        w = np.asarray(w)
        if path.endswith(".weight") and not is_embedding_path(path):
            if w.ndim == 2:
                w = w.T
            elif w.ndim == 4:
                w = w.transpose(3, 2, 0, 1)
        out[path] = w
    return out


def load_safetensors_files(paths: Iterable[str]) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    for path in paths:
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


def _component_files(component_dir: str) -> list[str]:
    """All model safetensors shards in a HF component directory."""
    index = os.path.join(component_dir, "diffusion_pytorch_model.safetensors.index.json")
    for idx in (index, os.path.join(component_dir, "model.safetensors.index.json")):
        if os.path.exists(idx):
            with open(idx) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            return [os.path.join(component_dir, s) for s in shards]
    files = [
        os.path.join(component_dir, f)
        for f in sorted(os.listdir(component_dir))
        if f.endswith(".safetensors")
    ]
    if not files:
        raise FileNotFoundError(f"no safetensors in {component_dir}")
    return files


def load_component(model_dir: str, subfolder: str) -> dict:
    """Load one pipeline component (e.g. 'unet', 'text_encoder', 'vae') from
    a local diffusers snapshot directory into our param tree."""
    comp = os.path.join(model_dir, subfolder)
    state = load_safetensors_files(_component_files(comp))
    return convert_state_dict(state)


def load_component_config(model_dir: str, subfolder: str) -> dict:
    for name in ("config.json",):
        p = os.path.join(model_dir, subfolder, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    raise FileNotFoundError(f"no config.json under {model_dir}/{subfolder}")


def cast_tree(tree: dict, dtype) -> dict:
    import jax.numpy as jnp

    return pytree.map_leaves(
        lambda _, w: jnp.asarray(w, dtype)
        if np.issubdtype(np.asarray(w).dtype, np.floating)
        else jnp.asarray(w),
        tree,
    )
