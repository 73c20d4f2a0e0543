"""Slider LoRA network: targeting rules + initialization.

Functional re-design of the reference `LoRANetwork`
(trainscripts/textsliders/lora.py:115-218): instead of monkey-patching
forwards, we enumerate the target Linear/Conv call sites of the UNet param
tree and build a separate LoRA pytree keyed by dotted module path; the UNet
apply adds the low-rank branch at matching call sites (ops/basic.py) scaled
by a traced slider multiplier.

Targeting reproduces the reference exactly:
  - network type 'lierla' targets the `Attention` parent class
    (lora.py:15-18,30) -> to_q/to_k/to_v/to_out.0 of every attn1/attn2;
  - 'c3lier' additionally targets ResnetBlock2D / Downsample2D / Upsample2D
    (and DownBlock2D/UpBlock2D, whose Linear/Conv children are the same set
    after the reference's name dedup, lora.py:19-26,214-216)
    -> conv1/conv2/time_emb_proj/conv_shortcut + the sampler convs;
  - train_method filters on the parent module name and child name
    (lora.py:176-205): noxattn / innoxattn / selfattn / xattn / xattn-strict
    / full / noxattn-hspace / noxattn-hspace-last;
  - conv rank clamped to min(rank, in, out) (lora.py:78-80);
  - init: kaiming-uniform on down (a=1 for text sliders, lora.py:97;
    a=sqrt(5) for the imagesliders copy, imagesliders/lora.py:96), zeros on
    up, alpha stored per module with alpha=rank when 0/None (lora.py:90-94).
"""

from __future__ import annotations

import math
import re
from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.utils import pytree

# parent-class patterns over dotted param paths -> child leaf names
_ATTN_PARENT = re.compile(r"^(.*\battn[12])\.(to_q|to_k|to_v|to_out\.0)\.weight$")
# FLUX Attention parents: transformer_blocks.N.attn / single_transformer_blocks.N.attn
# (flux-sliders targets the same 'Attention' class, flux lora.py:24-30)
_FLUX_ATTN_PARENT = re.compile(
    r"^(.*transformer_blocks\.\d+\.attn)\."  # matches single_transformer_blocks too
    r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|to_out\.0|to_add_out)\.weight$"
)
_RESNET_PARENT = re.compile(
    r"^(.*\bresnets\.\d+)\.(conv1|conv2|time_emb_proj|conv_shortcut)\.weight$"
)
_DOWNSAMPLER = re.compile(r"^(.*\bdownsamplers\.0)\.(conv)\.weight$")
_UPSAMPLER = re.compile(r"^(.*\bupsamplers\.0)\.(conv)\.weight$")

CONV_PATTERNS = (_RESNET_PARENT, _DOWNSAMPLER, _UPSAMPLER)


def _method_allows(parent: str, child: str, train_method: str) -> bool:
    """Name filters of the reference create_modules (lora.py:176-205 for the
    SD copies; flux lora.py:217-231 for the FLUX copy, whose xattn* methods
    filter on 'attn' instead of 'attn2' — FLUX attention parents are named
    '...transformer_blocks.N.attn' with no 1/2 suffix)."""
    is_flux = parent.endswith(".attn")
    if train_method in ("noxattn", "noxattn-hspace", "noxattn-hspace-last"):
        if "attn2" in parent or "time_embed" in parent:
            return False
    elif train_method == "innoxattn":
        if "attn2" in parent:
            return False
    elif train_method == "selfattn":
        if "attn1" not in parent:
            return False
    elif train_method in ("xattn", "xattn-strict"):
        if not ("attn" in parent if is_flux else "attn2" in parent):
            return False
    elif train_method in ("xattn-up", "xattn-down", "xattn-mid"):
        # flux lora.py:222-231: 'attn' in name + block-position substring
        if "attn" not in parent:
            return False
        pos = {"xattn-up": "up_block", "xattn-down": "down_block", "xattn-mid": "mid_block"}
        if pos[train_method] not in parent:
            return False
    elif train_method == "full":
        pass
    else:
        raise NotImplementedError(f"train_method: {train_method} is not implemented.")

    if train_method == "xattn-strict" and "out" in child:
        return False
    if train_method == "noxattn-hspace" and "mid_block" not in parent:
        return False
    if train_method == "noxattn-hspace-last":
        if "mid_block" not in parent or ".1" not in parent or "conv2" not in child:
            return False
    return True


def target_module_paths(
    unet_params: dict,
    network_type: str = "lierla",
    train_method: str = "full",
) -> list[str]:
    """Dotted module paths (call-site names) that receive LoRA."""
    flat = pytree.flatten(unet_params)
    patterns = [_ATTN_PARENT, _FLUX_ATTN_PARENT]
    if network_type == "c3lier":
        patterns += list(CONV_PATTERNS)
    elif network_type != "lierla":
        raise ValueError(f"unknown network type {network_type}")

    out = []
    seen = set()
    for path in flat:
        for pat in patterns:
            m = pat.match(path)
            if m is None:
                continue
            parent, child = m.group(1), m.group(2)
            if not _method_allows(parent, child, train_method):
                continue
            module = f"{parent}.{child}"
            if module not in seen:
                seen.add(module)
                out.append(module)
    return sorted(out)


def _kaiming_uniform(key, shape, fan_in: int, a: float, dtype):
    bound = math.sqrt(6.0 / ((1.0 + a * a) * fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def create_slider_network(
    key: jax.Array,
    unet_params: dict,
    rank: int = 4,
    alpha: float = 1.0,
    train_method: str = "full",
    network_type: str = "lierla",
    init_a: float = 1.0,
    ortho_up: bool = False,
    dtype=jnp.float32,
) -> dict:
    """Build the LoRA weights pytree {module_path: {'down','up','alpha'}}.

    `ortho_up=True` is the flux-sliders variant (flux lora.py:52-69): up is
    initialized from random columns of a random orthogonal basis (and should
    be frozen by the training mask — see `trainable_mask(ortho_up=True)`);
    down still gets kaiming init... note the reference zero-path: with ortho
    up, down is trained from kaiming-uniform as usual.
    """
    modules = target_module_paths(unet_params, network_type, train_method)
    flat = pytree.flatten(unet_params)
    weights: dict[str, dict] = {}
    for idx, module in enumerate(modules):
        w = flat[f"{module}.weight"]
        k = jax.random.fold_in(key, idx)
        if w.ndim == 2:  # linear (in, out)
            d_in, d_out = w.shape
            r = rank
            down = _kaiming_uniform(k, (d_in, r), d_in, init_a, dtype)
            if ortho_up:
                k2, k3 = jax.random.split(jax.random.fold_in(k, 1))
                q, _ = jnp.linalg.qr(jax.random.normal(k2, (d_out, d_out)))
                # distinct columns (the reference's randint can duplicate,
                # flux lora.py:65 — clearly unintended; we sample w/o repl.)
                cols = jax.random.choice(k3, d_out, (r,), replace=False)
                up = q[:, cols].T.astype(dtype)  # (r, d_out) orthonormal rows
            else:
                up = jnp.zeros((r, d_out), dtype)
        else:  # conv HWIO
            kh, kw, d_in, d_out = w.shape
            r = min(rank, d_in, d_out)  # lora.py:78-80 clamp
            down = _kaiming_uniform(k, (kh, kw, d_in, r), d_in * kh * kw, init_a, dtype)
            up = jnp.zeros((1, 1, r, d_out), dtype)
        a = float(alpha) if alpha not in (None, 0) else float(r)
        weights[module] = {"down": down, "up": up, "alpha": jnp.asarray(a, dtype)}
    if not weights:
        raise ValueError(
            f"no LoRA targets for type={network_type} method={train_method}"
        )
    return weights


def trainable_mask(weights: dict, ortho_up: bool = False) -> dict:
    """True for trainable leaves (down/up), False for alpha (a constant
    buffer in the reference, lora.py:94). With `ortho_up`, up is frozen too —
    the flux-sliders optimizer trains only lora_down for non-'full' methods
    (flux lora.py:268-280)."""
    return {
        m: {"down": True, "up": not ortho_up, "alpha": False} for m in weights
    }


def param_count(weights: dict) -> int:
    return sum(
        math.prod(w[k].shape) for w in weights.values() for k in ("down", "up")
    )
