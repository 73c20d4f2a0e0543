"""Prompt-to-prompt attention control: attention-map extraction and
word-index aggregation — the functional TPU equivalent of the reference's
controller rewiring and map utilities
(trainscripts/textsliders/ptp_utils.py:173-240 register_attention_control,
:243-295 aggregate_attention / show_cross_attention).

The reference monkey-patches CrossAttention.forward to route probabilities
through a mutable controller object. Here taps are a trace-scoped context
(ops/attention.AttentionTap): the UNet forward runs once under the tap and
the collected per-call-site probability tensors become OUTPUTS of the
jitted function — no module mutation, one compiled program.

Store keys follow the reference's AttentionStore convention:
"{down|mid|up}_{cross|self}" lists, in call order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.models import unet2d
from sliders_tpu.ops.attention import AttentionTap
from sliders_tpu.ops.basic import SliderLora


def place_in_unet(path: str) -> str:
    """'down' / 'mid' / 'up' from a call-site path (ptp_utils.py:220-231)."""
    if path.startswith("down_blocks"):
        return "down"
    if path.startswith("mid_block"):
        return "mid"
    if path.startswith("up_blocks"):
        return "up"
    raise ValueError(f"not a UNet attention path: {path}")


def is_cross(path: str) -> bool:
    return path.endswith("attn2")


def group_store(raw: dict) -> dict:
    """{path: probs} -> reference AttentionStore layout
    {'down_cross': [...], 'down_self': [...], 'mid_cross': ..., ...}
    in call order (ptp_utils.py AttentionStore.get_empty_store)."""
    out = {f"{p}_{c}": [] for p in ("down", "mid", "up") for c in ("cross", "self")}
    for path in raw:  # dict preserves call order
        key = f"{place_in_unet(path)}_{'cross' if is_cross(path) else 'self'}"
        out[key].append(raw[path])
    return out


def make_attention_maps_fn(
    unet_cfg: unet2d.UNetConfig,
    *,
    compute_dtype=jnp.float32,
    attn_filter=None,
):
    """Build a jitted fn(params, latents, t, ehs, added_cond=None, lora=None)
    -> (eps, {path: probs}) — one UNet forward that also returns every
    attention call's softmax probabilities (B, H, Lq, Lkv)."""

    def fn(params, latents, t, ehs, added_cond=None, lora=None):
        with AttentionTap(filter_fn=attn_filter) as tap:
            eps = unet2d.apply(
                params, unet_cfg, latents.astype(compute_dtype), t,
                ehs.astype(compute_dtype), added_cond=added_cond, lora=lora,
            )
            store = dict(tap.store)
        return eps, store

    return jax.jit(fn)


def aggregate_attention(
    store: dict,
    res: int,
    from_where: tuple = ("up", "down"),
    is_cross: bool = True,
    select: int = 0,
) -> np.ndarray:
    """Average the (res, res) attention maps from the chosen UNet places —
    ptp_utils.aggregate_attention (:243-259): keep maps whose query length
    is res**2, reshape to (H, res, res, Lkv), mean over layers+heads.

    `store` is the group_store() layout; `select` picks the batch element.
    Returns (res, res, Lkv) float32."""
    out = []
    num_pixels = res * res
    for place in from_where:
        for item in store[f"{place}_{'cross' if is_cross else 'self'}"]:
            a = np.asarray(item, np.float32)  # (B, H, Lq, Lkv)
            if a.shape[2] == num_pixels:
                out.append(a[select].reshape(-1, res, res, a.shape[3]))
    if not out:
        raise ValueError(f"no attention maps at res {res} in {from_where}")
    cat = np.concatenate(out, axis=0)
    return cat.mean(axis=0)


def word_attention_maps(
    tokenizer,
    prompt: str,
    agg: np.ndarray,
    normalize: bool = True,
) -> dict[str, np.ndarray]:
    """Per-word spatial cross-attention maps — the reference's
    show_cross_attention indexing (ptp_utils.py:262-295): decode each token
    position of the padded prompt and slice its column of the aggregated
    map. Returns {token_text: (res, res)} for bos/eos/word tokens present."""
    ids = [int(tokenizer.bos_token_id)] + tokenizer.tokenize(prompt) + [
        int(tokenizer.eos_token_id)
    ]
    inv = {v: k for k, v in tokenizer.vocab.items()}
    inv.update({v: k for k, v in getattr(tokenizer, "added_tokens", {}).items()})
    out: dict[str, np.ndarray] = {}
    for pos, tid in enumerate(ids):
        if pos >= agg.shape[-1]:
            break
        m = agg[..., pos]
        if normalize and m.max() > m.min():
            m = (m - m.min()) / (m.max() - m.min())
        tok = inv.get(tid, str(tid)).replace("</w>", "")
        out[f"{pos}:{tok}"] = m
    return out
