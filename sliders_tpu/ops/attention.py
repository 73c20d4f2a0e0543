"""Multi-head attention with a pluggable implementation.

This replaces the reference's xformers/diffusers attention processors
(`unet.enable_xformers_memory_efficient_attention()`, train_lora.py:68) —
the only GPU-native surface the reference uses (SURVEY.md §2 preamble). On
TPU the hot path is the Pallas flash-attention kernel in
`sliders_tpu.ops.flash_attention`; the XLA path (einsum + f32 softmax) is the
reference numerics and the fallback for odd shapes / CPU tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "auto"


def set_default_attention_impl(impl: str) -> None:
    """'auto' | 'pallas' | 'xla'."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "pallas", "xla")
    _DEFAULT_IMPL = impl


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * d)


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """(B, H, L, d) attention; logits/softmax in f32 for bf16 stability."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _use_pallas(q: jax.Array, k: jax.Array, mask) -> bool:
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    from sliders_tpu.ops import flash_attention as fa

    return fa.supports(q.shape, k.shape)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """q: (B, Lq, D); k, v: (B, Lkv, D_kv with D_kv == D). Returns (B, Lq, D).

    `mask` is additive, broadcastable to (B, H, Lq, Lkv).
    """
    impl = impl or _DEFAULT_IMPL
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    if impl == "pallas" or (impl == "auto" and _use_pallas(qh, kh, mask)):
        from sliders_tpu.ops import flash_attention as fa

        out = fa.flash_attention(qh, kh, vh)
    else:
        out = xla_attention(qh, kh, vh, mask)
    return _merge_heads(out)


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (1, 1, L, L)."""
    mask = jnp.triu(jnp.full((length, length), jnp.finfo(jnp.float32).min), k=1)
    return mask[None, None].astype(dtype)
