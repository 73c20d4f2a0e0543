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


# ---------------------------------------------------------------------------
# sequence-parallel (ring) routing — the scaling path past one chip's
# sequence ceiling (SURVEY §5.7; ops/ring_attention.py)
# ---------------------------------------------------------------------------

_RING_CTX = None


class ring_context:
    """While active (at TRACE time — enter it around the jit'd call or
    trace), every unmasked SELF-attention whose sequence divides the mesh's
    ring axis routes through ops.ring_attention: K/V blocks rotate over ICI
    via ppermute, per-chip attention memory is O(L / n_sp). Cross-attention
    (Lq != Lkv: the 77-token text context) and short sequences keep their
    single-chip kernels. This makes 2048px+ latents reachable with NO model
    code changes — the reference caps at 4096 tokens on one GPU.

    Inputs must be sequence-sharded over `axis` (and optionally batch over
    `batch_axis`) for the shard_map to avoid resharding copies.
    """

    def __init__(self, mesh, axis: str = "sp", batch_axis: Optional[str] = None,
                 min_seq: int = 2048):
        self.mesh, self.axis, self.batch_axis = mesh, axis, batch_axis
        self.min_seq = min_seq

    def __enter__(self):
        global _RING_CTX
        self._prev = _RING_CTX
        _RING_CTX = self
        return self

    def __exit__(self, *exc):
        global _RING_CTX
        _RING_CTX = self._prev
        return False

    def wants(self, q_shape, k_shape, mask) -> bool:
        if mask is not None or q_shape != k_shape:
            return False
        lq = q_shape[2]
        return lq >= self.min_seq and lq % self.mesh.shape[self.axis] == 0


# ---------------------------------------------------------------------------
# attention-probability taps (prompt-to-prompt attention control)
# ---------------------------------------------------------------------------

_ACTIVE_TAP = None


class AttentionTap:
    """Functional equivalent of the reference's attention-controller rewiring
    (trainscripts/textsliders/ptp_utils.py:173-240 register_attention_control):
    while active, every named attention call stores its softmax probabilities
    (B, H, Lq, Lkv) into `store` under the call-site path. Forces the XLA
    path (the flash kernels never materialize probs).

    Use inside ONE trace: run the model under `with AttentionTap() as tap:`
    and return `tap.store` from the traced function
    (pipelines/attention_control.py wraps this)."""

    def __init__(self, filter_fn=None):
        self.store: dict = {}
        self.filter_fn = filter_fn

    def __enter__(self):
        global _ACTIVE_TAP
        self._prev = _ACTIVE_TAP
        _ACTIVE_TAP = self
        return self

    def __exit__(self, *exc):
        global _ACTIVE_TAP
        _ACTIVE_TAP = self._prev
        return False

    def wants(self, name) -> bool:
        if name is None:
            return False
        return self.filter_fn is None or self.filter_fn(name)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * d)


def _xla_attention_probs(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array] = None
) -> tuple[jax.Array, jax.Array]:
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v), weights


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """(B, H, L, d) attention; logits/softmax in f32 for bf16 stability."""
    return _xla_attention_probs(q, k, v, mask)[0]


def _use_pallas(q: jax.Array, k: jax.Array, mask) -> bool:
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    from sliders_tpu.ops import flash_attention as fa

    return fa.supports(q.shape, k.shape)


def _use_sd_kernel_shapes(q_shape, k_shape, mask, itemsize: int = 2) -> bool:
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    from sliders_tpu.ops import pallas_attention as pa

    return pa.supports(q_shape, k_shape, itemsize=itemsize)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    name: Optional[str] = None,
) -> jax.Array:
    """q: (B, Lq, D); k, v: (B, Lkv, D_kv with D_kv == D). Returns (B, Lq, D).

    `mask` is additive, broadcastable to (B, H, Lq, Lkv). `name` is the
    call-site path; when an AttentionTap is active it keys the stored probs.
    """
    impl = impl or _DEFAULT_IMPL
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    if _ACTIVE_TAP is not None and _ACTIVE_TAP.wants(name):
        out, probs = _xla_attention_probs(qh, kh, vh, mask)
        _ACTIVE_TAP.store[name] = probs
        return _merge_heads(out)
    if _RING_CTX is not None and _RING_CTX.wants(qh.shape, kh.shape, mask):
        from sliders_tpu.ops.ring_attention import ring_attention

        out = ring_attention(
            qh, kh, vh, _RING_CTX.mesh, _RING_CTX.axis, _RING_CTX.batch_axis
        )
        return _merge_heads(out)
    # NOTE: routing the head-minor pa.sd_attention_blhd entry here (skipping
    # _split_heads) measured NEUTRAL end-to-end (bench 1.424 vs 1.436
    # steps/s) — the transposed level-0 layouts in the train step are XLA's
    # own conv-driven layout assignment, not forced by the custom call.
    if impl in ("auto", "pallas") and _use_sd_kernel_shapes(
        qh.shape, kh.shape, mask, itemsize=qh.dtype.itemsize
    ):
        from sliders_tpu.ops import pallas_attention as pa

        out = pa.sd_attention(qh, kh, vh)
    elif impl == "pallas" or (impl == "auto" and _use_pallas(qh, kh, mask)):
        from sliders_tpu.ops import flash_attention as fa

        out = fa.flash_attention(qh, kh, vh)
    else:
        out = xla_attention(qh, kh, vh, mask)
    return _merge_heads(out)


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (1, 1, L, L)."""
    mask = jnp.triu(jnp.full((length, length), jnp.finfo(jnp.float32).min), k=1)
    return mask[None, None].astype(dtype)
