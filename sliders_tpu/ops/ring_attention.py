"""Ring attention over a sequence-parallel (``sp``) mesh axis.

The reference has no distribution at all and caps attention at 4096 tokens
(SDXL 1024px latents — SURVEY.md §5.7: "no cross-chip sequence parallelism
is needed at these sizes, but the attention kernel should be written
blockwise so a future ring extension over ICI is additive, not a rewrite").
This module IS that ring extension: the TPU-native scaling path past the
reference's resolution ceiling (2048px+ latents, long FLUX joint sequences),
kept out of the default path because every reference-protocol shape fits a
single chip.

Mechanism: queries stay resident on their shard; K/V blocks rotate around
the ICI ring via ``lax.ppermute`` neighbor exchange (bandwidth-optimal —
no K/V all-gather ever materializes), and softmax is accumulated online
with an f32 running max / normalizer. The blockwise recurrence is the same
streaming softmax the Pallas kernel (ops/pallas_attention.py) runs across
its VMEM q-blocks; here the blocks are device shards, so per-chip memory
is O(L / n_sp) and compute overlaps the permute XLA schedules around it.

The online merge is order-independent, so the result equals full-softmax
attention (ops/attention.xla_attention) up to f32 rounding — parity-pinned
in tests/test_ring_attention.py on the 8-virtual-device mesh. The ring is
differentiable: JAX transposes ``ppermute`` as the inverse rotation, so the
backward pass is the same ring in reverse (gradient parity also pinned).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _online_update(qf, kb, vb, m, l, acc):
    """One streaming-softmax update of (m, l, acc) against K/V block
    (kb, vb). qf pre-scaled f32."""
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32))
    m_new = jnp.maximum(m, s.max(axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + p.sum(axis=-1)
    acc = acc * corr[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32)
    )
    return m_new, l, acc


def _ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    q_chunk: int = 1024,
) -> jax.Array:
    """Per-shard body under shard_map: q/k/v are the LOCAL (B, H, Lloc, d)
    blocks; returns the local (B, H, Lloc, d) output rows.

    Within each ring round the query rows are processed in ``q_chunk``
    slices (lax.map — sequential, so only ONE (q_chunk, Lloc) f32 score
    block is ever live), bounding per-shard attention memory at
    O(q_chunk * L/sp) instead of O((L/sp)^2) — the within-shard blocking
    the 2048px+ regime needs (VERDICT r3 weak 6). Reference-scale shards
    (Lq <= q_chunk) keep the single-block fast path."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32) * scale
    B, H, Lq, d = q.shape
    m = jnp.full((B, H, Lq), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Lq), jnp.float32)
    acc = jnp.zeros((B, H, Lq, d), jnp.float32)
    chunked = Lq > q_chunk and Lq % q_chunk == 0
    if chunked:
        nc = Lq // q_chunk
        # chunk-major layout so lax.map slices contiguously
        qf = qf.reshape(B, H, nc, q_chunk, d).transpose(2, 0, 1, 3, 4)
        m = m.reshape(B, H, nc, q_chunk).transpose(2, 0, 1, 3)
        l = l.reshape(B, H, nc, q_chunk).transpose(2, 0, 1, 3)
        acc = acc.reshape(B, H, nc, q_chunk, d).transpose(2, 0, 1, 3, 4)
    kb, vb = k, v
    # shift every K/V block to the next device; after `axis_size` rounds each
    # shard has seen every block (processing order differs per shard — the
    # online merge is order-independent)
    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
    for step in range(axis_size):
        if chunked:
            kb_c, vb_c = kb, vb

            def one_chunk(args, kb_c=kb_c, vb_c=vb_c):
                qf_c, m_c, l_c, acc_c = args
                return _online_update(qf_c, kb_c, vb_c, m_c, l_c, acc_c)

            m, l, acc = jax.lax.map(one_chunk, (qf, m, l, acc))
        else:
            m, l, acc = _online_update(qf, kb, vb, m, l, acc)
        if step + 1 < axis_size:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    out = acc / l[..., None]
    if chunked:
        out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, Lq, d)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
    q_chunk: int = 1024,
) -> jax.Array:
    """Exact (unmasked) attention with the sequence ring-sharded over ICI.

    q, k, v: GLOBAL (B, H, L, d) arrays; L is sharded over mesh axis
    ``axis`` (shard_map partitions them; pre-placing with the matching
    NamedSharding avoids a resharding copy). ``batch_axis`` optionally
    also shards B (data parallel within the same call). The ``axis`` size
    must divide L. Self-attention only (Lq == Lkv rotates the same blocks);
    diffusion attention carries no mask, so none is supported.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis (axes: {mesh.axis_names})")
    n = mesh.shape[axis]
    L = q.shape[2]
    if L % n != 0:
        raise ValueError(f"sequence length {L} not divisible by {axis}={n}")
    if k.shape != q.shape or v.shape != q.shape:
        raise ValueError("ring attention is self-attention: q/k/v shapes must match")
    spec = P(batch_axis, None, axis, None)
    f = jax.shard_map(
        partial(
            _ring_attention_local, axis_name=axis, axis_size=n, q_chunk=q_chunk
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return f(q, k, v)


def ring_multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """(B, L, D) entry matching ops.attention.multihead_attention's contract
    for the unmasked self-attention case."""
    from sliders_tpu.ops.attention import _merge_heads, _split_heads

    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    return _merge_heads(ring_attention(qh, kh, vh, mesh, axis, batch_axis))
