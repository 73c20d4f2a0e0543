"""Per-row stacked LoRA adapters: serve DIFFERENT sliders in ONE batch.

The reference runs one ``LoRANetwork`` per pipeline (trainscripts/
textsliders/lora.py:115-162 monkey-patches module forwards in place), so a
CUDA serving deployment would run one request at a time per model replica.
On TPU the economics invert: the compiled denoise program is the scarce,
expensive artifact and batch rows are nearly free MXU work (batch-4 costs
only 3.65x batch-1, BASELINE.md), so the serving engine coalesces queued
requests into one denoise. Same-slider coalescing shipped first
(serving/server.py); this module removes the same-slider restriction —
the multi-tenant "many adapters, one base model" pattern (cf. Punica /
S-LoRA on GPUs), built the JAX way:

  - ``stack_sliders`` stacks k adapter pytrees with the SAME module set
    leaf-wise, giving every leaf a leading ROW axis: down (B, in, r),
    up (B, r, out), alpha (B,). Adapters of DIFFERENT ranks coalesce too
    (the heterogeneous-rank case Punica handles on GPUs): each module's
    factors are zero-padded along the rank axis to the batch max — padded
    rank columns are exact no-ops in up(down(x)) — and a per-row ``rank``
    vector carries each row's TRUE rank so the reference's alpha/rank
    scale (lora.py:103-112) divides by the original rank, keeping stacked
    rows bit-identical to solo runs.
  - ops/basic.py detects the extra axis (down.ndim 3 for linear / 5 for
    conv) and applies the branch per-row — a single batched einsum
    ('b...i,bir->b...r') instead of a weight gather per request, so the
    MXU sees one batched GEMM regardless of how many distinct sliders
    are in flight. Conv adapters batch via ``feature_group_count`` (each
    row is its own group, one grouped conv call).
  - Program shapes depend only on the row-bucket size and the rank
    bucket, NOT on how many distinct adapters are present — the same
    compiled executable serves "8 rows of one slider" and "8 rows of 8
    sliders".

Rows are exactly independent (per-row multiplier, per-row weights, per-row
rank divisor), so a coalesced batch is bit-identical to solo runs — pinned
by tests/test_serving.py and tests/test_lora_batch.py (incl. mixed
rank-2/rank-4 batches).

Backend caveat on HETEROGENEOUS-rank mixing: the zero rank-padding is an
exact no-op on TPU, but XLA:CPU codegen may reassociate the adapter einsum
when the contraction width changes (measured ~1e-6 drift for rank-2 rows
riding a rank-4 bucket vs their rank-2-bucket solo run). The batch-boundary
serving engine accepts that drift when mixing rank buckets; the continuous
engine requires exact bucket equality to keep its bit-parity contract
(serving/server.py design note).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _rank_axes(entry: dict) -> tuple[int, int]:
    """(down rank axis, up rank axis). down carries rank LAST for both
    linear (in, r) and conv (kh, kw, in, r); up carries it at -2 for both
    linear (r, out) and conv (1, 1, r, out)."""
    return entry["down"].ndim - 1, entry["up"].ndim - 2


def structure_signature(weights: dict) -> tuple:
    """Hashable signature of an adapter's pytree structure: module names +
    factor shapes WITHOUT the rank axis + dtypes. Two adapters batch
    together iff their signatures are equal — same module set on the same
    base model, any ranks (``stack_sliders`` rank-pads), so the stacked
    program shape is independent of which adapters are picked."""
    if not weights:
        raise ValueError(
            "empty adapter tree has no structure signature (the train "
            "method matched no modules on this architecture?)"
        )
    sig = []
    for name in sorted(weights):
        entry = weights[name]
        d_ax, u_ax = _rank_axes(entry)
        down_shape = list(entry["down"].shape)
        up_shape = list(entry["up"].shape)
        del down_shape[d_ax], up_shape[u_ax]
        sig.append(
            (
                name,
                tuple(down_shape),
                str(entry["down"].dtype),
                tuple(up_shape),
                str(entry["up"].dtype),
            )
        )
    return tuple(sig)


def _pad_rank(x: jax.Array, axis: int, to: int) -> jax.Array:
    if x.shape[axis] == to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - x.shape[axis])
    return jnp.pad(x, pad)


def stack_sliders(
    weight_trees: Sequence[dict], *, round_ranks_pow2: bool = False
) -> dict:
    """Stack B same-module-set adapter trees into one per-row tree.

    ``weight_trees[b]`` supplies row b's adapter; repeats are allowed (the
    serving engine passes one entry per batch row, so a 3-scale request
    contributes its adapter three times). Mixed ranks are zero-padded to
    the per-module batch max (exact no-op rows) and the stacked entry
    gains a ``rank`` leaf — each row's TRUE rank, so the alpha/rank scale
    stays the solo value. ``round_ranks_pow2`` additionally pads each
    module's rank up to a power of two, so a serving fleet with assorted
    ranks compiles O(log max_rank) stacked executables instead of one per
    distinct max-rank (Punica's rank-bucket trick). Raises ValueError on
    structure mismatch — the engine's coalescing key prevents that
    upstream."""
    if not weight_trees:
        raise ValueError("stack_sliders needs at least one adapter")
    sig0 = structure_signature(weight_trees[0])
    for w in weight_trees[1:]:
        if structure_signature(w) != sig0:
            raise ValueError(
                "cannot stack sliders with different structures "
                "(module sets / base dims / dtypes differ)"
            )
    out = {}
    for name in weight_trees[0]:
        entries = [w[name] for w in weight_trees]
        d_ax, u_ax = _rank_axes(entries[0])
        ranks = [e["down"].shape[d_ax] for e in entries]
        r_max = max(ranks)
        if round_ranks_pow2:
            r_max = 1 << (r_max - 1).bit_length()
        out[name] = {
            "down": jnp.stack([_pad_rank(e["down"], d_ax, r_max) for e in entries]),
            "up": jnp.stack([_pad_rank(e["up"], u_ax, r_max) for e in entries]),
            "alpha": jnp.stack([jnp.asarray(e["alpha"], jnp.float32) for e in entries]),
            # true per-row ranks: ops/basic._lora_scale divides by these, so
            # row b's scale is exactly its solo multiplier*alpha/rank even
            # after zero-padding the factors to r_max
            "rank": jnp.asarray(ranks, jnp.float32),
        }
    return out


def is_stacked(weights: dict) -> bool:
    """True if `weights` is a per-row stacked tree (alpha carries the row
    axis: () solo vs (B,) stacked). Empty trees are trivially not stacked."""
    if not weights:
        return False
    entry = next(iter(weights.values()))
    return jnp.ndim(entry["alpha"]) > 0
