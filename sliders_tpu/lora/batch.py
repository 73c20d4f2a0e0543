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

  - ``stack_sliders`` stacks k structurally-identical adapter pytrees
    leaf-wise, giving every leaf a leading ROW axis: down (B, in, r),
    up (B, r, out), alpha (B,).
  - ops/basic.py detects the extra axis (down.ndim 3 for linear / 5 for
    conv) and applies the branch per-row — a single batched einsum
    ('b...i,bir->b...r') instead of a weight gather per request, so the
    MXU sees one batched GEMM regardless of how many distinct sliders
    are in flight. Conv adapters batch via ``feature_group_count`` (each
    row is its own group, one grouped conv call).
  - Program shapes depend only on the row-bucket size, NOT on how many
    distinct adapters are present — the same compiled executable serves
    "8 rows of one slider" and "8 rows of 8 sliders".

Rows are exactly independent (per-row multiplier, per-row weights), so a
coalesced batch is bit-identical to solo runs — pinned by
tests/test_serving.py and tests/test_lora_batch.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def structure_signature(weights: dict) -> tuple:
    """Hashable signature of an adapter's pytree structure: module names +
    factor shapes + dtypes. Two adapters batch together iff their
    signatures are equal (then ``stack_sliders`` is well-defined and the
    stacked program shape is independent of which adapters are picked)."""
    sig = []
    for name in sorted(weights):
        entry = weights[name]
        sig.append(
            (
                name,
                tuple(entry["down"].shape),
                str(entry["down"].dtype),
                tuple(entry["up"].shape),
                str(entry["up"].dtype),
            )
        )
    return tuple(sig)


def stack_sliders(weight_trees: Sequence[dict]) -> dict:
    """Stack B structurally-identical adapter trees into one per-row tree.

    ``weight_trees[b]`` supplies row b's adapter; repeats are allowed (the
    serving engine passes one entry per batch row, so a 3-scale request
    contributes its adapter three times). Raises ValueError on structure
    mismatch — the engine's coalescing key prevents that upstream."""
    if not weight_trees:
        raise ValueError("stack_sliders needs at least one adapter")
    sig0 = structure_signature(weight_trees[0])
    for w in weight_trees[1:]:
        if structure_signature(w) != sig0:
            raise ValueError(
                "cannot stack sliders with different structures "
                "(module sets / ranks / dtypes differ)"
            )
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *weight_trees)


def is_stacked(weights: dict) -> bool:
    """True if `weights` is a per-row stacked tree (alpha carries the row
    axis: () solo vs (B,) stacked)."""
    entry = next(iter(weights.values()))
    return jnp.ndim(entry["alpha"]) > 0
