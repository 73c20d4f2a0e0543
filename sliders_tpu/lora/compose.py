"""Compose multiple trained sliders into one LoRA adapter (rank concat).

The Concept Sliders paper's composition capability (and the HF demo's
multi-slider UI) runs several independently trained sliders at once, each at
its own scale. The reference codebase only ever installs ONE ``LoRANetwork``
per pipeline (trainscripts/textsliders/lora.py:115-162 wraps modules
in-place; eval-scripts/generate_images_xl.py:409 passes a single ``network``),
so composing there means nesting monkey-patched forwards.

Here composition is a pure pytree transform. For each targeted module the k
adapters' low-rank factors are block-concatenated along the rank axis:

    down_cat = [down_1 | ... | down_k]            (in, r_1+...+r_k)
    up_cat   = [c_1 * up_1 ; ... ; c_k * up_k]    (r_1+...+r_k, out)

with each adapter's full effective scale ``c_i = scale_i * alpha_i / rank_i``
folded into its ``up`` block. Because the rank index is contracted,
``down_cat @ up_cat = sum_i c_i * down_i @ up_i`` exactly — one matmul pair
per call site serves all k sliders (rank 4 adapters pad to the same 128-lane
tile whether rank is 4 or 4k, so the composed branch costs the same as one).
The composed entry sets ``alpha = total_rank`` so the runtime multiplier in
ops/basic._lora_scale acts as a pure gate: ``multiplier=1`` is "all sliders
at their folded scales", ``0`` is off — which is exactly what the samplers'
``start_noise`` gating toggles (generate_images_xl.py:325-328 gates the
whole network, not individual sliders). Changing a scale changes only array
VALUES (shapes depend only on the adapter set), so a jitted sampler is
reused across scale settings without recompilation; re-folding is a few
elementwise multiplies over rank-4 factors.

Works with both LoRA execution paths: the branch path (ops/basic.py) and
the merged-delta fast path (lora/merge.py) — ``lora_deltas(composed, 1.0)``
is the sum of the per-adapter deltas.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def compose_sliders(adapters: Sequence[Tuple[dict, float]]) -> dict:
    """Merge ``[(weights, scale), ...]`` into one LoRA weights pytree.

    ``weights`` are ``{module_path: {'down', 'up', 'alpha'}}`` trees as
    produced by lora/network.create_slider_network or lora/io.load_slider;
    ``scale`` is that slider's signed strength (the reference's
    ``network.set_lora_slider(scale)`` value). Use the result with
    ``multiplier=1.0`` (or the sampler's ``slider_scale=1.0`` — start_noise
    gating still applies to the composition as a whole).

    Modules targeted by only a subset of the adapters compose over that
    subset; disjoint adapters concatenate trivially.
    """
    if not adapters:
        raise ValueError("compose_sliders needs at least one (weights, scale)")
    names: list[str] = []
    for weights, _ in adapters:
        for name in weights:
            if name not in names:
                names.append(name)
    out = {}
    for name in names:
        downs, ups = [], []
        for weights, scale in adapters:
            entry = weights.get(name)
            if entry is None:
                continue
            down = jnp.asarray(entry["down"], jnp.float32)
            up = jnp.asarray(entry["up"], jnp.float32)
            rank = down.shape[-1]
            fold = jnp.asarray(scale, jnp.float32) * entry["alpha"] / rank
            downs.append(down)
            ups.append(up * fold)
        # down: (in, r) or conv HWIO (kh, kw, in, r) — rank is the last axis.
        # up: (r, out) or conv (1, 1, r, out) — rank is axis -2 either way.
        total_rank = sum(d.shape[-1] for d in downs)
        out[name] = {
            "down": jnp.concatenate(downs, axis=-1),
            "up": jnp.concatenate(ups, axis=-2),
            "alpha": jnp.asarray(float(total_rank), jnp.float32),
        }
    return out
