"""Debug / observability helpers.

Replaces the reference debug_util.py (check_requires_grad /
check_training_mode print the first modules' flags, debug_util.py:6-16) with
the JAX equivalents: parameter-tree summaries and NaN scanning. The
reference's `flush.py` (cuda cache emptying) has no TPU equivalent — XLA
buffers are freed by liveness, `jax.block_until_ready` + deleting references
is the whole story.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sliders_tpu.utils import pytree


def describe_network(lora_weights: dict, max_modules: int = 5) -> str:
    """Summary of the slider network (the reference prints requires_grad and
    training mode of the first modules; ours reports shapes/ranks/params —
    in JAX, 'trainable' is whatever you differentiate)."""
    lines = []
    total = 0
    for i, (name, w) in enumerate(sorted(lora_weights.items())):
        n = math.prod(w["down"].shape) + math.prod(w["up"].shape)
        total += n
        if i < max_modules:
            rank = w["down"].shape[-1]
            lines.append(
                f"  {name}: rank={rank} alpha={float(w['alpha']):g} params={n}"
            )
    lines.append(f"  ... {len(lora_weights)} modules, {total:,} trainable params")
    return "\n".join(lines)


def find_nonfinite(tree: dict) -> list[str]:
    """Paths of leaves containing NaN/Inf (device round-trip; debug only)."""
    bad = []
    for path, leaf in pytree.flatten(tree).items():
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(path)
    return bad


def param_count(tree: dict) -> int:
    return sum(math.prod(l.shape) for l in jax.tree.leaves(tree))
