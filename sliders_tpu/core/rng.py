"""RNG discipline.

The reference relies on torch global seeds (`train_lora.py:163-170` samples
prompt index and timestep with global RNG; image sliders re-seed torch to get
identical noise for the paired images, `train_lora-scale.py:222-246`).
Here every random draw derives from one root `jax.random.key` by folding in
the step index and a static stream tag, so any step is exactly reproducible
and checkpoint-resume is deterministic.
"""

from __future__ import annotations

import hashlib

import jax


def stream(key: jax.Array, tag: str) -> jax.Array:
    """Derive a named substream from `key` (static tag → static fold)."""
    h = int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, h)


def at_step(key: jax.Array, step) -> jax.Array:
    """Per-step key (step may be a traced int)."""
    return jax.random.fold_in(key, step)
