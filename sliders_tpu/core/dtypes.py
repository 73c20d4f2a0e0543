"""Precision policy.

Mirrors the reference's precision flags (`config_util.py:75-83` maps
fp32/fp16/bf16 strings to torch dtypes) but as a JAX mixed-precision policy:
params and activations can differ, and reductions/accumulations stay f32 —
the right split for the TPU MXU (bf16 inputs, f32 accumulate).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_DTYPES = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "fp16": jnp.float16,
    "float16": jnp.float16,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
}


def parse_precision(precision: str):
    """Reference `config_util.parse_precision` semantics."""
    try:
        return _DTYPES[precision]
    except KeyError:
        raise ValueError(f"Invalid precision type: {precision}") from None


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy: compute dtype for model forward passes,
    param dtype for stored weights, f32 for optimizer state and loss."""

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_precision(cls, precision: str) -> "Policy":
        d = parse_precision(precision)
        return cls(compute_dtype=d, param_dtype=d)

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )
