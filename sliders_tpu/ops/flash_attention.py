"""Pallas TPU flash attention dispatch.

Uses the production TPU flash-attention kernel that ships with JAX
(jax.experimental.pallas.ops.tpu.flash_attention: blockwise online-softmax,
f32 statistics, custom-VJP backward) for the UNet's big self-attention
shapes — the layer the reference accelerates with xformers
(train_lora.py:68). Spatial self-attention at 512px is a 4096-token
sequence whose full (L, L) scores matrix XLA would materialize per head;
the flash kernel streams it through VMEM.

Dispatch policy (`supports`): self-attention only (q_len == kv_len),
sequence divisible by the 128-lane block minimum and long enough to matter;
cross-attention (77/512-token text) and tiny low-res levels stay on the XLA
path, which is faster for small shapes.
"""

from __future__ import annotations

import functools

MIN_SEQ = 1024  # below this the XLA path wins (scores fit comfortably)


def supports(q_shape, k_shape) -> bool:
    """q/k: (B, H, L, d). Shapes for the STOCK jax flash kernel: long
    sequences with 128-multiple head dims (FLUX d=128). SD/SDXL head dims
    (40/64/80) route to ops/pallas_attention.sd_attention instead — the
    stock kernel's online-softmax blocking measured as a net slowdown there
    (round-1 bench 1.01 -> 0.60 steps/s, BASELINE.md)."""
    if len(q_shape) != 4:
        return False
    Lq, d = q_shape[2], q_shape[3]
    Lk = k_shape[2]
    if Lq != Lk:  # self-attention only
        return False
    if Lq % 128 != 0 or Lq < MIN_SEQ:
        return False
    if d % 128 != 0:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _kernel():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def flash_attention(q, k, v):
    """(B, H, L, d) attention with 1/sqrt(d) scaling, f32 accumulation."""
    fa = _kernel()
    d = q.shape[-1]
    return fa.flash_attention(q, k, v, causal=False, sm_scale=float(d) ** -0.5)
