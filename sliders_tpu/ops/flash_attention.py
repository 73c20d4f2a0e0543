"""Pallas TPU flash attention (blockwise streaming softmax).

Placeholder dispatch for now: `supports()` returns False until the kernel
lands, so `multihead_attention` uses the XLA path. The kernel is implemented
in a later milestone (SURVEY.md §7.3 step 7) with f32 accumulation and
head dims 40-160 (SD1) / 64 (SDXL/FLUX).
"""

from __future__ import annotations


def supports(q_shape, k_shape) -> bool:
    return False


def flash_attention(q, k, v):
    raise NotImplementedError("pallas flash attention lands in a later milestone")
