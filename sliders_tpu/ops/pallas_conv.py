"""Custom Pallas TPU kernel for the UNet's 3x3 stride-1 SAME convolutions.

Why try to beat XLA here (measured, v5e conv microbenchmark 2026-08-17 —
experiments/conv_bench.py, BASELINE.md round-3): the SD1.5/SDXL UNet's 3x3
convs run at 30-70% MXU under XLA's conv emitter (e.g. 48% at the level-0
(2,64,64,320)x(3,3,320,320) shape, 30% at the bandwidth-bound 8x8 bottleneck
shapes), totalling 8.18 ms measured vs 4.51 ms ideal per SD1.5 CFG forward.
Backend conv-emitter tuning flags are rejected by the remote-tunnel client
(CLAUDE.md §7), so a kernel is the only remaining lever on this path.

Design (TPU-first, not an im2col translation):
  - NHWC activations, HWIO weights — channels on the 128 MXU lanes.
  - The input image is padded once outside the kernel; each program holds
    the WHOLE padded image for one batch element in VMEM (at 512px training
    resolutions every UNet level fits: 66x66x320 bf16 = 2.7 MB) and one
    N-tile of the weights.
  - The 3x3 window sum is 9 static (dy, dx) shifts, each a
    (H*W, C) x (C, TN) MXU matmul accumulated in f32 — no materialized
    im2col patches, no HBM score traffic, weights are read exactly once.
  - Bias is fused into the accumulator; the surrounding SiLU/residual
    elementwise work stays in XLA fusions (one extra cheap pass).

Routing: `supports()` gates on shape + a VMEM budget (same discipline as
ops/pallas_attention); `ops.basic.conv2d` consults it only when the
experiment flag is on. Per-shape A/B results live in BASELINE.md — the
kernel only owns shapes with a recorded win.

Reference context: the reference inherits its convs from torch/cuDNN
(SURVEY.md §2 preamble); this file is the TPU-native counterpart of that
library layer, like ops/pallas_attention.py is for xformers attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
VMEM_LIMIT = 13 * 2**20  # ~16 MB/core minus pipelining headroom


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, H: int, W: int, with_bias: bool):
    """One (batch element, N-tile) program: whole padded image x one weight
    tile. x_ref: (1, H+2, W+2, C); w_ref: (3, 3, C, TN); o_ref: (1, H, W, TN)."""
    tn = o_ref.shape[-1]
    acc = jnp.zeros((H * W, tn), jnp.float32)
    if with_bias:
        acc = acc + b_ref[...].astype(jnp.float32)  # (1, tn) broadcasts over rows
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy : dy + H, dx : dx + W, :].reshape(H * W, -1)
            acc = acc + jax.lax.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.reshape(H, W, tn).astype(o_ref.dtype)


def _n_pad(N: int) -> int:
    return -(-N // LANES) * LANES


def _pick_tn(H: int, W: int, C: int, N: int, itemsize: int) -> int:
    """Largest lane-multiple N-tile dividing the lane-padded N that fits the
    VMEM budget next to the whole padded image (double-buffered blocks).
    Mosaic requires the block's last dim be a multiple of 128 (or the full
    array dim), so N is zero-padded to 128 lanes outside the kernel."""
    x_bytes = 2 * itemsize * (H + 2) * (W + 2) * C
    np_ = _n_pad(N)
    tn = np_
    while tn >= LANES:
        if np_ % tn == 0:
            need = (
                x_bytes
                + 2 * itemsize * 9 * C * tn  # weight tile, double-buffered
                + 2 * itemsize * H * W * tn  # out tile, double-buffered
                + 4 * H * W * tn  # f32 accumulator
            )
            if need <= VMEM_LIMIT:
                return tn
        tn -= LANES
    return 0


def supports(x_shape, w_shape, stride: int = 1, itemsize: int = 2) -> bool:
    """3x3 stride-1 SAME convs whose padded image + a >=128-lane weight tile
    fit VMEM. Small-C stems (C < 64) stay with XLA (lane-starved here too)."""
    if len(x_shape) != 4 or len(w_shape) != 4 or stride != 1:
        return False
    kh, kw, C, N = w_shape
    B, H, W, Cx = x_shape
    if (kh, kw) != (3, 3) or Cx != C or C < 64 or N < LANES:
        return False
    if (H * W) % 8 != 0:
        return False
    return _pick_tn(H, W, C, N, itemsize) > 0


def conv3x3(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
            interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC, f32 accumulation."""
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    N = w.shape[-1]
    tn = _pick_tn(H, W, C, N, x.dtype.itemsize)
    assert tn > 0, "caller must gate on supports()"
    np_ = _n_pad(N)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    with_bias = b is not None
    if b is None:
        b = jnp.zeros((N,), x.dtype)
    if np_ != N:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, np_ - N)))
        b = jnp.pad(b, ((0, np_ - N),))
    b2 = b.reshape(1, np_)  # rank-1 VMEM blocks need 256-multiples; rank-2 is (8,128)-tiled
    kernel = functools.partial(_conv_kernel, H=H, W=W, with_bias=with_bias)
    out = pl.pallas_call(
        kernel,
        grid=(B, np_ // tn),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda bi, j: (bi, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, tn), lambda bi, j: (0, 0, 0, j)),
            pl.BlockSpec((1, tn), lambda bi, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, H, W, tn), lambda bi, j: (bi, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, np_), x.dtype),
        interpret=interpret,
    )(xp, w, b2)
    return out if np_ == N else out[..., :N]


# ---------------------------------------------------------------------------
# routing + autodiff
# ---------------------------------------------------------------------------

def routed(x_shape, w_shape, stride: int = 1, itemsize: int = 2) -> bool:
    """Routing policy = capability AND measured win (hardware A/B,
    BASELINE.md round-3 differential timings): the kernel wins 1.2-1.5x on
    every VMEM-fitting shape with H*W >= 256 (e.g. 0.142 vs 0.169 ms at
    (2,64,64,320)x320, 0.327 vs 0.488 at (2,32,32,1280)x1280) but LOSES on
    the weight-bandwidth-bound 8x8 bottleneck shapes (0.084 vs 0.063 ms at
    (2,8,8,1280)x1280) — those stay with XLA."""
    if not supports(x_shape, w_shape, stride, itemsize):
        return False
    return x_shape[1] * x_shape[2] >= 256


_INTERPRET = False  # test hook: run the kernel in interpret mode (CPU CI)


def set_interpret(flag: bool) -> None:
    """Route conv3x3_vjp through the Pallas interpreter — lets the CPU test
    suite exercise the full conv2d routing integration (zero-bias synthesis,
    LoRA tail composition) that otherwise only runs on real TPU hardware."""
    global _INTERPRET
    _INTERPRET = bool(flag)


@jax.custom_vjp
def conv3x3_vjp(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """conv3x3 with an XLA-conv VJP: the backward of a stride-1 SAME conv is
    two convs (dx: transposed-kernel conv; dw: x (*) g correlation) that XLA
    already emits well, and in the LoRA-only train steps the frozen base
    weights' dw is dead code XLA prunes — only dx survives."""
    return conv3x3(x, w, b, interpret=_INTERPRET)


def _conv3x3_vjp_fwd(x, w, b):
    return conv3x3(x, w, b, interpret=_INTERPRET), (x, w)


def _conv3x3_vjp_bwd(res, g):
    x, w = res

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    _, vjp = jax.vjp(ref, x, w)
    dx, dw = vjp(g)
    return dx, dw, g.sum(axis=(0, 1, 2))


conv3x3_vjp.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)
