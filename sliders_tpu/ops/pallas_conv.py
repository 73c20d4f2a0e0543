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


# ---------------------------------------------------------------------------
# fused-epilogue resnet conv (round-4 experiment, VERDICT r3 item 1)
# ---------------------------------------------------------------------------
# Round 3's honest e2e A/B showed the plain kernel LOSES ~5.5% despite
# winning 1.2-1.5x per shape: the custom-call boundary breaks XLA's
# conv+GN-affine+SiLU prologue and bias/temb/residual epilogue fusions, so
# every routed conv paid extra full HBM passes. This kernel is the direct
# rebuttal: it consumes the RAW pre-GN tensor plus per-(batch,channel)
# affine vectors (one tiny stats pass outside), applies normalize+SiLU into
# a zero-ringed VMEM scratch ONCE per batch row (grid is (B, n_tiles) with
# the tile index minor; scratch persists across tiles), runs the 9-shift
# MXU accumulation, and fuses the bias plus either the time-embedding row
# (ResnetBlock2D conv1) or the residual tensor (conv2) into the f32
# accumulator — HBM pass-parity with XLA's fused convolutions, with the
# kernel's measured per-shape MXU win on top. Reference context: this is
# the hot path of trainscripts/textsliders/train_util.py:145-171's UNet.


def _fused_kernel(x_ref, a_ref, s_ref, w_ref, b_ref, e_ref, o_ref, pre_ref,
                  *, H: int, W: int, mode: str):
    """One (batch, N-tile) program.
    x_ref (1,H,W,C) raw pre-GN input; a_ref/s_ref (1,1,C) per-batch affine
    (the extra unit dim satisfies Mosaic's second-minor block constraint);
    w_ref (3,3,C,TN); b_ref (1,TN) bias; e_ref: (1,1,TN) temb row |
    (1,H,W,TN) residual | (1,1,TN) zeros (mode 'none'); pre_ref:
    (H+2,W+2,C) scratch holding silu(x*a+s) with a zero ring (SAME-conv
    padding happens in the NORMALIZED space, matching XLA's
    conv(silu(GN(x))))."""
    import jax.numpy as _jnp
    from jax.experimental import pallas as pl

    tn = o_ref.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _prologue():
        pre_ref[...] = _jnp.zeros_like(pre_ref)
        a = a_ref[0].astype(_jnp.float32)
        s = s_ref[0].astype(_jnp.float32)
        # 8-row slabs: bounds the f32 normalize temporary at 8*W*C instead
        # of H*W*C (the whole-image temp OOM'd scoped vmem at C=960)
        for r0 in range(0, H, 8):
            rows = min(8, H - r0)
            xa = x_ref[0, r0 : r0 + rows].astype(_jnp.float32) * a + s
            pre_ref[1 + r0 : 1 + r0 + rows, 1 : W + 1, :] = (
                xa * jax.nn.sigmoid(xa)
            ).astype(pre_ref.dtype)

    acc = b_ref[...].astype(_jnp.float32)  # (1, tn) broadcasts over rows
    if mode == "temb":
        acc = acc + e_ref[0].astype(_jnp.float32)
    acc = _jnp.broadcast_to(acc, (H * W, tn))
    if mode == "residual":
        acc = acc + e_ref[0].reshape(H * W, tn).astype(_jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = pre_ref[dy : dy + H, dx : dx + W, :].reshape(H * W, -1)
            acc = acc + jax.lax.dot(
                xs, w_ref[dy, dx], preferred_element_type=_jnp.float32
            )
    o_ref[0] = acc.reshape(H, W, tn).astype(o_ref.dtype)


_FUSED_VMEM_LIMIT = 12 * 2**20  # scoped-vmem hard limit is 16M; headroom


def _pick_tn_fused(H: int, W: int, C: int, N: int, itemsize: int, mode: str) -> int:
    """Like _pick_tn, with the normalized-input scratch, Mosaic sublane
    padding, and the prologue slab temporary accounted for (the first
    budget missed the f32 normalize temp and OOM'd scoped vmem at C=960)."""

    def pad8(n):
        return -(-n // 8) * 8

    x_bytes = 2 * itemsize * H * pad8(W) * C  # raw input block, double-buffered
    pre_bytes = itemsize * (H + 2) * pad8(W + 2) * C  # persistent scratch
    slab_bytes = 2 * 4 * 8 * pad8(W) * C  # f32 normalize slab (in + out temps)
    np_ = _n_pad(N)
    tn = np_
    while tn >= LANES:
        if np_ % tn == 0:
            need = (
                x_bytes
                + pre_bytes
                + slab_bytes
                + 2 * itemsize * 9 * C * tn
                + 2 * itemsize * H * pad8(W) * tn  # out tile
                + 4 * H * W * tn  # f32 accumulator
            )
            if mode == "residual":
                need += 2 * itemsize * H * pad8(W) * tn
            if need <= _FUSED_VMEM_LIMIT:
                return tn
        tn -= LANES
    return 0


def fused_supports(x_shape, w_shape, itemsize: int = 2, mode: str = "none") -> bool:
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, C, N = w_shape
    B, H, W, Cx = x_shape
    if (kh, kw) != (3, 3) or Cx != C or C < 64 or N < LANES:
        return False
    if (H * W) % 8 != 0 or H * W < 256:  # 8x8 shapes stay with XLA (round-3 A/B)
        return False
    return _pick_tn_fused(H, W, C, N, itemsize, mode) > 0


def fused_conv3x3(x, a, s, w, b, extra=None, *, mode: str = "none",
                  interpret: bool = False):
    """silu(x*a + s) -> 3x3 SAME conv -> + b [+ temb row | + residual].

    x (B,H,W,C) raw pre-GN; a/s (B,C) per-batch GN affine fold
    (a = gamma*rstd, s = beta - mean*rstd*gamma); extra: (B,N) time-emb rows
    for mode='temb', (B,H,W,N) residual for mode='residual'."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    N = w.shape[-1]
    tn = _pick_tn_fused(H, W, C, N, x.dtype.itemsize, mode)
    assert tn > 0, "caller must gate on fused_supports()"
    np_ = _n_pad(N)
    if np_ != N:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, np_ - N)))
        b = jnp.pad(b, ((0, np_ - N),))
        if mode == "temb":
            extra = jnp.pad(extra, ((0, 0), (0, np_ - N)))
        elif mode == "residual":
            extra = jnp.pad(extra, ((0, 0), (0, 0), (0, 0), (0, np_ - N)))
    if extra is None:
        extra = jnp.zeros((B, np_), x.dtype)
    b2 = b.reshape(1, np_)
    # per-batch vectors ride as (B, 1, C): Mosaic requires the block's
    # second-minor dim be a multiple of 8 or the FULL array dim — (1, C)
    # blocks over a (B, C) array violate that for B > 1
    a3 = a.reshape(B, 1, C)
    s3 = s.reshape(B, 1, C)
    if mode == "residual":
        e_in = extra
        e_spec = pl.BlockSpec((1, H, W, tn), lambda bi, j: (bi, 0, 0, j))
    else:
        e_in = extra.reshape(B, 1, np_)
        e_spec = pl.BlockSpec((1, 1, tn), lambda bi, j: (bi, 0, j))
    kernel = _ft.partial(_fused_kernel, H=H, W=W, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, np_ // tn),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda bi, j: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((3, 3, C, tn), lambda bi, j: (0, 0, 0, j)),
            pl.BlockSpec((1, tn), lambda bi, j: (0, j)),
            e_spec,
        ],
        out_specs=pl.BlockSpec((1, H, W, tn), lambda bi, j: (bi, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, C), x.dtype)],
        interpret=interpret,
    )(x, a3, s3, w, b2, e_in)
    return out if np_ == N else out[..., :N]


def _fused_ref(x, a, s, w, b, extra, mode):
    """Pure-XLA reference of the fused op (VJP recompute + parity tests)."""
    xa = x.astype(jnp.float32) * a[:, None, None, :].astype(jnp.float32) \
        + s[:, None, None, :].astype(jnp.float32)
    pre = (xa * jax.nn.sigmoid(xa)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        pre, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b.astype(x.dtype)
    if mode == "temb":
        y = y + extra[:, None, None, :].astype(x.dtype)
    elif mode == "residual":
        y = y + extra.astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_conv3x3_vjp(x, a, s, w, b, extra, mode):
    """Fused kernel forward with an XLA-recompute backward (same discipline
    as conv3x3_vjp: XLA emits the two backward convs well, and in LoRA-only
    train steps the frozen w/b/a/s grads are dead code XLA prunes)."""
    return fused_conv3x3(x, a, s, w, b, extra, mode=mode, interpret=_INTERPRET)


def _fused_vjp_fwd(x, a, s, w, b, extra, mode):
    return (
        fused_conv3x3(x, a, s, w, b, extra, mode=mode, interpret=_INTERPRET),
        (x, a, s, w, b, extra),
    )


def _fused_vjp_bwd(mode, res, g):
    x, a, s, w, b, extra = res
    _, vjp = jax.vjp(lambda *args: _fused_ref(*args, mode), x, a, s, w, b, extra)
    return vjp(g)


fused_conv3x3_vjp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# ---------------------------------------------------------------------------
# epilogue-only fused conv (round-4 experiment, variant B)
# ---------------------------------------------------------------------------
# The full prologue+epilogue fusion above measured 0.983x e2e (interleaved
# A/B, /tmp/fused_ab round-4) — the scratch prologue + tn=128 VMEM squeeze
# gave back more than the fused passes saved. This variant keeps the plain
# kernel's input path (silu'd GN output materialized by one XLA fusion,
# padded outside) and fuses ONLY the output epilogue (bias + temb row or
# residual) — the round-3 loss's other half — with the plain kernel's VMEM
# budget, which also covers the 64x64 L0 level the full fusion could not.


def _epi_kernel(x_ref, w_ref, b_ref, e_ref, o_ref, *, H: int, W: int, mode: str):
    import jax.numpy as _jnp

    tn = o_ref.shape[-1]
    acc = b_ref[...].astype(_jnp.float32)
    if mode == "temb":
        acc = acc + e_ref[0].astype(_jnp.float32)
    acc = _jnp.broadcast_to(acc, (H * W, tn))
    if mode == "residual":
        acc = acc + e_ref[0].reshape(H * W, tn).astype(_jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy : dy + H, dx : dx + W, :].reshape(H * W, -1)
            acc = acc + jax.lax.dot(
                xs, w_ref[dy, dx], preferred_element_type=_jnp.float32
            )
    o_ref[0] = acc.reshape(H, W, tn).astype(o_ref.dtype)


def _pick_tn_epi(H, W, C, N, itemsize, mode):
    def pad8(n):
        return -(-n // 8) * 8

    np_ = _n_pad(N)
    tn = np_
    while tn >= LANES:
        if np_ % tn == 0:
            need = (
                2 * itemsize * (H + 2) * pad8(W + 2) * C
                + 2 * itemsize * 9 * C * tn
                + 2 * itemsize * H * pad8(W) * tn
                + 4 * H * W * tn
            )
            if mode == "residual":
                need += 2 * itemsize * H * pad8(W) * tn
            if need <= _FUSED_VMEM_LIMIT:
                return tn
        tn -= LANES
    return 0


def epi_supports(x_shape, w_shape, itemsize: int = 2, mode: str = "none") -> bool:
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, C, N = w_shape
    B, H, W, Cx = x_shape
    if (kh, kw) != (3, 3) or Cx != C or C < 64 or N < LANES:
        return False
    if (H * W) % 8 != 0 or H * W < 256:
        return False
    return _pick_tn_epi(H, W, C, N, itemsize, mode) > 0


def epi_conv3x3(x, w, b, extra=None, *, mode: str = "none", interpret: bool = False):
    """3x3 SAME conv of the (already silu'd) input with the bias+temb /
    bias+residual epilogue fused into the accumulator."""
    import functools as _ft

    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    N = w.shape[-1]
    tn = _pick_tn_epi(H, W, C, N, x.dtype.itemsize, mode)
    assert tn > 0, "caller must gate on epi_supports()"
    np_ = _n_pad(N)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if np_ != N:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, np_ - N)))
        b = jnp.pad(b, ((0, np_ - N),))
        if mode == "temb":
            extra = jnp.pad(extra, ((0, 0), (0, np_ - N)))
        elif mode == "residual":
            extra = jnp.pad(extra, ((0, 0), (0, 0), (0, 0), (0, np_ - N)))
    if extra is None:
        extra = jnp.zeros((B, np_), x.dtype)
    b2 = b.reshape(1, np_)
    if mode == "residual":
        e_in = extra
        e_spec = pl.BlockSpec((1, H, W, tn), lambda bi, j: (bi, 0, 0, j))
    else:
        e_in = extra.reshape(B, 1, np_)
        e_spec = pl.BlockSpec((1, 1, tn), lambda bi, j: (bi, 0, j))
    out = pl.pallas_call(
        _ft.partial(_epi_kernel, H=H, W=W, mode=mode),
        grid=(B, np_ // tn),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda bi, j: (bi, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, tn), lambda bi, j: (0, 0, 0, j)),
            pl.BlockSpec((1, tn), lambda bi, j: (0, j)),
            e_spec,
        ],
        out_specs=pl.BlockSpec((1, H, W, tn), lambda bi, j: (bi, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, np_), x.dtype),
        interpret=interpret,
    )(xp, w, b2, e_in)
    return out if np_ == N else out[..., :N]


def _epi_ref(x, w, b, extra, mode):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    if mode == "temb":
        y = y + extra[:, None, None, :].astype(x.dtype)
    elif mode == "residual":
        y = y + extra.astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def epi_conv3x3_vjp(x, w, b, extra, mode):
    return epi_conv3x3(x, w, b, extra, mode=mode, interpret=_INTERPRET)


def _epi_vjp_fwd(x, w, b, extra, mode):
    return epi_conv3x3(x, w, b, extra, mode=mode, interpret=_INTERPRET), (x, w, b, extra)


def _epi_vjp_bwd(mode, res, g):
    x, w, b, extra = res
    _, vjp = jax.vjp(lambda *args: _epi_ref(*args, mode), x, w, b, extra)
    return vjp(g)


epi_conv3x3_vjp.defvjp(_epi_vjp_fwd, _epi_vjp_bwd)
