"""Custom Pallas TPU attention kernel for the SD/SDXL head dims.

Replaces the role of xformers in the reference
(trainscripts/textsliders/train_lora.py:68) on the shapes the stock JAX
flash kernel handles badly: spatial self-attention with head dims 40/64/80
(SD1.5 levels 0/1, SDXL levels 1/2) at 1024-4096 tokens.

Why XLA loses here (measured, v5e trace 2026-08-16 — BASELINE.md): XLA
materializes the f32 (L, L) score matrix in HBM per head; at L=4096 that is
3.2 GB of HBM traffic per softmax fusion (~4.7 ms each), and the five
level-0 self-attentions account for ~38 ms of a ~54 ms SD1.5 forward.

Why the stock flash kernel ALSO lost (round-1 bench 1.01 -> 0.60 steps/s):
its three-pass grid and online-softmax bookkeeping are sized for long
sequences with d>=128; at d=40 its blocking pads everything and the
overhead dominates.

This kernel exploits that K and V for these shapes fit ENTIRELY in VMEM
(4096 x 128 bf16 = 1 MB): grid over (batch*heads, q blocks), each program
computes scores for a (block_q, L) tile in f32, takes an exact (not online)
softmax over the full key axis, and multiplies by V — one HBM read of
Q/K/V, one write of O, zero score-matrix traffic. Head dims are zero-padded
to the 128 MXU lanes outside the kernel (attention FLOPs are small; HBM was
the bottleneck).

Backward: jax.custom_vjp with XLA-recompute (ops/attention.xla_attention is
the reference numerics). Only the single grad pass per train iteration pays
it; the partial-denoise loop, frozen eps passes, and all sampling are
forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_Q = 512
LANES = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (block_q, dp)
    k = k_ref[0]  # (L_kv, dp)
    v = v_ref[0]  # (L_kv, dp)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_lanes(x, d_pad):
    d = x.shape[-1]
    if d == d_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sd_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q, interpret: bool = False):
    """(B, H, L, d) self-attention with 1/sqrt(d) softmax scaling.

    Exact softmax over the full key axis (reference numerics: f32 logits +
    softmax, ops/attention.xla_attention), computed blockwise in VMEM.
    """
    return _sd_attention_impl(q, k, v, block_q, interpret)


def _sd_attention_impl(q, k, v, block_q, interpret):
    b, h, lq, d = q.shape
    scale = float(d) ** -0.5
    d_pad = ((d + LANES - 1) // LANES) * LANES
    qp = _pad_lanes(q, d_pad).reshape(b * h, lq, d_pad)
    kp = _pad_lanes(k, d_pad).reshape(b * h, k.shape[2], d_pad)
    vp = _pad_lanes(v, d_pad).reshape(b * h, v.shape[2], d_pad)

    from jax.experimental import pallas as pl

    lkv = kp.shape[1]
    block_q = pick_block_q(
        lq, None if interpret else lkv, max_block=min(block_q, lq),
        itemsize=q.dtype.itemsize,
    )
    if block_q == 0:
        raise ValueError(f"q length {lq} has no VMEM-fitting 128-multiple block")
    grid = (b * h, lq // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, lq, d_pad)[..., :d]


def _sd_attention_fwd(q, k, v, block_q, interpret):
    return _sd_attention_impl(q, k, v, block_q, interpret), (q, k, v)


# Routing policy for the backward kernel, by measured win (BASELINE.md
# round-2 hardware A/B): d=128 FLUX train +5% (XLA's attention VJP
# materializes the (L, L) f32 probability tensors in HBM; large d amortizes
# the kernel's recompute), but d=40 SD1.5 was NEUTRAL (1.4815 vs 1.4841
# steps/s — within run variance). Only d >= BWD_MIN_D routes to the custom
# backward on hardware; smaller d falls back to the XLA VJP. interpret mode
# always uses the kernel so CPU parity tests cover it at every shape.
BWD_MIN_D = 96


def _sd_attention_bwd(block_q, interpret, res, g):
    q, k, v = res
    if (
        (interpret or (jax.default_backend() == "tpu" and q.shape[3] >= BWD_MIN_D))
        and supports_bwd(q.shape, k.shape, itemsize=q.dtype.itemsize)
    ):
        return _sd_attention_bwd_impl(q, k, v, g, interpret)
    # fallback: differentiate the reference-numerics XLA attention
    from sliders_tpu.ops.attention import xla_attention

    _, vjp = jax.vjp(xla_attention, q, k, v)
    return vjp(g)


sd_attention.defvjp(_sd_attention_fwd, _sd_attention_bwd)


# ---------------------------------------------------------------------------
# backward kernel — exact-softmax recompute, whole K/V in VMEM
# ---------------------------------------------------------------------------
#
# XLA's VJP of the reference attention materializes the (L, L) f32
# probability tensor (plus dp and ds) in HBM: at SD1's B2/H8/L4096 that is
# 3 x 537 MB of traffic per layer in the grad pass. This kernel recomputes
# p per q-block in VMEM and emits
#     dv += p^T g,  ds = p (dp - rowsum(dp p)),  dq = scale ds k,
#     dk += scale ds^T q
# with dk/dv accumulated in f32 across the sequential q-block grid steps
# (TPU grids iterate sequentially per core; the revisited output block
# persists between steps).

BWD_BLOCK_Q = 128


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    q = q_ref[0]  # (bq, dp)
    k = k_ref[0]  # (L, dp)
    v = v_ref[0]
    g = g_ref[0]  # (bq, dp)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (bq, L) f32
    pb = p.astype(v.dtype)
    dv_c = jax.lax.dot_general(
        pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, dp)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, L)
    dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - dsum)).astype(q.dtype)  # (bq, L)
    dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_c = (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (L, dp)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_c
        dv_ref[0] = dv_c

    @pl.when(i > 0)
    def _accum():
        dk_ref[0] += dk_c
        dv_ref[0] += dv_c


def supports_bwd(q_shape, k_shape, min_seq: int = 1024, itemsize: int = 2) -> bool:
    """Backward-kernel eligibility: same contract as `supports` but with the
    smaller q block (three (bq, L) f32 tiles + f32 dk/dv accumulators)."""
    if len(q_shape) != 4:
        return False
    lq, d = q_shape[2], q_shape[3]
    lk = k_shape[2]
    if lq != lk or lq < min_seq or d > LANES:
        return False
    if lq % BWD_BLOCK_Q != 0:
        return False
    d_pad = LANES
    need = (
        3 * 4 * BWD_BLOCK_Q * lk  # p, dp, ds tiles (f32)
        + 2 * itemsize * lk * d_pad  # K, V (input dtype)
        + 2 * 4 * lk * d_pad  # dk, dv accumulators (f32)
        + 4 * itemsize * BWD_BLOCK_Q * d_pad  # q, g, dq blocks
    )
    return need <= VMEM_BUDGET


def _sd_attention_bwd_impl(q, k, v, g, interpret):
    from jax.experimental import pallas as pl

    b, h, lq, d = q.shape
    lkv = k.shape[2]
    scale = float(d) ** -0.5
    d_pad = ((d + LANES - 1) // LANES) * LANES
    qp = _pad_lanes(q, d_pad).reshape(b * h, lq, d_pad)
    kp = _pad_lanes(k, d_pad).reshape(b * h, lkv, d_pad)
    vp = _pad_lanes(v, d_pad).reshape(b * h, lkv, d_pad)
    gp = _pad_lanes(g, d_pad).reshape(b * h, lq, d_pad)

    grid = (b * h, lq // BWD_BLOCK_Q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BWD_BLOCK_Q, d_pad), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, BWD_BLOCK_Q, d_pad), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BWD_BLOCK_Q, d_pad), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, i: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, lkv, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lkv, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp)
    dq = dq.reshape(b, h, lq, d_pad)[..., :d]
    dk = dk.reshape(b, h, lkv, d_pad)[..., :d].astype(k.dtype)
    dv = dv.reshape(b, h, lkv, d_pad)[..., :d].astype(v.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# head-minor (B, L, H, d) entry — the layout the QKV projections produce
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sd_attention_blhd(q, k, v, block_q: int = DEFAULT_BLOCK_Q, interpret: bool = False):
    """(B, L, H, d) self-attention, head-minor layout straight from the QKV
    projections (reshape of (B, L, H*d) — no transpose).

    Heads are packed into the lane axis: the array is viewed as
    (B, L, H*d_pad) — each head zero-padded to its own 128-lane slot — and
    the grid's head index selects the slot via the block index map, so HBM
    is read in its natural layout (Mosaic needs the last two BLOCK dims
    tileable, which a (1, block_q, 1, d_pad) 4D block is not).

    Measured A/B (round-2, BASELINE.md): end-to-end NEUTRAL vs the
    transpose + (B,H,L,d) entry (bench 1.424 vs 1.436 steps/s; micro
    1.91 vs 1.75 ms/block) — the transposed level-0 layouts in the train
    step are XLA's conv-driven layout choice, not custom-call-forced. The
    default path therefore keeps the simpler (B,H,L,d) entry; this one
    serves head-minor callers.
    """
    return _sd_attention_blhd_impl(q, k, v, block_q, interpret)


def _pack_heads(x, d_pad):
    """(B, L, H, d) -> (B, L, H*d_pad): pad each head to a 128-lane slot
    (free reshape when d == d_pad)."""
    b, l, h, d = x.shape
    return _pad_lanes(x, d_pad).reshape(b, l, h * d_pad)


def _sd_attention_blhd_impl(q, k, v, block_q, interpret):
    b, lq, h, d = q.shape
    lkv = k.shape[1]
    scale = float(d) ** -0.5
    d_pad = ((d + LANES - 1) // LANES) * LANES
    qp = _pack_heads(q, d_pad)
    kp = _pack_heads(k, d_pad)
    vp = _pack_heads(v, d_pad)

    from jax.experimental import pallas as pl

    block_q = pick_block_q(
        lq, None if interpret else lkv, max_block=min(block_q, lq),
        itemsize=q.dtype.itemsize,
    )
    if block_q == 0:
        raise ValueError(f"q length {lq} has no VMEM-fitting 128-multiple block")
    grid = (b, h, lq // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bi, hi, i: (bi, i, hi)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, hi, i: (bi, 0, hi)),
            pl.BlockSpec((1, lkv, d_pad), lambda bi, hi, i: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bi, hi, i: (bi, i, hi)),
        out_shape=jax.ShapeDtypeStruct((b, lq, h * d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    if d == d_pad:
        return out.reshape(b, lq, h, d)
    return out.reshape(b, lq, h, d_pad)[..., :d]


def _sd_attention_blhd_fwd(q, k, v, block_q, interpret):
    return _sd_attention_blhd_impl(q, k, v, block_q, interpret), (q, k, v)


def _sd_attention_blhd_bwd(block_q, interpret, res, g):
    # XLA-recompute backward (reference numerics); one grad pass per iter.
    from sliders_tpu.ops.attention import xla_attention

    q, k, v = res

    def ref(q, k, v):
        o = xla_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        )
        return o.transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


sd_attention_blhd.defvjp(_sd_attention_blhd_fwd, _sd_attention_blhd_bwd)


VMEM_BUDGET = 13 * 2**20  # ~16 MB/core minus pipelining headroom


FWD_VMEM_LIMIT = 15 * 2**20  # 16 MB scoped-vmem limit minus safety margin


def _fwd_need(block_q: int, lkv: int, itemsize: int = 2) -> int:
    """Mosaic's scoped-VMEM accounting for the forward kernel: f32 score
    tile + DOUBLE-BUFFERED K/V/Q/O blocks at the INPUT dtype width.
    Calibrated against a real compile-OOM: f32 block-512 L=4096 allocates
    16.9 MB against the 16 MB limit (a bf16-only single-buffer estimate
    under-counted and crashed the f32 sweep generator, round-2)."""
    d_pad = LANES
    return (
        4 * block_q * lkv
        + 2 * (2 * itemsize * lkv * d_pad)
        + 2 * (2 * itemsize * block_q * d_pad)
    )


def pick_block_q(
    lq: int, lkv: int | None = None, max_block: int = DEFAULT_BLOCK_Q,
    itemsize: int = 2,
) -> int:
    """Largest 128-multiple q block that divides lq and (when lkv is given)
    fits the VMEM budget — longer sequences take smaller blocks rather than
    falling back to the 3-8x-slower XLA path."""
    for b in (512, 256, 128):
        if b > max_block or lq % b != 0:
            continue
        if lkv is None or _fwd_need(b, lkv, itemsize) <= FWD_VMEM_LIMIT:
            return b
    return 0


def supports(q_shape, k_shape, min_seq: int = 1024, itemsize: int = 2) -> bool:
    """Shapes this kernel should take over from XLA: long self-attention
    (q_len == kv_len), whole K/V resident per program, d <= the 128 lanes.

    Measured on v5e (BASELINE.md round-2, 3-sample 50-chain timing): at SD1's
    L=4096 d=40, 1.35 ms vs 3.37 ms XLA; at FLUX's L=4096 d=128, 2.10 ms vs
    12.25 ms XLA and 11.26 ms stock flash — the stock kernel is never the
    right choice at these sizes, so this kernel owns everything that fits
    VMEM."""
    if len(q_shape) != 4:
        return False
    lq, d = q_shape[2], q_shape[3]
    lk = k_shape[2]
    if lq != lk or lq < min_seq:
        return False
    if d > LANES:
        return False
    return pick_block_q(lq, lk, itemsize=itemsize) != 0
