"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Replaces the role of torch GroupNorm in every reference block
(e.g. diffusers ResnetBlock2D norm1/norm2 used by
trainscripts/textsliders/train_lora.py via UNet2DConditionModel).

Why: the train-step trace (BASELINE.md round-2) shows XLA's GroupNorm
statistics fusions running at ~3% of HBM bandwidth (0.117 ms to reduce a
2.6 MB slab) plus separate normalize passes — ~1.5-2.5 ms of a 22.4 ms
denoise iteration. This kernel does ONE HBM read + ONE write per slab:

  - per-channel sums via ``ones(1,L) @ x``  (MXU, f32 accumulation)
  - per-channel sum-of-squares via ``diag(x^T x)`` (MXU, f32 accumulation —
    no (L, C) f32 intermediate is ever materialized in VMEM)
  - group reduction + variance in f32 on the (G, C/G) tile
  - normalize + affine folded into one per-channel multiply-add
    ``y = x*a + b`` with ``a = rsqrt(var+eps)*gamma``,
    ``b = beta - mean*a`` (computed in f32, applied in the input dtype)
  - optional fused SiLU

Backward is jax.custom_vjp with XLA-recompute of the reference formula
(ops/basic.group_norm) — only the single grad pass per train iteration
pays it; the denoise loop, frozen passes, and sampling are forward-only.

STATUS: experimental, NOT routed. Measured on v5e: 0.914 ms vs XLA's
0.658 ms per B2/L4096/C320 GN+SiLU (3-sample 50-chain) — the one-pass
structure did not beat XLA here (suspect: Mosaic codegen on the 2.5-tile
C=320 lane dim, and grid=(B,)=2 gives no DMA/compute overlap). Kept with
interpret-mode parity tests as a recorded experiment; ops/basic.group_norm
stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VMEM_BUDGET = 13 * 2**20


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float, act_silu: bool):
    x = x_ref[0]  # (L, C), input dtype
    L, C = x.shape
    cg = C // groups
    ones = jnp.ones((1, L), x.dtype)
    s = jax.lax.dot(ones, x, preferred_element_type=jnp.float32)  # (1, C)
    xtx = jax.lax.dot_general(
        x, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (C, C); only the diagonal is used — MXU-cheap, avoids an f32 slab
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    eye = (row == col).astype(jnp.float32)
    ss = jnp.sum(xtx * eye, axis=0, keepdims=True)  # (1, C) diag extract
    # group reduce + broadcast-back via an indicator matmul — Mosaic
    # cannot relayout a (1, C) vector into (G, C/G) tiles (reshape across
    # the lane axis), but (1,C)@(C,G) and (1,G)@(G->C) are plain MXU ops
    crow = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    ccol = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    ind = (crow == ccol).astype(jnp.float32)  # (C, G)
    sg = jax.lax.dot(s, ind, preferred_element_type=jnp.float32)  # (1, G)
    ssg = jax.lax.dot(ss, ind, preferred_element_type=jnp.float32)
    n = L * cg
    mean_g = sg / n
    var_g = ssg / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)  # (1, G)
    back = (((1,), (1,)), ((), ()))  # contract the G axis of (C, G)
    mean_c = jax.lax.dot_general(mean_g, ind, back, preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, ind, back, preferred_element_type=jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)  # (1, C)
    beta = b_ref[...].astype(jnp.float32)
    a = (inv_c * gamma).astype(x.dtype)
    b = (beta - mean_c * inv_c * gamma).astype(x.dtype)
    y = x * a + b
    if act_silu:
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
    o_ref[0] = y.astype(o_ref.dtype)


def supports(shape, num_groups: int) -> bool:
    """x: (B, H, W, C) or (B, L, C). One (L, C) slab per program must fit
    the VMEM plan (x + y + the (C, C) stats matmul)."""
    if len(shape) == 4:
        b, h, w, c = shape
        l = h * w
    elif len(shape) == 3:
        b, l, c = shape
    else:
        return False
    if c % num_groups != 0 or l % 8 != 0:
        return False
    need = 2 * l * c * 4 + c * c * 4  # conservative: x,y at f32 width + x^T x
    return need <= VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(
    x, gamma, beta, num_groups: int = 32, eps: float = 1e-5,
    act_silu: bool = False, interpret: bool = False,
):
    """x: (B, L, C); gamma/beta: (C,). Returns group-normalized (+SiLU) x."""
    return _fused_group_norm_impl(x, gamma, beta, num_groups, eps, act_silu, interpret)


def _fused_group_norm_impl(x, gamma, beta, num_groups, eps, act_silu, interpret):
    from jax.experimental import pallas as pl

    b, l, c = x.shape
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, groups=num_groups, eps=eps, act_silu=act_silu
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))
    return out


def _reference(x, gamma, beta, num_groups, eps, act_silu):
    """ops/basic.group_norm numerics (f32 statistics), for the backward."""
    b, l, c = x.shape
    xg = x.reshape(b, l, num_groups, c // num_groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, l, c).astype(x.dtype)
    out = out * gamma.astype(x.dtype) + beta.astype(x.dtype)
    if act_silu:
        from sliders_tpu.ops.basic import silu

        out = silu(out)
    return out


def _fwd(x, gamma, beta, num_groups, eps, act_silu, interpret):
    y = _fused_group_norm_impl(x, gamma, beta, num_groups, eps, act_silu, interpret)
    return y, (x, gamma, beta)


def _bwd(num_groups, eps, act_silu, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, w, b: _reference(x, w, b, num_groups, eps, act_silu), x, gamma, beta
    )
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)
