"""Functional compute primitives with LoRA hooks.

Param layout conventions (chosen TPU-first, transposed ONCE at weight
conversion from the torch layouts):
  - linear: ``weight`` (in, out), optional ``bias`` (out,)
  - conv2d: ``weight`` (kh, kw, in, out) [HWIO], optional ``bias`` (out,)
  - activations are NHWC so channels land on the TPU lane dimension.

Every linear/conv call site takes an optional ``(lora, name)`` pair; when the
name is present in the LoRA pytree the low-rank branch
``out += multiplier * (alpha/rank) * up(down(x))`` is added — the functional
equivalent of the reference's forward monkey-patching
(trainscripts/textsliders/lora.py:103-112), with the slider multiplier a
traced scalar so that scale 0 (slider off) and ±s share one compiled program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SliderLora:
    """LoRA adapter pytree + the slider multiplier.

    ``weights``: {lora_name: {'down', 'up', 'alpha'}} where lora_name follows
    the reference convention ``lora_unet_<module path with '_'>``
    (lora.py:206-207). ``multiplier`` is the (traced) slider scale; the
    reference's ``with network:`` context is ``multiplier=s`` vs ``0``.

    ``multiplier`` may also be a (batch,) vector: different samples of one
    batched forward get different slider scales (used to fuse the image
    sliders' +s and −s passes into a single UNet call).

    ``weights`` may also be a per-row STACKED tree (lora/batch.py): every
    leaf carries a leading batch axis and row b of the forward gets row b's
    adapter — different sliders served in one batched denoise.
    """

    weights: dict
    multiplier: jax.Array

    def with_multiplier(self, m) -> "SliderLora":
        return self.replace(multiplier=jnp.asarray(m, jnp.float32))


def _lora_entry(lora: Optional[SliderLora], name: Optional[str]):
    if lora is None or name is None:
        return None
    return lora.weights.get(name)


def linear(
    p: dict,
    x: jax.Array,
    *,
    lora: Optional[SliderLora] = None,
    name: Optional[str] = None,
) -> jax.Array:
    """y = x @ W (+ b) (+ LoRA branch). W stored (in, out)."""
    w = p["weight"]
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    entry = _lora_entry(lora, name)
    if entry is not None:
        down, up = entry["down"], entry["up"]
        rank = entry.get("rank", down.shape[-1])
        scale = _lora_scale(lora.multiplier, entry["alpha"], rank, y)
        if down.ndim == 3:
            # per-row stacked adapters (lora/batch.py): down (B, in, r),
            # up (B, r, out) — row b of the batch gets row b's adapter via
            # one batched GEMM pair (x is (B, ..., in), batch leading at
            # every lora-bearing call site)
            h = jnp.einsum("b...i,bir->b...r", x, down.astype(x.dtype))
            y = y + jnp.einsum("b...r,bro->b...o", h, up.astype(x.dtype)) * scale
        else:
            y = y + (x @ down.astype(x.dtype)) @ up.astype(x.dtype) * scale
    return y


def _lora_scale(multiplier, alpha, rank, y: jax.Array) -> jax.Array:
    """Scalar or per-sample (batch,) multiplier -> broadcastable scale.
    `rank` is an int for solo adapters, or the (B,) TRUE-rank vector of a
    rank-padded stacked tree (lora/batch.py) — dividing by the original
    rank keeps padded rows bit-identical to their solo runs."""
    scale = multiplier * alpha / rank
    if jnp.ndim(scale) > 0:
        scale = scale.reshape(scale.shape + (1,) * (y.ndim - 1))
    return scale.astype(y.dtype)


_CONV_IMPL = "xla"


def conv_impl() -> str:
    return _CONV_IMPL


def set_conv_impl(impl: str) -> None:
    """'xla' (default): lax.conv everywhere. 'auto': route eligible 3x3
    stride-1 convs to the Pallas kernel (ops/pallas_conv.routed).
    'fused': route whole ResnetBlock2D GN+SiLU+conv+epilogue chains to the
    fused Pallas kernel (pallas_conv.fused_conv3x3 — the round-4 rebuttal
    to the round-3 boundary-fusion loss); 'fused_interpret' is its CPU test
    hook.

    Default is XLA by measured END-TO-END result (BASELINE.md round-3): the
    kernel wins 1.2-1.5x per shape in isolation, but routing it into the
    SD1.5 train step LOSES ~5.5% in every interleaved sample (e.g. 1.688 vs
    1.602 steps/s) — the custom-call boundary breaks XLA's
    conv+bias+SiLU/residual/GN-stat fusions, and the extra output
    read-modify-write passes outweigh the MXU win. Kept as an opt-in
    experiment; takes effect on the next trace."""
    global _CONV_IMPL
    assert impl in (
        "auto", "xla", "interpret",
        "fused", "fused_interpret",          # prologue+epilogue variant
        "fused_ep", "fused_ep_interpret",    # epilogue-only variant
    ), impl
    _CONV_IMPL = impl


def conv2d(
    p: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    padding="SAME",
    lora: Optional[SliderLora] = None,
    name: Optional[str] = None,
) -> jax.Array:
    """NHWC conv with HWIO kernel (+ LoRA conv branch).

    LoRA conv follows the reference (lora.py:85-88): down has the same
    kernel/stride/padding as the base conv, up is 1x1.
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    strides = (stride, stride)
    w = p["weight"]
    same_pad = padding == "SAME" or padding == [(1, 1), (1, 1)]
    if (
        stride == 1
        and same_pad
        and w.shape[:2] == (3, 3)
        and (
            (_CONV_IMPL == "auto" and jax.default_backend() == "tpu")
            or _CONV_IMPL == "interpret"  # CPU test hook (pallas_conv.set_interpret)
        )
    ):
        from sliders_tpu.ops import pallas_conv as pcv

        if pcv.routed(x.shape, w.shape, stride, x.dtype.itemsize):
            bias = p["bias"].astype(x.dtype) if "bias" in p else jnp.zeros((w.shape[-1],), x.dtype)
            y = pcv.conv3x3_vjp(x, w.astype(x.dtype), bias)
            return _conv2d_lora_tail(p, x, y, strides, padding, lora, name)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return _conv2d_lora_tail(p, x, y, strides, padding, lora, name)


def _conv2d_lora_tail(p, x, y, strides, padding, lora, name):
    entry = _lora_entry(lora, name)
    if entry is not None:
        down, up = entry["down"], entry["up"]
        rank = entry.get("rank", down.shape[-1])
        scale = _lora_scale(lora.multiplier, entry["alpha"], rank, y)
        if down.ndim == 5:
            # per-row stacked conv adapters (lora/batch.py): down
            # (B, kh, kw, in, r), up (B, 1, 1, r, out) — one grouped conv
            # per factor with each batch row as its own feature group
            h = _grouped_per_row_conv(x, down.astype(x.dtype), strides, padding)
            h = _grouped_per_row_conv(h, up.astype(x.dtype), (1, 1), "VALID")
        else:
            h = jax.lax.conv_general_dilated(
                x,
                down.astype(x.dtype),
                window_strides=strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.lax.conv_general_dilated(
                h,
                up.astype(x.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = y + h * scale
    return y


def _grouped_per_row_conv(x, w, strides, padding):
    """Convolve row b of `x` (B, H, W, C) with row b's kernel from `w`
    (B, kh, kw, C, O): batch rows become feature groups of ONE conv call
    (lax feature_group_count), so B distinct adapters cost one grouped
    conv instead of B convs. Returns (B, H', W', O)."""
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape[1:]
    xg = x.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
    wg = w.transpose(1, 2, 3, 0, 4).reshape(kh, kw, C, B * O)
    hg = jax.lax.conv_general_dilated(
        xg,
        wg,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=B,
    )
    _, Ho, Wo, _ = hg.shape
    return hg.reshape(Ho, Wo, B, O).transpose(2, 0, 1, 3)


def group_norm(
    p: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-5,
    silu: bool = False,
) -> jax.Array:
    """GroupNorm over the channel (last) dim of NHWC, f32 statistics.
    `silu=True` fuses the activation that follows every diffusers
    norm1/norm2 (one HBM pass on TPU via ops/pallas_groupnorm)."""
    B, H, W, C = x.shape
    # NOTE: a fused one-pass Pallas kernel exists (ops/pallas_groupnorm.py)
    # but measured SLOWER than this XLA path on v5e (0.914 vs 0.658 ms per
    # B2/L4096/C320 GN+SiLU — BASELINE.md round-2 rejected experiments), so
    # it is not routed here.
    xg = x.reshape(B, H * W, num_groups, C // num_groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(B, H, W, C).astype(x.dtype)
    out = out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    if silu:
        out = jax.nn.silu(out)
    return out


def group_norm_affine(
    p: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-5
) -> tuple[jax.Array, jax.Array]:
    """GN folded into per-(batch, channel) affine vectors: returns (a, s)
    with GN(x)*gamma+beta == x*a + s. The tiny stats pass XLA must run
    anyway; the normalize+affine+SiLU elementwise work then happens INSIDE
    the fused resnet conv kernel (ops/pallas_conv.fused_conv3x3), matching
    XLA's conv prologue fusions across the custom-call boundary."""
    B, H, W, C = x.shape
    gs = C // num_groups
    xg = x.reshape(B, H * W, num_groups, gs).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3))  # (B, G)
    rstd = jax.lax.rsqrt(xg.var(axis=(1, 3)) + eps)
    mean_c = jnp.repeat(mean, gs, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, gs, axis=-1)
    gamma = p["weight"].astype(jnp.float32)[None]
    beta = p["bias"].astype(jnp.float32)[None]
    a = rstd_c * gamma
    s = beta - mean_c * rstd_c * gamma
    return a, s


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def timestep_embedding(
    t: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers `Timesteps` semantics
    (UNet2DConditionModel: flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :] * scale
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU default (erf form), used by OpenCLIP bigG
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "silu": silu,
    "quick_gelu": quick_gelu,
    "gelu": gelu,
}


# ---------------------------------------------------------------------------
# layout pinning
# ---------------------------------------------------------------------------

_LAYOUT_PIN = False


def set_layout_pin(enabled: bool) -> None:
    """Toggle transformer-boundary layout pinning (TPU perf knob, see
    `layout_pin`). Takes effect on the next trace/jit."""
    global _LAYOUT_PIN
    _LAYOUT_PIN = bool(enabled)


def _layout_pin_call(x: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl

    def _kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    B, L, C = x.shape
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, C), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


@jax.custom_vjp
def _layout_pin(x: jax.Array) -> jax.Array:
    return _layout_pin_call(x)


def _layout_pin_fwd(x):
    return _layout_pin_call(x), None


def _layout_pin_bwd(_, g):
    # pin the cotangent too: the backward pass's token tensors suffer the
    # same conv-driven layout propagation as the forward's
    return (_layout_pin_call(g),)


_layout_pin.defvjp(_layout_pin_fwd, _layout_pin_bwd)


def layout_pin(x: jax.Array) -> jax.Array:
    """Identity custom call that pins `x` to the default row-major layout.

    Why: in the SDXL train step XLA's layout assignment propagates the
    convs' spatial-transformed layouts through the (B,H,W,C)->(B,L,C)
    reshape into the transformer blocks, leaving the token tensors L-minor
    ({1,2,0}); every LayerNorm channel reduction then runs ~30x slower than
    HBM bandwidth (measured 240 ms/step of convert_reduce fusions,
    BASELINE.md round-3). A Pallas identity forces standard layouts at the
    boundary (custom-call operands/results are row-major), paying one cheap
    relayout copy instead. Identity VJP (also pinned). No-op unless enabled
    via `set_layout_pin` AND running on TPU.
    """
    if not _LAYOUT_PIN or jax.default_backend() != "tpu" or x.ndim != 3:
        return x
    return _layout_pin(x)
