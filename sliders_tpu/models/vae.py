"""AutoencoderKL (the SD/SDXL VAE) as pure JAX functions.

The reference uses the diffusers VAE for image-slider training
(`imagesliders/model_util.py:74-77` loads it; `get_noisy_image` encodes,
`imagesliders/train_util.py:199-235`) and for decoding at inference
(`generate_images_xl.py:364-385`). Param tree mirrors the diffusers
state_dict (encoder./decoder./quant_conv/post_quant_conv) with NHWC/HWIO
layouts via models/convert.py.

scaling_factor is applied by callers (0.18215 for SD1/2, 0.13025 for SDXL),
matching the reference's explicit multiplications.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sliders_tpu.ops.attention import multihead_attention
from sliders_tpu.ops.basic import conv2d, group_norm, linear, silu


@dataclass(frozen=True)
class VaeConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0  # FLUX VAE shifts before scaling


SD_VAE = VaeConfig()
SDXL_VAE = VaeConfig(scaling_factor=0.13025)
FLUX_VAE = VaeConfig(latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159)
TINY = VaeConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)
TINY_FLUX = VaeConfig(
    block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
    latent_channels=4, scaling_factor=0.3611, shift_factor=0.1159,
)


def normalize_latents(cfg: VaeConfig, raw: jax.Array) -> jax.Array:
    """Posterior sample -> model-space latents: (z - shift) * scale."""
    return (raw - cfg.shift_factor) * cfg.scaling_factor


def denormalize_latents(cfg: VaeConfig, latents: jax.Array) -> jax.Array:
    return latents / cfg.scaling_factor + cfg.shift_factor


def _resnet(p: dict, x: jax.Array, groups: int) -> jax.Array:
    h = group_norm(p["norm1"], x, groups, eps=1e-6, silu=True)
    h = conv2d(p["conv1"], h, padding=1)
    h = group_norm(p["norm2"], h, groups, eps=1e-6, silu=True)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _mid_attention(p: dict, x: jax.Array, groups: int) -> jax.Array:
    """Single-head spatial attention in the VAE mid block."""
    B, H, W, C = x.shape
    residual = x
    h = group_norm(p["group_norm"], x, groups, eps=1e-6).reshape(B, H * W, C)
    q = linear(p["to_q"], h)
    k = linear(p["to_k"], h)
    v = linear(p["to_v"], h)
    h = multihead_attention(q, k, v, num_heads=1)
    h = linear(p["to_out"]["0"], h).reshape(B, H, W, C)
    return h + residual


def _mid_block(p: dict, x: jax.Array, groups: int) -> jax.Array:
    x = _resnet(p["resnets"]["0"], x, groups)
    x = _mid_attention(p["attentions"]["0"], x, groups)
    return _resnet(p["resnets"]["1"], x, groups)


def encode(params: dict, cfg: VaeConfig, images: jax.Array) -> tuple[jax.Array, jax.Array]:
    """images (B, H, W, 3) in [-1, 1] -> (mean, logvar) of the latent
    posterior, each (B, H/8, W/8, latent_channels)."""
    enc = params["encoder"]
    g = cfg.norm_num_groups
    h = conv2d(enc["conv_in"], images, padding=1)
    n = len(cfg.block_out_channels)
    for i in range(n):
        bp = enc["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _resnet(bp["resnets"][str(j)], h, g)
        if i < n - 1:
            # diffusers VAE downsample: asymmetric (0,1,0,1) pad, stride-2 conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(bp["downsamplers"]["0"]["conv"], h, stride=2, padding=0)
    h = _mid_block(enc["mid_block"], h, g)
    h = group_norm(enc["conv_norm_out"], h, g, eps=1e-6, silu=True)
    h = conv2d(enc["conv_out"], h, padding=1)
    h = conv2d(params["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_latents(mean: jax.Array, logvar: jax.Array, key: jax.Array) -> jax.Array:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(params: dict, cfg: VaeConfig, latents: jax.Array) -> jax.Array:
    """latents (B, h, w, latent_channels) -> images (B, 8h, 8w, 3)."""
    dec = params["decoder"]
    g = cfg.norm_num_groups
    h = conv2d(params["post_quant_conv"], latents, padding=0)
    h = conv2d(dec["conv_in"], h, padding=1)
    h = _mid_block(dec["mid_block"], h, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        bp = dec["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(bp["resnets"][str(j)], h, g)
        if i < n - 1:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = conv2d(bp["upsamplers"]["0"]["conv"], h, padding=1)
    h = group_norm(dec["conv_norm_out"], h, g, eps=1e-6, silu=True)
    return conv2d(dec["conv_out"], h, padding=1)


# ---------------------------------------------------------------------------
# init (tests/bench)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: VaeConfig, dtype=jnp.float32) -> dict:
    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def conv(i, o, k=3):
        return {
            "weight": jax.random.normal(nk(), (k, k, i, o), dtype) * ((i * k * k) ** -0.5),
            "bias": jnp.zeros((o,), dtype),
        }

    def dense(i, o):
        return {
            "weight": jax.random.normal(nk(), (i, o), dtype) * (i**-0.5),
            "bias": jnp.zeros((o,), dtype),
        }

    def gn(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def resnet(i, o):
        p = {"norm1": gn(i), "conv1": conv(i, o), "norm2": gn(o), "conv2": conv(o, o)}
        if i != o:
            p["conv_shortcut"] = conv(i, o, k=1)
        return p

    def mid(c):
        return {
            "resnets": {"0": resnet(c, c), "1": resnet(c, c)},
            "attentions": {
                "0": {
                    "group_norm": gn(c),
                    "to_q": dense(c, c),
                    "to_k": dense(c, c),
                    "to_v": dense(c, c),
                    "to_out": {"0": dense(c, c)},
                }
            },
        }

    ch = cfg.block_out_channels
    n = len(ch)

    # encoder
    enc_down = {}
    out_c = ch[0]
    for i in range(n):
        in_c, out_c = out_c, ch[i]
        bp = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            bp["resnets"][str(j)] = resnet(in_c if j == 0 else out_c, out_c)
        if i < n - 1:
            bp["downsamplers"] = {"0": {"conv": conv(out_c, out_c)}}
        enc_down[str(i)] = bp
    encoder = {
        "conv_in": conv(cfg.in_channels, ch[0]),
        "down_blocks": enc_down,
        "mid_block": mid(ch[-1]),
        "conv_norm_out": gn(ch[-1]),
        "conv_out": conv(ch[-1], 2 * cfg.latent_channels),
    }

    # decoder (reversed channels; 3 resnets per block)
    rev = tuple(reversed(ch))
    dec_up = {}
    out_c = rev[0]
    for i in range(n):
        prev_c, out_c = out_c, rev[i]
        bp = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            bp["resnets"][str(j)] = resnet(prev_c if j == 0 else out_c, out_c)
        if i < n - 1:
            bp["upsamplers"] = {"0": {"conv": conv(out_c, out_c)}}
        dec_up[str(i)] = bp
    decoder = {
        "conv_in": conv(cfg.latent_channels, rev[0]),
        "mid_block": mid(rev[0]),
        "up_blocks": dec_up,
        "conv_norm_out": gn(rev[-1]),
        "conv_out": conv(rev[-1], cfg.out_channels),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": conv(2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1),
        "post_quant_conv": conv(cfg.latent_channels, cfg.latent_channels, k=1),
    }
