"""Independent plain-torch mirrors of the diffusers blocks our JAX models
reimplement, written from diffusers' PUBLISHED architecture semantics
(UNet2DConditionModel / AutoencoderKL as the reference loads them,
/root/reference/trainscripts/textsliders/model_util.py:104-129 and
imagesliders/model_util.py:74-77).

These exist to give the UNet/VAE a numerical anchor beyond param counts:
they consume the SAME weights (via models/convert.to_torch_layout) in torch
layout and compute the forward with torch/F ops, so a transposed weight,
mis-wired skip connection, wrong eps, or wrong activation in the JAX
implementation shows up as a parity failure.

NCHW everywhere (torch convention); callers transpose at the boundary.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def to_torch_state(params) -> dict:
    from sliders_tpu.models import convert

    return {
        k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32))
        for k, v in convert.to_torch_layout(params).items()
    }


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def t_sinusoidal(t: torch.Tensor, dim: int, flip_sin_to_cos=True, shift=0.0,
                 max_period=10000.0) -> torch.Tensor:
    """diffusers embeddings.Timesteps / get_timestep_embedding."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t.float()[:, None] * exponent.exp()[None, :]
    if flip_sin_to_cos:
        return torch.cat([emb.cos(), emb.sin()], dim=-1)
    return torch.cat([emb.sin(), emb.cos()], dim=-1)


def t_gn(p, pre, x, groups, eps):
    return F.group_norm(x, groups, p[f"{pre}.weight"], p[f"{pre}.bias"], eps)


def t_ln(p, pre, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), p[f"{pre}.weight"], p[f"{pre}.bias"], eps)


def t_lin(p, pre, x):
    return F.linear(x, p[f"{pre}.weight"], p.get(f"{pre}.bias"))


def t_conv(p, pre, x, stride=1, padding=0):
    return F.conv2d(x, p[f"{pre}.weight"], p.get(f"{pre}.bias"), stride=stride, padding=padding)


def t_attention(p, pre, x, ctx, heads):
    """diffusers Attention: scaled dot-product, f32 softmax."""
    ctx = x if ctx is None else ctx
    q, k, v = (t_lin(p, f"{pre}.{n}", t) for n, t in
               (("to_q", x), ("to_k", ctx), ("to_v", ctx)))
    B, Lq, D = q.shape
    d = D // heads
    q = q.view(B, Lq, heads, d).transpose(1, 2)
    k = k.view(B, ctx.shape[1], heads, d).transpose(1, 2)
    v = v.view(B, ctx.shape[1], heads, d).transpose(1, 2)
    s = (q @ k.transpose(-1, -2)) * d ** -0.5
    w = s.float().softmax(dim=-1).to(v.dtype)
    o = (w @ v).transpose(1, 2).reshape(B, Lq, D)
    return t_lin(p, f"{pre}.to_out.0", o)


# ---------------------------------------------------------------------------
# UNet2DConditionModel
# ---------------------------------------------------------------------------

def t_unet_resnet(p, pre, x, emb, groups, eps=1e-5):
    """diffusers ResnetBlock2D (default config: SiLU, out_scale 1)."""
    h = F.silu(t_gn(p, f"{pre}.norm1", x, groups, eps))
    h = t_conv(p, f"{pre}.conv1", h, padding=1)
    temb = t_lin(p, f"{pre}.time_emb_proj", F.silu(emb))
    h = h + temb[:, :, None, None]
    h = F.silu(t_gn(p, f"{pre}.norm2", h, groups, eps))
    h = t_conv(p, f"{pre}.conv2", h, padding=1)
    if f"{pre}.conv_shortcut.weight" in p:
        x = t_conv(p, f"{pre}.conv_shortcut", x)
    return x + h


def t_transformer_block(p, pre, x, ctx, heads):
    """diffusers BasicTransformerBlock: LN->attn1, LN->attn2(ctx), LN->GEGLU ff."""
    x = x + t_attention(p, f"{pre}.attn1", t_ln(p, f"{pre}.norm1", x), None, heads)
    x = x + t_attention(p, f"{pre}.attn2", t_ln(p, f"{pre}.norm2", x), ctx, heads)
    h = t_ln(p, f"{pre}.norm3", x)
    h = t_lin(p, f"{pre}.ff.net.0.proj", h)
    h, gate = h.chunk(2, dim=-1)
    h = h * F.gelu(gate)  # diffusers GEGLU (exact erf gelu)
    return x + t_lin(p, f"{pre}.ff.net.2", h)


def t_transformer2d(p, pre, x, ctx, heads, groups, use_linear):
    """diffusers Transformer2DModel: GN(eps 1e-6) -> proj_in -> blocks ->
    proj_out + residual; proj is 1x1 conv for SD1, linear for SD2/SDXL."""
    B, C, H, W = x.shape
    residual = x
    h = t_gn(p, f"{pre}.norm", x, groups, 1e-6)
    if use_linear:
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = t_lin(p, f"{pre}.proj_in", h)
    else:
        h = t_conv(p, f"{pre}.proj_in", h)
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    i = 0
    while f"{pre}.transformer_blocks.{i}.norm1.weight" in p:
        h = t_transformer_block(p, f"{pre}.transformer_blocks.{i}", h, ctx, heads)
        i += 1
    if use_linear:
        h = t_lin(p, f"{pre}.proj_out", h)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
    else:
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        h = t_conv(p, f"{pre}.proj_out", h)
    return h + residual


def t_unet_forward(p, cfg, sample, timesteps, ehs, added_cond=None):
    """diffusers UNet2DConditionModel.forward (epsilon head).

    sample: (B, C, H, W) torch; timesteps: (B,); ehs: (B, L, D);
    added_cond: {'text_embeds': (B, Dp), 'time_ids': (B, 6)} for SDXL.
    """
    B = sample.shape[0]
    g = cfg.norm_num_groups

    t_emb = t_sinusoidal(timesteps, cfg.block_out_channels[0])
    emb = t_lin(p, "time_embedding.linear_1", t_emb)
    emb = t_lin(p, "time_embedding.linear_2", F.silu(emb))

    if cfg.addition_embed_type == "text_time":
        ids = added_cond["time_ids"].reshape(-1)
        ids_emb = t_sinusoidal(ids, cfg.addition_time_embed_dim).reshape(B, -1)
        add = torch.cat([added_cond["text_embeds"], ids_emb], dim=-1)
        aug = t_lin(p, "add_embedding.linear_1", add)
        aug = t_lin(p, "add_embedding.linear_2", F.silu(aug))
        emb = emb + aug

    h = t_conv(p, "conv_in", sample, padding=1)
    res = [h]
    n = len(cfg.down_block_types)
    for i, bt in enumerate(cfg.down_block_types):
        pre = f"down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = t_unet_resnet(p, f"{pre}.resnets.{j}", h, emb, g)
            if bt == "CrossAttnDownBlock2D":
                h = t_transformer2d(
                    p, f"{pre}.attentions.{j}", h, ehs,
                    cfg.num_attention_heads[i], g, cfg.use_linear_projection,
                )
            res.append(h)
        if i < n - 1:
            h = t_conv(p, f"{pre}.downsamplers.0.conv", h, stride=2, padding=1)
            res.append(h)

    h = t_unet_resnet(p, "mid_block.resnets.0", h, emb, g)
    h = t_transformer2d(
        p, "mid_block.attentions.0", h, ehs,
        cfg.num_attention_heads[-1], g, cfg.use_linear_projection,
    )
    h = t_unet_resnet(p, "mid_block.resnets.1", h, emb, g)

    rev_heads = tuple(reversed(cfg.num_attention_heads))
    for i, bt in enumerate(cfg.up_block_types):
        pre = f"up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, res.pop()], dim=1)
            h = t_unet_resnet(p, f"{pre}.resnets.{j}", h, emb, g)
            if bt == "CrossAttnUpBlock2D":
                h = t_transformer2d(
                    p, f"{pre}.attentions.{j}", h, ehs,
                    rev_heads[i], g, cfg.use_linear_projection,
                )
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(p, f"{pre}.upsamplers.0.conv", h, padding=1)

    h = F.silu(t_gn(p, "conv_norm_out", h, g, 1e-5))
    return t_conv(p, "conv_out", h, padding=1)


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------

def t_vae_resnet(p, pre, x, groups):
    h = F.silu(t_gn(p, f"{pre}.norm1", x, groups, 1e-6))
    h = t_conv(p, f"{pre}.conv1", h, padding=1)
    h = F.silu(t_gn(p, f"{pre}.norm2", h, groups, 1e-6))
    h = t_conv(p, f"{pre}.conv2", h, padding=1)
    if f"{pre}.conv_shortcut.weight" in p:
        x = t_conv(p, f"{pre}.conv_shortcut", x)
    return x + h


def t_vae_mid(p, pre, x, groups):
    x = t_vae_resnet(p, f"{pre}.resnets.0", x, groups)
    # single-head spatial Attention with group_norm (diffusers AttnBlock)
    B, C, H, W = x.shape
    r = x
    h = t_gn(p, f"{pre}.attentions.0.group_norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = t_attention(p, f"{pre}.attentions.0", h, h, heads=1)
    x = r + h.reshape(B, H, W, C).permute(0, 3, 1, 2)
    return t_vae_resnet(p, f"{pre}.resnets.1", x, groups)


def t_vae_encode(p, cfg, images):
    """diffusers AutoencoderKL.encode -> (mean, logvar), NCHW."""
    g = cfg.norm_num_groups
    h = t_conv(p, "encoder.conv_in", images, padding=1)
    n = len(cfg.block_out_channels)
    for i in range(n):
        pre = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = t_vae_resnet(p, f"{pre}.resnets.{j}", h, g)
        if i < n - 1:
            h = F.pad(h, (0, 1, 0, 1))  # diffusers Downsample2D asymmetric pad
            h = t_conv(p, f"{pre}.downsamplers.0.conv", h, stride=2)
    h = t_vae_mid(p, "encoder.mid_block", h, g)
    h = F.silu(t_gn(p, "encoder.conv_norm_out", h, g, 1e-6))
    h = t_conv(p, "encoder.conv_out", h, padding=1)
    h = t_conv(p, "quant_conv", h)
    mean, logvar = h.chunk(2, dim=1)
    return mean, logvar.clamp(-30.0, 20.0)


def t_vae_decode(p, cfg, latents):
    g = cfg.norm_num_groups
    h = t_conv(p, "post_quant_conv", latents)
    h = t_conv(p, "decoder.conv_in", h, padding=1)
    h = t_vae_mid(p, "decoder.mid_block", h, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        pre = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = t_vae_resnet(p, f"{pre}.resnets.{j}", h, g)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(p, f"{pre}.upsamplers.0.conv", h, padding=1)
    h = F.silu(t_gn(p, "decoder.conv_norm_out", h, g, 1e-6))
    return t_conv(p, "decoder.conv_out", h, padding=1)
