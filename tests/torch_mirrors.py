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


# ---------------------------------------------------------------------------
# FluxTransformer2DModel (MMDiT)
# ---------------------------------------------------------------------------
# Written independently from diffusers' published FLUX semantics (the model
# the reference's custom pipeline drives, flux-sliders/utils/
# custom_flux_pipeline.py:420-455,687-731): channel-major 2x2 latent
# packing, 3-axis RoPE with interleaved-pair rotation, per-head q/k RMSNorm,
# adaLN-zero double/single stream blocks (context-first joint attention),
# AdaLayerNormContinuous head.


def t_flux_pack(lat):
    """diffusers FluxPipeline._pack_latents: (B,C,H,W) -> (B, L, 4C),
    token features flattened channel-major (C, 2, 2)."""
    B, C, H, W = lat.shape
    x = lat.view(B, C, H // 2, 2, W // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // 2) * (W // 2), C * 4)


def t_flux_unpack(x, H, W):
    B, L, C4 = x.shape
    C = C4 // 4
    x = x.view(B, H // 2, W // 2, C, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, H, W)


def t_flux_rope(ids, axes_dims, theta=10000.0):
    """FluxPosEmbed: per-axis rotary tables, interleave-repeated to pairs."""
    coss, sins = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / theta ** (
            torch.arange(0, dim, 2, dtype=torch.float32) / dim
        )
        ang = ids[:, axis].float()[:, None] * freqs[None]
        coss.append(ang.cos().repeat_interleave(2, dim=-1))
        sins.append(ang.sin().repeat_interleave(2, dim=-1))
    return torch.cat(coss, -1), torch.cat(sins, -1)


def t_flux_apply_rope(x, cos, sin, heads):
    B, L, D = x.shape
    d = D // heads
    xh = x.view(B, L, heads, d).float()
    x1, x2 = xh[..., 0::2], xh[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(xh.shape)
    return (xh * cos[None, :, None, :] + rot * sin[None, :, None, :]).reshape(B, L, D)


def t_flux_rmsnorm(p, pre, x, heads, eps=1e-6):
    B, L, D = x.shape
    d = D // heads
    xh = x.view(B, L, heads, d).float()
    xh = xh * torch.rsqrt(xh.pow(2).mean(-1, keepdim=True) + eps)
    return (xh * p[f"{pre}.weight"].float()).reshape(B, L, D)


def t_flux_ln(x, eps=1e-6):
    return F.layer_norm(x.float(), (x.shape[-1],), eps=eps)


def t_flux_joint_attention(q, k, v, heads):
    B, L, D = q.shape
    d = D // heads
    q = q.view(B, L, heads, d).transpose(1, 2)
    k = k.view(B, L, heads, d).transpose(1, 2)
    v = v.view(B, L, heads, d).transpose(1, 2)
    s = (q @ k.transpose(-1, -2)) * d ** -0.5
    w = s.float().softmax(dim=-1)
    return (w @ v.float()).transpose(1, 2).reshape(B, L, D)


def t_flux_mlp(p, pre, x):
    h = t_lin(p, f"{pre}.net.0.proj", x)
    return t_lin(p, f"{pre}.net.2", F.gelu(h, approximate="tanh"))


def t_flux_double_block(p, pre, img, txt, temb, cos, sin, heads):
    mod = t_lin(p, f"{pre}.norm1.linear", F.silu(temb))
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = mod.chunk(6, dim=-1)
    cmod = t_lin(p, f"{pre}.norm1_context.linear", F.silu(temb))
    csh_a, csc_a, cg_a, csh_m, csc_m, cg_m = cmod.chunk(6, dim=-1)

    img_n = t_flux_ln(img) * (1 + sc_a[:, None]) + sh_a[:, None]
    txt_n = t_flux_ln(txt) * (1 + csc_a[:, None]) + csh_a[:, None]

    a = f"{pre}.attn"
    q = t_flux_rmsnorm(p, f"{a}.norm_q", t_lin(p, f"{a}.to_q", img_n), heads)
    k = t_flux_rmsnorm(p, f"{a}.norm_k", t_lin(p, f"{a}.to_k", img_n), heads)
    v = t_lin(p, f"{a}.to_v", img_n)
    cq = t_flux_rmsnorm(p, f"{a}.norm_added_q", t_lin(p, f"{a}.add_q_proj", txt_n), heads)
    ck = t_flux_rmsnorm(p, f"{a}.norm_added_k", t_lin(p, f"{a}.add_k_proj", txt_n), heads)
    cv = t_lin(p, f"{a}.add_v_proj", txt_n)

    # joint sequence, context first (diffusers FluxAttnProcessor2_0)
    q = t_flux_apply_rope(torch.cat([cq, q], dim=1), cos, sin, heads)
    k = t_flux_apply_rope(torch.cat([ck, k], dim=1), cos, sin, heads)
    vv = torch.cat([cv, v], dim=1)
    out = t_flux_joint_attention(q, k, vv, heads)
    L_txt = txt.shape[1]
    ctx_out, img_out = out[:, :L_txt], out[:, L_txt:]
    img_out = t_lin(p, f"{a}.to_out.0", img_out)
    ctx_out = t_lin(p, f"{a}.to_add_out", ctx_out)

    img = img + g_a[:, None] * img_out
    img_n2 = t_flux_ln(img) * (1 + sc_m[:, None]) + sh_m[:, None]
    img = img + g_m[:, None] * t_flux_mlp(p, f"{pre}.ff", img_n2)

    txt = txt + cg_a[:, None] * ctx_out
    txt_n2 = t_flux_ln(txt) * (1 + csc_m[:, None]) + csh_m[:, None]
    txt = txt + cg_m[:, None] * t_flux_mlp(p, f"{pre}.ff_context", txt_n2)
    return img, txt


def t_flux_single_block(p, pre, x, temb, cos, sin, heads):
    mod = t_lin(p, f"{pre}.norm.linear", F.silu(temb))
    shift, scale, gate = mod.chunk(3, dim=-1)
    xn = t_flux_ln(x) * (1 + scale[:, None]) + shift[:, None]

    a = f"{pre}.attn"
    q = t_flux_rmsnorm(p, f"{a}.norm_q", t_lin(p, f"{a}.to_q", xn), heads)
    k = t_flux_rmsnorm(p, f"{a}.norm_k", t_lin(p, f"{a}.to_k", xn), heads)
    v = t_lin(p, f"{a}.to_v", xn)
    q = t_flux_apply_rope(q, cos, sin, heads)
    k = t_flux_apply_rope(k, cos, sin, heads)
    attn_out = t_flux_joint_attention(q, k, v, heads)

    mlp = F.gelu(t_lin(p, f"{pre}.proj_mlp", xn), approximate="tanh")
    out = t_lin(p, f"{pre}.proj_out", torch.cat([attn_out, mlp], dim=-1))
    return x + gate[:, None] * out


def t_flux_forward(p, cfg, latents_nchw, timestep, pooled, ehs, txt_ids,
                   img_ids, guidance=None):
    """FluxTransformer2DModel.forward over UNPACKED NCHW latents: packs with
    diffusers' channel-major order, runs the MMDiT, unpacks. `timestep` and
    `guidance` follow the pipeline contract (t/1000 resp. raw scale)."""
    B, C, H, W = latents_nchw.shape
    heads = cfg.num_attention_heads

    img = t_lin(p, "x_embedder", t_flux_pack(latents_nchw))
    txt = t_lin(p, "context_embedder", ehs)

    temb = t_sinusoidal(timestep.float() * 1000.0, 256)
    temb = t_lin(p, "time_text_embed.timestep_embedder.linear_2",
                 F.silu(t_lin(p, "time_text_embed.timestep_embedder.linear_1", temb)))
    if cfg.guidance_embeds:
        g_emb = t_sinusoidal(guidance.float() * 1000.0, 256)
        temb = temb + t_lin(
            p, "time_text_embed.guidance_embedder.linear_2",
            F.silu(t_lin(p, "time_text_embed.guidance_embedder.linear_1", g_emb)),
        )
    temb = temb + t_lin(
        p, "time_text_embed.text_embedder.linear_2",
        F.silu(t_lin(p, "time_text_embed.text_embedder.linear_1", pooled)),
    )

    ids = torch.cat([txt_ids, img_ids], dim=0)
    cos, sin = t_flux_rope(ids, cfg.axes_dims_rope, cfg.rope_theta)

    for i in range(cfg.num_layers):
        img, txt = t_flux_double_block(
            p, f"transformer_blocks.{i}", img, txt, temb, cos, sin, heads
        )
    x = torch.cat([txt, img], dim=1)
    for i in range(cfg.num_single_layers):
        x = t_flux_single_block(
            p, f"single_transformer_blocks.{i}", x, temb, cos, sin, heads
        )
    img = x[:, txt.shape[1]:]

    mod = t_lin(p, "norm_out.linear", F.silu(temb))
    scale, shift = mod.chunk(2, dim=-1)  # AdaLayerNormContinuous: scale first
    img = t_flux_ln(img) * (1 + scale[:, None]) + shift[:, None]
    return t_flux_unpack(t_lin(p, "proj_out", img), H, W)


# ---------------------------------------------------------------------------
# LPIPS (AlexNet) — Zhang et al. 2018, as the `lpips` package computes it
# (the reference's structural-preservation metric, eval-scripts/
# lpip_score.py:22-44): ScalingLayer -> AlexNet relu1-5 taps (maxpool after
# relu1/relu2) -> channel unit-normalize -> squared diff -> non-negative 1x1
# lin weights -> spatial mean -> sum over taps. Consumes the same torch
# checkpoints evals/lpips.load_torch_weights reads.
# ---------------------------------------------------------------------------

_LPIPS_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_LPIPS_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def t_lpips_features(alex_state, x):
    """x: (B, 3, H, W) lpips-normalized. Returns relu1..relu5 taps."""
    specs = [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]
    feats = []
    for i, (idx, stride, pad) in enumerate(specs):
        x = F.relu(F.conv2d(x, alex_state[f"features.{idx}.weight"],
                            alex_state[f"features.{idx}.bias"],
                            stride=stride, padding=pad))
        feats.append(x)
        if i in (0, 1):
            x = F.max_pool2d(x, 3, stride=2)
    return feats


def t_lpips_distance(alex_state, lin_state, x, y):
    """x, y: (B, 3, H, W) in [-1, 1]. Returns (B,) LPIPS distances."""
    xn = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
    yn = (y - _LPIPS_SHIFT) / _LPIPS_SCALE
    total = 0.0
    for i, (a, b) in enumerate(zip(t_lpips_features(alex_state, xn),
                                   t_lpips_features(alex_state, yn))):
        a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d2 = (a - b).pow(2)
        w = lin_state[f"lin{i}.model.1.weight"]  # (1, C, 1, 1), non-negative
        total = total + F.conv2d(d2, w).mean(dim=(1, 2, 3))
    return total
