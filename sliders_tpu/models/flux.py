"""FLUX-1 MMDiT transformer (FluxTransformer2DModel) as pure JAX.

The backbone of the reference's experimental FLUX sliders
(flux-sliders/utils/custom_flux_pipeline.py drives it per step at
timestep/1000 with a guidance embedding, packed 2x2 latents, and RoPE ids;
custom_flux_pipeline.py:420-455,687-731). Param tree mirrors the diffusers
state_dict (x_embedder / time_text_embed / transformer_blocks.N /
single_transformer_blocks.N / norm_out / proj_out) so checkpoints convert
mechanically, and LoRA call-site names line up with the reference's
`lora_unet_transformer_blocks_*_attn_to_q` convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.ops.attention import multihead_attention
from sliders_tpu.ops.basic import SliderLora, layer_norm, linear, silu, timestep_embedding


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 2x2 x 16 latent channels
    num_layers: int = 19  # double-stream blocks
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5 features
    pooled_projection_dim: int = 768  # CLIP-L pooled
    guidance_embeds: bool = True  # dev; False for schnell
    axes_dims_rope: tuple = (16, 56, 56)
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


FLUX_DEV = FluxConfig()
FLUX_SCHNELL = FluxConfig(guidance_embeds=False)
TINY = FluxConfig(
    in_channels=16,  # packed 2x2 x 4 latent channels
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=32,
    pooled_projection_dim=24,
    axes_dims_rope=(4, 6, 6),
)


# ---------------------------------------------------------------------------
# latent packing + position ids (custom_flux_pipeline.py:420-455 contract)
# ---------------------------------------------------------------------------


def pack_latents(latents: jax.Array) -> jax.Array:
    """NHWC latents (B, H, W, C) -> (B, H/2*W/2, 4C) 2x2 patches.

    Token features are CHANNEL-MAJOR — each token is the (C, 2, 2) patch
    flattened as c*4 + i*2 + j — matching diffusers FluxPipeline
    ``_pack_latents`` (the order a real checkpoint's ``x_embedder`` input
    rows are trained against; custom_flux_pipeline.py:420-434). A (2,2,C)
    order would silently mis-wire converted real weights — caught by the
    independent torch mirror (tests/torch_mirrors.py t_flux_forward)."""
    B, H, W, C = latents.shape
    x = latents.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/2, W/2, C, 2, 2
    return x.reshape(B, (H // 2) * (W // 2), 4 * C)


def unpack_latents(packed: jax.Array, height: int, width: int) -> jax.Array:
    """(B, H/2*W/2, 4C) -> NHWC (B, H, W, C); inverse of ``pack_latents``
    (diffusers ``_unpack_latents`` order, custom_flux_pipeline.py:437-455)."""
    B, L, C4 = packed.shape
    C = C4 // 4
    x = packed.reshape(B, height // 2, width // 2, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H/2, 2, W/2, 2, C
    return x.reshape(B, height, width, C)


def image_ids(height: int, width: int) -> np.ndarray:
    """(H/2*W/2, 3) RoPE ids: column 0 zero, 1 row, 2 col."""
    h, w = height // 2, width // 2
    ids = np.zeros((h, w, 3), np.float32)
    ids[..., 1] = np.arange(h)[:, None]
    ids[..., 2] = np.arange(w)[None, :]
    return ids.reshape(h * w, 3)


def text_ids(seq_len: int) -> np.ndarray:
    return np.zeros((seq_len, 3), np.float32)


def rope_tables(ids: jax.Array, cfg: FluxConfig) -> tuple[jax.Array, jax.Array]:
    """ids (L, 3) -> (cos, sin) each (L, head_dim), interleaved-pair layout."""
    outs_cos, outs_sin = [], []
    for axis, dim in enumerate(cfg.axes_dims_rope):
        freqs = 1.0 / (
            cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        )
        angles = ids[:, axis : axis + 1].astype(jnp.float32) * freqs[None]  # (L, dim/2)
        outs_cos.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        outs_sin.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))
    return jnp.concatenate(outs_cos, -1), jnp.concatenate(outs_sin, -1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, num_heads: int) -> jax.Array:
    """x (B, L, H*d); rotate interleaved pairs per head."""
    B, L, D = x.shape
    d = D // num_heads
    xh = x.reshape(B, L, num_heads, d).astype(jnp.float32)
    x1 = xh[..., 0::2]
    x2 = xh[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(xh.shape)
    out = xh * cos[None, :, None, :] + rotated * sin[None, :, None, :]
    return out.reshape(B, L, D).astype(x.dtype)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _rms_qk(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """Per-head RMSNorm on q/k (weight over head dim, eps 1e-6)."""
    B, L, D = x.shape
    d = D // num_heads
    xh = x.reshape(B, L, num_heads, d).astype(jnp.float32)
    var = jnp.mean(xh * xh, axis=-1, keepdims=True)
    xh = xh * jax.lax.rsqrt(var + 1e-6)
    out = xh * p["weight"].astype(jnp.float32)
    return out.reshape(B, L, D).astype(x.dtype)


def _ln(x: jax.Array) -> jax.Array:
    """LayerNorm without affine params, eps 1e-6."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _mlp(p: dict, x: jax.Array, lora, name: str) -> jax.Array:
    h = linear(p["net"]["0"]["proj"], x, lora=lora, name=f"{name}.net.0.proj")
    h = jax.nn.gelu(h, approximate=True)
    return linear(p["net"]["2"], h, lora=lora, name=f"{name}.net.2")


def _double_block(p, img, txt, temb, cos, sin, cfg, lora, name):
    heads = cfg.num_attention_heads
    # adaLN-zero modulation (6 chunks each stream)
    mod = linear(p["norm1"]["linear"], silu(temb))
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
    mod_c = linear(p["norm1_context"]["linear"], silu(temb))
    csh_a, csc_a, cg_a, csh_m, csc_m, cg_m = jnp.split(mod_c, 6, axis=-1)

    img_n = _ln(img) * (1 + sc_a[:, None]) + sh_a[:, None]
    txt_n = _ln(txt) * (1 + csc_a[:, None]) + csh_a[:, None]

    a = p["attn"]
    an = f"{name}.attn"
    q = _rms_qk(a["norm_q"], linear(a["to_q"], img_n, lora=lora, name=f"{an}.to_q"), heads)
    k = _rms_qk(a["norm_k"], linear(a["to_k"], img_n, lora=lora, name=f"{an}.to_k"), heads)
    v = linear(a["to_v"], img_n, lora=lora, name=f"{an}.to_v")
    cq = _rms_qk(a["norm_added_q"], linear(a["add_q_proj"], txt_n, lora=lora, name=f"{an}.add_q_proj"), heads)
    ck = _rms_qk(a["norm_added_k"], linear(a["add_k_proj"], txt_n, lora=lora, name=f"{an}.add_k_proj"), heads)
    cv = linear(a["add_v_proj"], txt_n, lora=lora, name=f"{an}.add_v_proj")

    # joint sequence: context first (diffusers FluxAttnProcessor)
    q = apply_rope(jnp.concatenate([cq, q], axis=1), cos, sin, heads)
    k = apply_rope(jnp.concatenate([ck, k], axis=1), cos, sin, heads)
    vv = jnp.concatenate([cv, v], axis=1)
    out = multihead_attention(q, k, vv, heads)
    L_txt = txt.shape[1]
    ctx_out, img_out = out[:, :L_txt], out[:, L_txt:]
    img_out = linear(a["to_out"]["0"], img_out, lora=lora, name=f"{an}.to_out.0")
    ctx_out = linear(a["to_add_out"], ctx_out, lora=lora, name=f"{an}.to_add_out")

    img = img + g_a[:, None] * img_out
    img_n2 = _ln(img) * (1 + sc_m[:, None]) + sh_m[:, None]
    img = img + g_m[:, None] * _mlp(p["ff"], img_n2, lora, f"{name}.ff")

    txt = txt + cg_a[:, None] * ctx_out
    txt_n2 = _ln(txt) * (1 + csc_m[:, None]) + csh_m[:, None]
    txt = txt + cg_m[:, None] * _mlp(p["ff_context"], txt_n2, lora, f"{name}.ff_context")
    return img, txt


def _single_block(p, x, temb, cos, sin, cfg, lora, name):
    heads = cfg.num_attention_heads
    mod = linear(p["norm"]["linear"], silu(temb))
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    xn = _ln(x) * (1 + scale[:, None]) + shift[:, None]

    a = p["attn"]
    an = f"{name}.attn"
    q = _rms_qk(a["norm_q"], linear(a["to_q"], xn, lora=lora, name=f"{an}.to_q"), heads)
    k = _rms_qk(a["norm_k"], linear(a["to_k"], xn, lora=lora, name=f"{an}.to_k"), heads)
    v = linear(a["to_v"], xn, lora=lora, name=f"{an}.to_v")
    q = apply_rope(q, cos, sin, heads)
    k = apply_rope(k, cos, sin, heads)
    attn_out = multihead_attention(q, k, v, heads)

    mlp = jax.nn.gelu(
        linear(p["proj_mlp"], xn, lora=lora, name=f"{name}.proj_mlp"), approximate=True
    )
    out = linear(
        p["proj_out"], jnp.concatenate([attn_out, mlp], axis=-1),
        lora=lora, name=f"{name}.proj_out",
    )
    return x + gate[:, None] * out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def embed_inputs(
    params: dict,
    cfg: FluxConfig,
    packed_latents: jax.Array,  # (B, L_img, in_channels)
    timestep: jax.Array,  # (B,) in [0, 1] (pipeline passes t/1000)
    pooled: jax.Array,  # (B, pooled_projection_dim)
    encoder_hidden_states: jax.Array,  # (B, L_txt, joint_attention_dim)
    guidance: Optional[jax.Array] = None,  # (B,) raw guidance scale
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The pre-block embedding preamble: (img, txt, temb) token streams.

    Shared by `apply` and the pipeline-parallel path
    (parallel/pipeline.flux_apply_pp) so both enter the block stacks with
    identical states."""
    dtype = packed_latents.dtype
    img = linear(params["x_embedder"], packed_latents)
    txt = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))

    tte = params["time_text_embed"]
    t_emb = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256).astype(dtype)
    temb = linear(tte["timestep_embedder"]["linear_2"],
                  silu(linear(tte["timestep_embedder"]["linear_1"], t_emb)))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("this FLUX variant needs a guidance input")
        g_emb = timestep_embedding(guidance.astype(jnp.float32) * 1000.0, 256).astype(dtype)
        temb = temb + linear(
            tte["guidance_embedder"]["linear_2"],
            silu(linear(tte["guidance_embedder"]["linear_1"], g_emb)),
        )
    temb = temb + linear(
        tte["text_embedder"]["linear_2"],
        silu(linear(tte["text_embedder"]["linear_1"], pooled.astype(dtype))),
    )
    return img, txt, temb


def final_layer(params: dict, img: jax.Array, temb: jax.Array) -> jax.Array:
    """AdaLayerNormContinuous + patch de-embedding (diffusers norm_out /
    proj_out; scale first, then shift — the diffusers chunk order)."""
    mod = linear(params["norm_out"]["linear"], silu(temb))
    scale, shift = jnp.split(mod, 2, axis=-1)
    img = _ln(img) * (1 + scale[:, None]) + shift[:, None]
    return linear(params["proj_out"], img)


def apply(
    params: dict,
    cfg: FluxConfig,
    packed_latents: jax.Array,  # (B, L_img, in_channels)
    timestep: jax.Array,  # (B,) in [0, 1] (pipeline passes t/1000)
    pooled: jax.Array,  # (B, pooled_projection_dim)
    encoder_hidden_states: jax.Array,  # (B, L_txt, joint_attention_dim)
    txt_ids_arr: jax.Array,  # (L_txt, 3)
    img_ids_arr: jax.Array,  # (L_img, 3)
    guidance: Optional[jax.Array] = None,  # (B,) raw guidance scale
    lora: Optional[SliderLora] = None,
    remat: bool = False,
) -> jax.Array:
    """Predict the flow velocity (B, L_img, in_channels)."""
    img, txt, temb = embed_inputs(
        params, cfg, packed_latents, timestep, pooled, encoder_hidden_states,
        guidance,
    )

    ids = jnp.concatenate([txt_ids_arr, img_ids_arr], axis=0)
    cos, sin = rope_tables(ids, cfg)

    dblock = _double_block
    sblock = _single_block
    if remat:
        dblock = jax.checkpoint(_double_block, static_argnums=(6, 8))
        sblock = jax.checkpoint(_single_block, static_argnums=(5, 7))

    for i in range(cfg.num_layers):
        img, txt = dblock(
            params["transformer_blocks"][str(i)], img, txt, temb, cos, sin,
            cfg, lora, f"transformer_blocks.{i}",
        )

    x = jnp.concatenate([txt, img], axis=1)
    for i in range(cfg.num_single_layers):
        x = sblock(
            params["single_transformer_blocks"][str(i)], x, temb, cos, sin,
            cfg, lora, f"single_transformer_blocks.{i}",
        )
    img = x[:, txt.shape[1]:]

    return final_layer(params, img, temb)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: FluxConfig, dtype=jnp.float32) -> dict:
    c = [0]

    def nk():
        c[0] += 1
        return jax.random.fold_in(key, c[0])

    def dense(i, o, bias=True):
        p = {"weight": jax.random.normal(nk(), (i, o), dtype) * (i**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    D = cfg.inner_dim
    d_head = cfg.attention_head_dim

    def rms():
        return {"weight": jnp.ones((d_head,), dtype)}

    def mlp_p():
        return {"net": {"0": {"proj": dense(D, 4 * D)}, "2": dense(4 * D, D)}}

    def double():
        return {
            "norm1": {"linear": dense(D, 6 * D)},
            "norm1_context": {"linear": dense(D, 6 * D)},
            "attn": {
                "to_q": dense(D, D), "to_k": dense(D, D), "to_v": dense(D, D),
                "add_q_proj": dense(D, D), "add_k_proj": dense(D, D), "add_v_proj": dense(D, D),
                "norm_q": rms(), "norm_k": rms(),
                "norm_added_q": rms(), "norm_added_k": rms(),
                "to_out": {"0": dense(D, D)},
                "to_add_out": dense(D, D),
            },
            "ff": mlp_p(),
            "ff_context": mlp_p(),
        }

    def single():
        return {
            "norm": {"linear": dense(D, 3 * D)},
            "attn": {
                "to_q": dense(D, D), "to_k": dense(D, D), "to_v": dense(D, D),
                "norm_q": rms(), "norm_k": rms(),
            },
            "proj_mlp": dense(D, 4 * D),
            "proj_out": dense(5 * D, D),
        }

    tte = {
        "timestep_embedder": {"linear_1": dense(256, D), "linear_2": dense(D, D)},
        "text_embedder": {
            "linear_1": dense(cfg.pooled_projection_dim, D), "linear_2": dense(D, D)
        },
    }
    if cfg.guidance_embeds:
        tte["guidance_embedder"] = {"linear_1": dense(256, D), "linear_2": dense(D, D)}

    return {
        "x_embedder": dense(cfg.in_channels, D),
        "context_embedder": dense(cfg.joint_attention_dim, D),
        "time_text_embed": tte,
        "transformer_blocks": {str(i): double() for i in range(cfg.num_layers)},
        "single_transformer_blocks": {str(i): single() for i in range(cfg.num_single_layers)},
        "norm_out": {"linear": dense(D, 2 * D)},
        "proj_out": dense(D, cfg.in_channels),
    }
