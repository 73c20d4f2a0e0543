"""UNet2DConditionModel (SD1.x / SD2.x / SDXL) as a pure JAX function.

Own implementation of the denoising UNet the reference drives through
diffusers (`model_util.load_models`/`load_models_xl`, model_util.py:104-227;
called per step in train_util.predict_noise[_xl], train_util.py:145-260).
The param tree mirrors the diffusers state_dict paths exactly (conv_in /
time_embedding / down_blocks.N / mid_block / up_blocks.N / conv_norm_out /
conv_out [+ add_embedding for SDXL's 2816-dim text_time conditioning,
train_util.py:320-333]), so HF safetensors convert mechanically
(models/convert.py) and LoRA module names reproduce the reference convention.

TPU-first choices:
  - NHWC activations (channels on the lane dim), HWIO kernels.
  - attention through ops.attention (Pallas flash attention on TPU).
  - f32 GroupNorm/softmax statistics inside a bf16 forward.
  - optional jax.checkpoint around transformer blocks + resnets for
    training-memory control.
  - LoRA is a side pytree + traced scalar multiplier (ops/basic.py), keyed
    by the dotted module path of each Linear/Conv call site.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.ops import basic
from sliders_tpu.ops.attention import multihead_attention
from sliders_tpu.ops.basic import (
    SliderLora,
    conv2d,
    gelu,
    group_norm,
    layer_norm,
    linear,
    silu,
    timestep_embedding,
)

# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    down_block_types: tuple = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: tuple = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # heads per down block (reversed for up blocks); mid uses the last entry
    num_attention_heads: tuple = (8, 8, 8, 8)
    transformer_layers_per_block: tuple = (1, 1, 1, 1)
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    # SDXL micro-conditioning ("text_time"): pooled text (1280) + 6 time ids
    # of addition_time_embed_dim each -> projection_class_embeddings_input_dim
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15 = UNetConfig()
SD21 = UNetConfig(
    cross_attention_dim=1024,
    num_attention_heads=(5, 10, 20, 20),
    use_linear_projection=True,
)
SDXL = UNetConfig(
    block_out_channels=(320, 640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    cross_attention_dim=2048,
    num_attention_heads=(5, 10, 20),
    transformer_layers_per_block=(1, 2, 10),
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2816,  # 1280 + 6*256, train_util.py:323-326
)

# tiny config for CPU tests (structure-identical to SD1)
TINY = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=32,
    num_attention_heads=(2, 2),
    transformer_layers_per_block=(1, 1),
    norm_num_groups=8,
)

# tiny SDXL-flavoured config (text_time conditioning, linear projections)
TINY_XL = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=32,
    num_attention_heads=(2, 2),
    transformer_layers_per_block=(1, 2),
    use_linear_projection=True,
    norm_num_groups=8,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=16 + 6 * 8,  # pooled 16 + 6 ids
)


def get_config(name: str) -> UNetConfig:
    return {"sd15": SD15, "sd21": SD21, "sdxl": SDXL, "tiny": TINY, "tiny_xl": TINY_XL}[name]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _resnet(p: dict, x: jax.Array, emb: jax.Array, cfg: UNetConfig, lora, name: str) -> jax.Array:
    """diffusers ResnetBlock2D: GN-SiLU-conv ×2 with time-embedding add and
    1x1 shortcut when channels change."""
    if _fused_resnet_eligible(p, x, lora, name):
        return _resnet_fused(p, x, emb, cfg, lora, name)
    ep = _epi_conv_router(p, x, lora, name)
    h = group_norm(p["norm1"], x, cfg.norm_num_groups, silu=True)
    temb = linear(p["time_emb_proj"], silu(emb), lora=lora, name=f"{name}.time_emb_proj")
    if ep is not None and ep(h.shape, p["conv1"]["weight"].shape, "temb"):
        h = ep.call(p["conv1"], h, temb.astype(h.dtype), "temb")
    else:
        h = conv2d(p["conv1"], h, padding=1, lora=lora, name=f"{name}.conv1")
        h = h + temb[:, None, None, :]
    h2 = group_norm(p["norm2"], h, cfg.norm_num_groups, silu=True)
    res = x
    if "conv_shortcut" in p:
        res = conv2d(p["conv_shortcut"], x, padding=0, lora=lora, name=f"{name}.conv_shortcut")
    if ep is not None and ep(h2.shape, p["conv2"]["weight"].shape, "residual"):
        return ep.call(p["conv2"], h2, res.astype(h2.dtype), "residual")
    h2 = conv2d(p["conv2"], h2, padding=1, lora=lora, name=f"{name}.conv2")
    return res + h2


class _EpiRouter:
    """Per-conv routing for the epilogue-only fused kernel: each of the
    block's two convs independently takes the kernel when its shape fits
    the VMEM plan (pallas_conv.epi_supports), else the plain XLA path."""

    def __init__(self, itemsize: int):
        from sliders_tpu.ops import pallas_conv as pcv

        self._pcv = pcv
        self._itemsize = itemsize

    def __call__(self, x_shape, w_shape, mode: str) -> bool:
        return self._pcv.epi_supports(x_shape, w_shape, self._itemsize, mode)

    def call(self, conv_p, h, extra, mode: str):
        return self._pcv.epi_conv3x3_vjp(
            h, conv_p["weight"].astype(h.dtype),
            conv_p["bias"].astype(h.dtype), extra, mode,
        )


def _epi_conv_router(p, x, lora, name: str):
    impl = basic.conv_impl()
    if not impl.startswith("fused_ep"):
        return None
    if impl == "fused_ep" and jax.default_backend() != "tpu":
        return None
    if lora is not None and any(
        f"{name}.{m}" in lora.weights for m in ("conv1", "conv2")
    ):
        return None
    from sliders_tpu.ops import pallas_conv as pcv

    pcv.set_interpret(impl.endswith("interpret"))
    return _EpiRouter(x.dtype.itemsize)


def _fused_resnet_eligible(p, x, lora, name: str) -> bool:
    """Route this block through the fused GN+SiLU+conv+epilogue kernel?
    Requires the 'fused' conv impl (ops.basic.set_conv_impl), no LoRA on the
    block's convs (lierla networks — the flagship text-slider protocol —
    never target ResnetBlock2D convs; c3lier image sliders fall back), and
    VMEM-fitting shapes for both convs (pallas_conv.fused_supports)."""
    impl = basic.conv_impl()
    if impl not in ("fused", "fused_interpret"):
        return False
    if impl == "fused" and jax.default_backend() != "tpu":
        return False
    if lora is not None and any(
        f"{name}.{m}" in lora.weights for m in ("conv1", "conv2")
    ):
        return False
    from sliders_tpu.ops import pallas_conv as pcv

    w1 = p["conv1"]["weight"]
    w2 = p["conv2"]["weight"]
    itemsize = x.dtype.itemsize
    h1_shape = x.shape[:3] + (w1.shape[-1],)
    return pcv.fused_supports(x.shape, w1.shape, itemsize, "temb") and pcv.fused_supports(
        h1_shape, w2.shape, itemsize, "residual"
    )


def _resnet_fused(p, x, emb, cfg, lora, name: str) -> jax.Array:
    """ResnetBlock2D via the fused Pallas conv (pallas_conv.fused_conv3x3):
    two tiny GN-stats passes + two kernel calls that do normalize+SiLU (in
    VMEM, once per batch row), the 3x3 MXU conv, and the bias+temb /
    bias+residual epilogue — the HBM-pass structure XLA's own fused convs
    achieve, without the round-3 custom-call fusion break (BASELINE.md).
    Numerics parity vs the plain path is pinned in tests/test_pallas_conv.py."""
    from sliders_tpu.ops import pallas_conv as pcv

    impl = basic.conv_impl()
    pcv.set_interpret(impl.endswith("interpret"))
    g = cfg.norm_num_groups
    a1, s1 = basic.group_norm_affine(p["norm1"], x, g)
    temb = linear(p["time_emb_proj"], silu(emb), lora=lora, name=f"{name}.time_emb_proj")
    h1 = pcv.fused_conv3x3_vjp(
        x,
        a1.astype(jnp.float32),
        s1.astype(jnp.float32),
        p["conv1"]["weight"].astype(x.dtype),
        p["conv1"]["bias"].astype(x.dtype),
        temb.astype(x.dtype),
        "temb",
    )
    a2, s2 = basic.group_norm_affine(p["norm2"], h1, g)
    res = x
    if "conv_shortcut" in p:
        res = conv2d(p["conv_shortcut"], x, padding=0, lora=lora, name=f"{name}.conv_shortcut")
    return pcv.fused_conv3x3_vjp(
        h1,
        a2.astype(jnp.float32),
        s2.astype(jnp.float32),
        p["conv2"]["weight"].astype(x.dtype),
        p["conv2"]["bias"].astype(x.dtype),
        res.astype(x.dtype),
        "residual",
    )


def _attention(p: dict, x: jax.Array, context: Optional[jax.Array], heads: int, lora, name: str) -> jax.Array:
    """diffusers Attention (to_q/to_k/to_v/to_out.0)."""
    ctx = x if context is None else context
    q = linear(p["to_q"], x, lora=lora, name=f"{name}.to_q")
    k = linear(p["to_k"], ctx, lora=lora, name=f"{name}.to_k")
    v = linear(p["to_v"], ctx, lora=lora, name=f"{name}.to_v")
    out = multihead_attention(q, k, v, heads, name=name)
    return linear(p["to_out"]["0"], out, lora=lora, name=f"{name}.to_out.0")


def _geglu_ff(p: dict, x: jax.Array, lora, name: str) -> jax.Array:
    h = linear(p["net"]["0"]["proj"], x, lora=lora, name=f"{name}.net.0.proj")
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * gelu(gate)
    return linear(p["net"]["2"], h, lora=lora, name=f"{name}.net.2")


def _basic_transformer_block(
    p: dict, x: jax.Array, context: jax.Array, heads: int, lora, name: str
) -> jax.Array:
    x = x + _attention(p["attn1"], layer_norm(p["norm1"], x), None, heads, lora, f"{name}.attn1")
    x = x + _attention(p["attn2"], layer_norm(p["norm2"], x), context, heads, lora, f"{name}.attn2")
    x = x + _geglu_ff(p["ff"], layer_norm(p["norm3"], x), lora, f"{name}.ff")
    return x


def _transformer2d(
    p: dict,
    x: jax.Array,
    context: jax.Array,
    heads: int,
    cfg: UNetConfig,
    lora,
    name: str,
    remat: bool = False,
) -> jax.Array:
    """diffusers Transformer2DModel: GN -> proj_in -> N basic blocks -> proj_out
    (+ residual). proj is a 1x1 conv for SD1, a linear for SD2/SDXL."""
    B, H, W, C = x.shape
    residual = x
    h = group_norm(p["norm"], x, cfg.norm_num_groups, eps=1e-6)
    if cfg.use_linear_projection:
        h = h.reshape(B, H * W, C)
        h = basic.layout_pin(h)  # stop conv-driven L-minor layouts (see ops.basic)
        h = linear(p["proj_in"], h, lora=lora, name=f"{name}.proj_in")
    else:
        h = conv2d(p["proj_in"], h, padding=0, lora=lora, name=f"{name}.proj_in")
        h = h.reshape(B, H * W, C)
        h = basic.layout_pin(h)

    block_fn = _basic_transformer_block
    if remat:
        block_fn = jax.checkpoint(_basic_transformer_block, static_argnums=(3, 5))
    blocks = p["transformer_blocks"]
    for k in range(len(blocks)):
        h = block_fn(blocks[str(k)], h, context, heads, lora, f"{name}.transformer_blocks.{k}")

    if cfg.use_linear_projection:
        h = linear(p["proj_out"], h, lora=lora, name=f"{name}.proj_out")
        h = basic.layout_pin(h)
        h = h.reshape(B, H, W, C)
    else:
        h = basic.layout_pin(h)
        h = h.reshape(B, H, W, C)
        h = conv2d(p["proj_out"], h, padding=0, lora=lora, name=f"{name}.proj_out")
    return h + residual


def _downsample(p: dict, x: jax.Array, lora, name: str) -> jax.Array:
    return conv2d(p["conv"], x, stride=2, padding=1, lora=lora, name=f"{name}.conv")


def _upsample(p: dict, x: jax.Array, lora, name: str) -> jax.Array:
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
    return conv2d(p["conv"], x, padding=1, lora=lora, name=f"{name}.conv")


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply(
    params: dict,
    cfg: UNetConfig,
    sample: jax.Array,  # (B, H, W, C_in) NHWC latents
    timesteps: jax.Array,  # (B,) or scalar
    encoder_hidden_states: jax.Array,  # (B, L, cross_attention_dim)
    added_cond: Optional[dict] = None,  # SDXL: {'text_embeds': (B,1280), 'time_ids': (B,6)}
    lora: Optional[SliderLora] = None,
    remat: bool = False,
) -> jax.Array:
    """Predict the noise residual. Returns (B, H, W, C_out)."""
    B = sample.shape[0]
    dtype = sample.dtype
    timesteps = jnp.broadcast_to(jnp.asarray(timesteps), (B,))

    # 1. time embedding
    t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    emb = linear(params["time_embedding"]["linear_1"], t_emb.astype(dtype))
    emb = linear(params["time_embedding"]["linear_2"], silu(emb))

    # 2. SDXL text_time micro-conditioning (the 2816-dim contract)
    if cfg.addition_embed_type == "text_time":
        if added_cond is None:
            raise ValueError("SDXL UNet needs added_cond {'text_embeds','time_ids'}")
        time_ids = added_cond["time_ids"].reshape(-1)
        t_ids_emb = timestep_embedding(time_ids, cfg.addition_time_embed_dim)
        t_ids_emb = t_ids_emb.reshape(B, -1)
        add_emb = jnp.concatenate(
            [added_cond["text_embeds"].astype(dtype), t_ids_emb.astype(dtype)], axis=-1
        )
        assert add_emb.shape[-1] == cfg.projection_class_embeddings_input_dim, (
            add_emb.shape,
            cfg.projection_class_embeddings_input_dim,
        )
        aug = linear(params["add_embedding"]["linear_1"], add_emb)
        aug = linear(params["add_embedding"]["linear_2"], silu(aug))
        emb = emb + aug

    ehs = encoder_hidden_states.astype(dtype)

    # 3. conv_in
    h = conv2d(params["conv_in"], sample, padding=1, lora=lora, name="conv_in")

    # 4. down blocks
    res_stack = [h]
    n_blocks = len(cfg.down_block_types)
    for i, block_type in enumerate(cfg.down_block_types):
        bp = params["down_blocks"][str(i)]
        bname = f"down_blocks.{i}"
        has_attn = block_type == "CrossAttnDownBlock2D"
        for j in range(cfg.layers_per_block):
            h = _resnet(bp["resnets"][str(j)], h, emb, cfg, lora, f"{bname}.resnets.{j}")
            if has_attn:
                h = _transformer2d(
                    bp["attentions"][str(j)], h, ehs, cfg.num_attention_heads[i],
                    cfg, lora, f"{bname}.attentions.{j}", remat,
                )
            res_stack.append(h)
        if i < n_blocks - 1:
            h = _downsample(bp["downsamplers"]["0"], h, lora, f"{bname}.downsamplers.0")
            res_stack.append(h)

    # 5. mid block (UNetMidBlock2DCrossAttn: resnet, [attn, resnet])
    mp = params["mid_block"]
    h = _resnet(mp["resnets"]["0"], h, emb, cfg, lora, "mid_block.resnets.0")
    h = _transformer2d(
        mp["attentions"]["0"], h, ehs, cfg.num_attention_heads[-1],
        cfg, lora, "mid_block.attentions.0", remat,
    )
    h = _resnet(mp["resnets"]["1"], h, emb, cfg, lora, "mid_block.resnets.1")

    # 6. up blocks
    rev_heads = tuple(reversed(cfg.num_attention_heads))
    for i, block_type in enumerate(cfg.up_block_types):
        bp = params["up_blocks"][str(i)]
        bname = f"up_blocks.{i}"
        has_attn = block_type == "CrossAttnUpBlock2D"
        for j in range(cfg.layers_per_block + 1):
            skip = res_stack.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(bp["resnets"][str(j)], h, emb, cfg, lora, f"{bname}.resnets.{j}")
            if has_attn:
                h = _transformer2d(
                    bp["attentions"][str(j)], h, ehs, rev_heads[i],
                    cfg, lora, f"{bname}.attentions.{j}", remat,
                )
        if i < n_blocks - 1:
            h = _upsample(bp["upsamplers"]["0"], h, lora, f"{bname}.upsamplers.0")

    # 7. out
    h = group_norm(params["conv_norm_out"], h, cfg.norm_num_groups, silu=True)
    return conv2d(params["conv_out"], h, padding=1, lora=lora, name="conv_out")


# ---------------------------------------------------------------------------
# init (tests / benchmarks; real weights via models/convert.py)
# ---------------------------------------------------------------------------


def _down_channel_plan(cfg: UNetConfig):
    """(in, out) per resnet of each down block, mirroring diffusers wiring."""
    plan = []
    out_ch = cfg.block_out_channels[0]
    for i in range(len(cfg.down_block_types)):
        in_ch, out_ch = out_ch, cfg.block_out_channels[i]
        layers = []
        for j in range(cfg.layers_per_block):
            layers.append((in_ch if j == 0 else out_ch, out_ch))
        plan.append(layers)
    return plan


def _up_channel_plan(cfg: UNetConfig):
    """(resnet_in + skip, out) per resnet of each up block."""
    rev = tuple(reversed(cfg.block_out_channels))
    plan = []
    out_ch = rev[0]
    for i in range(len(cfg.up_block_types)):
        prev_out, out_ch = out_ch, rev[i]
        in_ch = rev[min(i + 1, len(rev) - 1)]
        layers = []
        n = cfg.layers_per_block + 1
        for j in range(n):
            skip_ch = in_ch if j == n - 1 else out_ch
            res_in = prev_out if j == 0 else out_ch
            layers.append((res_in + skip_ch, out_ch))
        plan.append(layers)
    return plan


def init_params(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> dict:
    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def dense(i, o, bias=True):
        p = {"weight": jax.random.normal(nk(), (i, o), dtype) * (i**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def conv(i, o, k=3):
        p = {
            "weight": jax.random.normal(nk(), (k, k, i, o), dtype) * ((i * k * k) ** -0.5),
            "bias": jnp.zeros((o,), dtype),
        }
        return p

    def gn(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    ted = cfg.time_embed_dim

    def resnet(i, o):
        p = {
            "norm1": gn(i),
            "conv1": conv(i, o),
            "time_emb_proj": dense(ted, o),
            "norm2": gn(o),
            "conv2": conv(o, o),
        }
        if i != o:
            p["conv_shortcut"] = conv(i, o, k=1)
        return p

    def attn(c, ctx_dim):
        return {
            "to_q": dense(c, c, bias=False),
            "to_k": dense(ctx_dim, c, bias=False),
            "to_v": dense(ctx_dim, c, bias=False),
            "to_out": {"0": dense(c, c)},
        }

    def ln(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def tblock(c):
        return {
            "norm1": ln(c),
            "attn1": attn(c, c),
            "norm2": ln(c),
            "attn2": attn(c, cfg.cross_attention_dim),
            "norm3": ln(c),
            "ff": {"net": {"0": {"proj": dense(c, c * 8)}, "2": dense(c * 4, c)}},
        }

    def transformer(c, n_layers):
        proj = dense(c, c) if cfg.use_linear_projection else conv(c, c, k=1)
        proj_out = dense(c, c) if cfg.use_linear_projection else conv(c, c, k=1)
        return {
            "norm": gn(c),
            "proj_in": proj,
            "transformer_blocks": {str(k): tblock(c) for k in range(n_layers)},
            "proj_out": proj_out,
        }

    params: dict = {
        "conv_in": conv(cfg.in_channels, cfg.block_out_channels[0]),
        "time_embedding": {
            "linear_1": dense(cfg.block_out_channels[0], ted),
            "linear_2": dense(ted, ted),
        },
        "conv_norm_out": gn(cfg.block_out_channels[0]),
        "conv_out": conv(cfg.block_out_channels[0], cfg.out_channels),
    }
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": dense(cfg.projection_class_embeddings_input_dim, ted),
            "linear_2": dense(ted, ted),
        }

    down = {}
    n_blocks = len(cfg.down_block_types)
    for i, (block_type, layers) in enumerate(zip(cfg.down_block_types, _down_channel_plan(cfg))):
        bp: dict = {"resnets": {}}
        if block_type == "CrossAttnDownBlock2D":
            bp["attentions"] = {}
        for j, (ic, oc) in enumerate(layers):
            bp["resnets"][str(j)] = resnet(ic, oc)
            if block_type == "CrossAttnDownBlock2D":
                bp["attentions"][str(j)] = transformer(oc, cfg.transformer_layers_per_block[i])
        if i < n_blocks - 1:
            oc = cfg.block_out_channels[i]
            bp["downsamplers"] = {"0": {"conv": conv(oc, oc)}}
        down[str(i)] = bp
    params["down_blocks"] = down

    mid_c = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": {"0": resnet(mid_c, mid_c), "1": resnet(mid_c, mid_c)},
        "attentions": {"0": transformer(mid_c, cfg.transformer_layers_per_block[-1])},
    }

    up = {}
    rev_tlayers = tuple(reversed(cfg.transformer_layers_per_block))
    for i, (block_type, layers) in enumerate(zip(cfg.up_block_types, _up_channel_plan(cfg))):
        bp = {"resnets": {}}
        if block_type == "CrossAttnUpBlock2D":
            bp["attentions"] = {}
        for j, (ic, oc) in enumerate(layers):
            bp["resnets"][str(j)] = resnet(ic, oc)
            if block_type == "CrossAttnUpBlock2D":
                bp["attentions"][str(j)] = transformer(oc, rev_tlayers[i])
        if i < n_blocks - 1:
            oc = tuple(reversed(cfg.block_out_channels))[i]
            bp["upsamplers"] = {"0": {"conv": conv(oc, oc)}}
        up[str(i)] = bp
    params["up_blocks"] = up

    return params
