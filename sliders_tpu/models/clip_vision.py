"""CLIP vision tower + full CLIP (image-text) model for eval scoring.

Replaces the reference eval harness's `CLIPModel.from_pretrained
("openai/clip-vit-base-patch32")` (eval-scripts/clip_score.py:24-25): the
quality gate computes `logits_per_image` between generated images and the
attribute prompt per slider scale. Param trees mirror the transformers
CLIPModel state_dict.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sliders_tpu.models import clip_text
from sliders_tpu.ops.attention import multihead_attention
from sliders_tpu.ops.basic import ACTIVATIONS, layer_norm, linear

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


VIT_B32 = ClipVisionConfig()
TINY_VISION = ClipVisionConfig(
    hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
    image_size=16, patch_size=8,
)


def _encoder_layer(p, x, cfg, eps):
    residual = x
    h = layer_norm(p["layer_norm1"], x, eps)
    attn = p["self_attn"]
    q = linear(attn["q_proj"], h)
    k = linear(attn["k_proj"], h)
    v = linear(attn["v_proj"], h)
    h = multihead_attention(q, k, v, cfg.num_heads)
    h = linear(attn["out_proj"], h)
    x = residual + h
    residual = x
    h = layer_norm(p["layer_norm2"], x, eps)
    h = linear(p["mlp"]["fc1"], h)
    h = ACTIVATIONS[cfg.hidden_act](h)
    h = linear(p["mlp"]["fc2"], h)
    return residual + h


def apply_vision(params: dict, pixels: jax.Array, cfg: ClipVisionConfig) -> dict:
    """pixels: (B, H, W, 3) normalized. Returns {'pooler_output', ...}."""
    vm = params["vision_model"]
    emb = vm["embeddings"]
    B = pixels.shape[0]
    # patch conv (no bias), kernel stored HWIO by the converter
    patches = jax.lax.conv_general_dilated(
        pixels,
        emb["patch_embedding"]["weight"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = patches.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(emb["class_embedding"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]

    x = layer_norm(vm["pre_layrnorm"], x, cfg.layer_norm_eps)  # HF's typo'd name
    for i in range(cfg.num_layers):
        x = _encoder_layer(vm["encoder"]["layers"][str(i)], x, cfg, cfg.layer_norm_eps)
    pooled = layer_norm(vm["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
    return {"last_hidden_state": x, "pooler_output": pooled}


def clip_logits_per_image(
    params: dict,
    pixels: jax.Array,
    input_ids: jax.Array,
    vision_cfg: ClipVisionConfig,
    text_cfg: clip_text.ClipTextConfig,
) -> jax.Array:
    """transformers CLIPModel.forward().logits_per_image."""
    img = apply_vision(params, pixels, vision_cfg)["pooler_output"]
    img = linear(params["visual_projection"], img)
    txt = clip_text.apply(params, input_ids, text_cfg)["pooler_output"]
    txt = linear(params["text_projection"], txt)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    return scale * img @ txt.T


def preprocess_images(images: jax.Array, size: int = 224) -> jax.Array:
    """uint8 (B, H, W, 3) -> CLIP-normalized float32, shortest-side resize +
    center crop (CLIPProcessor semantics)."""
    B, H, W, _ = images.shape
    x = images.astype(jnp.float32) / 255.0
    ratio = size / min(H, W)
    nh, nw = round(H * ratio), round(W * ratio)
    x = jax.image.resize(x, (B, nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top : top + size, left : left + size]
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def load_clip_model(model_dir: str):
    """Load a full CLIP (e.g. a local openai/clip-vit-base-patch32 snapshot)
    -> (params, vision_cfg, text_cfg, tokenizer)."""
    import json
    import os

    from sliders_tpu.models import convert
    from sliders_tpu.text.tokenizer import ClipTokenizer

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    v, t = cfg["vision_config"], cfg["text_config"]
    vision_cfg = ClipVisionConfig(
        hidden_size=v.get("hidden_size", 768),
        num_layers=v.get("num_hidden_layers", 12),
        num_heads=v.get("num_attention_heads", 12),
        intermediate_size=v.get("intermediate_size", 3072),
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        hidden_act=v.get("hidden_act", "quick_gelu"),
    )
    from sliders_tpu.models.loader import clip_config_from_hf

    text_cfg = clip_config_from_hf(
        {**t, "projection_dim": cfg.get("projection_dim", 512)}
    )
    state = convert.load_safetensors_files(convert._component_files(model_dir))
    params = convert.convert_state_dict(state)
    tokenizer = ClipTokenizer.from_pretrained(model_dir)
    tokenizer.model_max_length = text_cfg.max_positions
    return params, vision_cfg, text_cfg, tokenizer


def init_params(key, vision_cfg: ClipVisionConfig, text_cfg: clip_text.ClipTextConfig, projection_dim=16):
    """Random full-CLIP init (tests only)."""
    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def dense(i, o, bias=True):
        p = {"weight": jax.random.normal(nk(), (i, o)) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def ln(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    d, m = vision_cfg.hidden_size, vision_cfg.intermediate_size
    layers = {}
    for i in range(vision_cfg.num_layers):
        layers[str(i)] = {
            "layer_norm1": ln(d),
            "layer_norm2": ln(d),
            "self_attn": {
                "q_proj": dense(d, d), "k_proj": dense(d, d),
                "v_proj": dense(d, d), "out_proj": dense(d, d),
            },
            "mlp": {"fc1": dense(d, m), "fc2": dense(m, d)},
        }
    n_pos = (vision_cfg.image_size // vision_cfg.patch_size) ** 2 + 1
    params = clip_text.init_params(nk(), text_cfg)
    params["vision_model"] = {
        "embeddings": {
            "class_embedding": jax.random.normal(nk(), (d,)) * 0.02,
            "patch_embedding": {
                "weight": jax.random.normal(
                    nk(), (vision_cfg.patch_size, vision_cfg.patch_size, 3, d)
                )
                * 0.02
            },
            "position_embedding": {"weight": jax.random.normal(nk(), (n_pos, d)) * 0.02},
        },
        "pre_layrnorm": ln(d),
        "encoder": {"layers": layers},
        "post_layernorm": ln(d),
    }
    params["visual_projection"] = dense(d, projection_dim, bias=False)
    params["text_projection"] = dense(text_cfg.hidden_size, projection_dim, bias=False)
    params["logit_scale"] = jnp.asarray(2.6592)
    return params
