"""Model loading from LOCAL HF diffusers snapshot directories.

Equivalent of the reference `model_util.load_models` / `load_models_xl`
(model_util.py:104-129,200-227) minus hub access: the user points at a local
snapshot (e.g. a pre-downloaded `stable-diffusion-v1-5` directory with
unet/ text_encoder/ tokenizer/ vae/ subfolders). Weights convert to our
NHWC/(in,out) layouts (models/convert.py); configs map onto our dataclasses.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from sliders_tpu.models import clip_text, convert, unet2d, vae
from sliders_tpu.text.tokenizer import ClipTokenizer


def unet_config_from_hf(cfg: dict) -> unet2d.UNetConfig:
    heads = cfg.get("num_attention_heads") or cfg["attention_head_dim"]
    n_blocks = len(cfg["block_out_channels"])
    if isinstance(heads, int):
        heads = (heads,) * n_blocks
    tl = cfg.get("transformer_layers_per_block", 1)
    if isinstance(tl, int):
        tl = (tl,) * n_blocks
    return unet2d.UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        num_attention_heads=tuple(heads),
        transformer_layers_per_block=tuple(tl),
        use_linear_projection=cfg.get("use_linear_projection", False),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim"
        ),
    )


def clip_config_from_hf(cfg: dict) -> clip_text.ClipTextConfig:
    eos = cfg.get("eos_token_id", 2)
    if eos == 2 and cfg.get("vocab_size", 49408) == 49408:
        # legacy HF configs say eos=2 and rely on argmax pooling; the real
        # CLIP EOS/pad id is 49407 (first occurrence == argmax position)
        eos = 49407
    return clip_text.ClipTextConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_positions=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        eos_token_id=eos,
        projection_dim=cfg.get("projection_dim"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


def vae_config_from_hf(cfg: dict) -> vae.VaeConfig:
    return vae.VaeConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
        shift_factor=cfg.get("shift_factor") or 0.0,
    )


@dataclass
class TextEncoderBundle:
    tokenizer: ClipTokenizer
    params: dict
    config: clip_text.ClipTextConfig
    clip_skip_layers: Optional[int] = None  # override for apply(num_layers=...)


@dataclass
class SDModels:
    unet_params: dict
    unet_config: unet2d.UNetConfig
    text_encoders: list  # 1 for SD, 2 for SDXL
    vae_params: Optional[dict] = None
    vae_config: Optional[vae.VaeConfig] = None
    is_xl: bool = False


def _load_te(model_dir, te_sub, tok_sub, dtype, pad_token_id=None, clip_skip=None):
    cfg = clip_config_from_hf(convert.load_component_config(model_dir, te_sub))
    params = convert.cast_tree(convert.load_component(model_dir, te_sub), dtype)
    tokenizer = ClipTokenizer.from_pretrained(
        os.path.join(model_dir, tok_sub), pad_token_id=pad_token_id
    )
    tokenizer.model_max_length = cfg.max_positions
    layers = None
    if clip_skip is not None:
        # reference semantics: clip_skip k -> keep num_layers - (k - 1)
        layers = cfg.num_layers - (clip_skip - 1)
    return TextEncoderBundle(tokenizer, params, cfg, layers)


def load_sd(
    model_dir: str,
    *,
    v2: bool = False,
    clip_skip: Optional[int] = None,
    dtype=jnp.bfloat16,
    load_vae: bool = False,
    tokenizer_dir: Optional[str] = None,
) -> SDModels:
    """SD1.x / SD2.x loading (model_util.load_models equivalent). `v2` only
    affects defaults the HF config already encodes; clip_skip truncates the
    text encoder like model_util.py:48,62 (v2 default is clip_skip 2).

    Accepts a diffusers snapshot directory OR a single-file .ckpt /
    .safetensors checkpoint in the original LDM layout
    (model_util.py:111-116 dispatch); single files need `tokenizer_dir`
    (the reference fetches the tokenizer from the hub — no hub here)."""
    if clip_skip is None and v2:
        clip_skip = 2
    if model_dir.endswith((".ckpt", ".safetensors")):
        return _load_sd_single_file(
            model_dir, v2=v2, clip_skip=clip_skip, dtype=dtype,
            load_vae=load_vae, tokenizer_dir=tokenizer_dir,
        )
    unet_cfg = unet_config_from_hf(convert.load_component_config(model_dir, "unet"))
    unet_params = convert.cast_tree(convert.load_component(model_dir, "unet"), dtype)
    te = _load_te(model_dir, "text_encoder", "tokenizer", dtype, clip_skip=clip_skip)
    bundle = SDModels(unet_params, unet_cfg, [te], is_xl=False)
    if load_vae:
        bundle.vae_config = vae_config_from_hf(convert.load_component_config(model_dir, "vae"))
        bundle.vae_params = convert.cast_tree(convert.load_component(model_dir, "vae"), dtype)
    return bundle


def flux_config_from_hf(cfg: dict):
    from sliders_tpu.models import flux

    return flux.FluxConfig(
        in_channels=cfg.get("in_channels", 64),
        num_layers=cfg.get("num_layers", 19),
        num_single_layers=cfg.get("num_single_layers", 38),
        attention_head_dim=cfg.get("attention_head_dim", 128),
        num_attention_heads=cfg.get("num_attention_heads", 24),
        joint_attention_dim=cfg.get("joint_attention_dim", 4096),
        pooled_projection_dim=cfg.get("pooled_projection_dim", 768),
        guidance_embeds=cfg.get("guidance_embeds", True),
        axes_dims_rope=tuple(cfg.get("axes_dims_rope", (16, 56, 56))),
    )


@dataclass
class FluxModels:
    transformer_params: dict
    transformer_config: object
    clip: TextEncoderBundle
    t5_params: Optional[dict]
    t5_config: object
    t5_tokenizer: Optional[object]
    vae_params: Optional[dict] = None
    vae_config: Optional[vae.VaeConfig] = None


def load_flux(model_dir: str, *, dtype=jnp.bfloat16, load_vae: bool = False) -> FluxModels:
    """FLUX pipeline loading (transformer + CLIP-L + T5 + 16ch VAE).

    The T5 tokenizer needs sentencepiece; when unavailable, pass precomputed
    token ids to the encoding helpers (t5_tokenizer stays None).
    """
    from sliders_tpu.models import t5 as t5_mod

    tcfg = flux_config_from_hf(convert.load_component_config(model_dir, "transformer"))
    tparams = convert.cast_tree(convert.load_component(model_dir, "transformer"), dtype)
    clip = _load_te(model_dir, "text_encoder", "tokenizer", dtype)

    t5_hf = convert.load_component_config(model_dir, "text_encoder_2")
    t5_cfg = t5_mod.T5Config(
        vocab_size=t5_hf.get("vocab_size", 32128),
        d_model=t5_hf.get("d_model", 4096),
        d_kv=t5_hf.get("d_kv", 64),
        d_ff=t5_hf.get("d_ff", 10240),
        num_layers=t5_hf.get("num_layers", 24),
        num_heads=t5_hf.get("num_heads", 64),
    )
    t5_params = convert.cast_tree(convert.load_component(model_dir, "text_encoder_2"), dtype)
    t5_tok = None
    try:
        import transformers

        t5_tok = transformers.T5TokenizerFast.from_pretrained(
            os.path.join(model_dir, "tokenizer_2")
        )
    except Exception:
        pass

    bundle = FluxModels(tparams, tcfg, clip, t5_params, t5_cfg, t5_tok)
    if load_vae:
        bundle.vae_config = vae_config_from_hf(convert.load_component_config(model_dir, "vae"))
        bundle.vae_params = convert.cast_tree(convert.load_component(model_dir, "vae"), dtype)
    return bundle


def _load_sd_single_file(
    path: str, *, v2: bool, clip_skip: Optional[int], dtype,
    load_vae: bool, tokenizer_dir: Optional[str],
) -> SDModels:
    from sliders_tpu.models import clip_text, ldm_checkpoint, unet2d

    if tokenizer_dir is None:
        raise ValueError(
            "single-file checkpoints carry no tokenizer; pass tokenizer_dir "
            "(a local CLIP tokenizer directory with vocab.json/merges.txt)"
        )
    unet_cfg = unet2d.SD21 if v2 else unet2d.SD15
    vae_cfg = vae.SD_VAE
    unet_tree, vae_tree, text_tree = ldm_checkpoint.load_single_file(
        path, unet_cfg, vae_cfg if load_vae else None
    )
    if unet_tree is None or text_tree is None:
        raise ValueError(f"{path}: missing UNet or text-encoder weights")
    if v2:
        # single files store the full 24-layer OpenCLIP text tower; clip_skip
        # (default 2 for v2) truncates at apply time, matching the reference's
        # num_hidden_layers = 24 - (clip_skip - 1) (model_util.py:48)
        te_cfg = dataclasses.replace(clip_text.CLIP_SD2, num_layers=24)
    else:
        te_cfg = clip_text.CLIP_L
    tokenizer = ClipTokenizer.from_pretrained(tokenizer_dir)
    tokenizer.model_max_length = te_cfg.max_positions
    layers = te_cfg.num_layers - (clip_skip - 1) if clip_skip else None
    te = TextEncoderBundle(
        tokenizer, convert.cast_tree(text_tree, dtype), te_cfg, layers
    )
    bundle = SDModels(convert.cast_tree(unet_tree, dtype), unet_cfg, [te], is_xl=False)
    if load_vae and vae_tree is not None:
        bundle.vae_config = vae_cfg
        bundle.vae_params = convert.cast_tree(vae_tree, dtype)
    return bundle


def load_sdxl(model_dir: str, *, dtype=jnp.bfloat16, load_vae: bool = False) -> SDModels:
    """SDXL loading (model_util.load_models_xl equivalent): two text
    encoders, tokenizer_2 padded with 0 (model_util.py:150)."""
    unet_cfg = unet_config_from_hf(convert.load_component_config(model_dir, "unet"))
    unet_params = convert.cast_tree(convert.load_component(model_dir, "unet"), dtype)
    te1 = _load_te(model_dir, "text_encoder", "tokenizer", dtype)
    te2 = _load_te(model_dir, "text_encoder_2", "tokenizer_2", dtype, pad_token_id=0)
    bundle = SDModels(unet_params, unet_cfg, [te1, te2], is_xl=True)
    if load_vae:
        bundle.vae_config = vae_config_from_hf(convert.load_component_config(model_dir, "vae"))
        bundle.vae_params = convert.cast_tree(convert.load_component(model_dir, "vae"), dtype)
    return bundle
