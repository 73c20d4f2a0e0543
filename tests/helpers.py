"""Test fixtures: synthesize a local HF-style model snapshot directory from
our tiny configs (the converter's inverse writes torch-layout safetensors),
so the full load->train->save path runs hermetically."""

import json
import os

import numpy as np
import jax

from sliders_tpu.models import clip_text, convert, unet2d, vae


def write_safetensors(path, tree):
    from safetensors.numpy import save_file

    state = convert.to_torch_layout(tree)
    state = {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in state.items()}
    save_file(state, path)


def make_tokenizer_files(d):
    os.makedirs(d, exist_ok=True)
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789!,. ")
    vocab = {}
    for c in chars:
        if c.strip():
            vocab.setdefault(c, len(vocab))
            vocab.setdefault(c + "</w>", len(vocab))
    merges = [("o", "l"), ("ol", "d</w>"), ("p", "e"), ("pe", "r"), ("s", "o")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return vocab


def clip_hf_config(cfg: clip_text.ClipTextConfig) -> dict:
    return {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_positions,
        "hidden_act": cfg.hidden_act,
        "eos_token_id": cfg.eos_token_id,
        **({"projection_dim": cfg.projection_dim} if cfg.projection_dim else {}),
    }


def unet_hf_config(cfg: unet2d.UNetConfig) -> dict:
    return {
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "down_block_types": list(cfg.down_block_types),
        "up_block_types": list(cfg.up_block_types),
        "layers_per_block": cfg.layers_per_block,
        "cross_attention_dim": cfg.cross_attention_dim,
        "attention_head_dim": list(cfg.num_attention_heads),
        "transformer_layers_per_block": list(cfg.transformer_layers_per_block),
        "use_linear_projection": cfg.use_linear_projection,
        "norm_num_groups": cfg.norm_num_groups,
        **(
            {
                "addition_embed_type": cfg.addition_embed_type,
                "addition_time_embed_dim": cfg.addition_time_embed_dim,
                "projection_class_embeddings_input_dim": cfg.projection_class_embeddings_input_dim,
            }
            if cfg.addition_embed_type
            else {}
        ),
    }


def vae_hf_config(cfg: vae.VaeConfig) -> dict:
    return {
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "latent_channels": cfg.latent_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": cfg.norm_num_groups,
        "scaling_factor": cfg.scaling_factor,
    }


def make_tiny_snapshot(root: str, xl: bool = False, with_vae: bool = True) -> str:
    """Write a complete tiny SD (or SDXL) snapshot under `root`."""
    os.makedirs(root, exist_ok=True)
    unet_cfg = unet2d.TINY_XL if xl else unet2d.TINY

    # tokenizer(s) + text encoder(s)
    vocab = make_tokenizer_files(os.path.join(root, "tokenizer"))
    eos = vocab["<|endoftext|>"]
    # non-XL: encoder width must equal the UNet cross-attention dim;
    # XL: the two 16-wide encoders concat to the 32-wide cross dim
    te_width = 16 if xl else unet_cfg.cross_attention_dim
    te_cfg = clip_text.ClipTextConfig(
        vocab_size=len(vocab), hidden_size=te_width, num_layers=2, num_heads=2,
        intermediate_size=2 * te_width, max_positions=16, eos_token_id=eos,
        hidden_act="quick_gelu",
    )
    te_params = clip_text.init_params(jax.random.key(10), te_cfg)
    os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(clip_hf_config(te_cfg), f)
    write_safetensors(os.path.join(root, "text_encoder", "model.safetensors"), te_params)

    if xl:
        make_tokenizer_files(os.path.join(root, "tokenizer_2"))
        te2_cfg = clip_text.ClipTextConfig(
            vocab_size=len(vocab), hidden_size=16, num_layers=2, num_heads=2,
            intermediate_size=32, max_positions=16, eos_token_id=eos,
            hidden_act="gelu", projection_dim=16,
        )
        te2_params = clip_text.init_params(jax.random.key(11), te2_cfg)
        os.makedirs(os.path.join(root, "text_encoder_2"), exist_ok=True)
        with open(os.path.join(root, "text_encoder_2", "config.json"), "w") as f:
            json.dump(clip_hf_config(te2_cfg), f)
        write_safetensors(
            os.path.join(root, "text_encoder_2", "model.safetensors"), te2_params
        )
        # XL cross dim must equal sum of encoder hidden sizes (16+16)
        assert unet_cfg.cross_attention_dim == 32
        # pooled dim 16 + 6*8 time ids = 64 == projection_class_embeddings_input_dim

    # unet
    unet_params = unet2d.init_params(jax.random.key(12), unet_cfg)
    os.makedirs(os.path.join(root, "unet"), exist_ok=True)
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump(unet_hf_config(unet_cfg), f)
    write_safetensors(
        os.path.join(root, "unet", "diffusion_pytorch_model.safetensors"), unet_params
    )

    if with_vae:
        vae_params = vae.init_params(jax.random.key(13), vae.TINY)
        os.makedirs(os.path.join(root, "vae"), exist_ok=True)
        with open(os.path.join(root, "vae", "config.json"), "w") as f:
            json.dump(vae_hf_config(vae.TINY), f)
        write_safetensors(
            os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"), vae_params
        )
    return root


def make_tiny_clip_snapshot(root: str) -> str:
    """Write a tiny openai/clip-vit-base-patch32-style snapshot (full CLIP:
    vision tower + text tower + projections) loadable by
    models.clip_vision.load_clip_model — lets the clip_score CLI run
    hermetically in CI."""
    from sliders_tpu.models import clip_vision

    os.makedirs(root, exist_ok=True)
    vocab = make_tokenizer_files(root)  # CLIP snapshots keep tokenizer at top level
    v_cfg = clip_vision.TINY_VISION
    t_cfg = clip_text.ClipTextConfig(
        vocab_size=len(vocab), hidden_size=24, num_layers=2, num_heads=2,
        intermediate_size=48, max_positions=16,
        eos_token_id=vocab["<|endoftext|>"], projection_dim=16,
    )
    params = clip_vision.init_params(jax.random.key(7), v_cfg, t_cfg, projection_dim=16)
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump(
            {
                "projection_dim": 16,
                "vision_config": {
                    "hidden_size": v_cfg.hidden_size,
                    "num_hidden_layers": v_cfg.num_layers,
                    "num_attention_heads": v_cfg.num_heads,
                    "intermediate_size": v_cfg.intermediate_size,
                    "image_size": v_cfg.image_size,
                    "patch_size": v_cfg.patch_size,
                    "hidden_act": v_cfg.hidden_act,
                },
                "text_config": clip_hf_config(t_cfg),
            },
            f,
        )
    write_safetensors(os.path.join(root, "model.safetensors"), params)
    return root


def make_t5_fast_tokenizer(d):
    """T5TokenizerFast-compatible files without sentencepiece: a WordLevel
    tokenizer.json (the 'Fast' backend is the rust `tokenizers` lib)."""
    from tokenizers import Tokenizer, pre_tokenizers
    from tokenizers.models import WordLevel

    os.makedirs(d, exist_ok=True)
    words = ["<pad>", "</s>", "<unk>", "person", "old", "young", "very",
             "smiling", "a", "photo", "of"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "T5Tokenizer", "eos_token": "</s>",
                   "pad_token": "<pad>", "unk_token": "<unk>",
                   "model_max_length": 512}, f)
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump({"eos_token": "</s>", "pad_token": "<pad>",
                   "unk_token": "<unk>"}, f)


def make_tiny_flux_snapshot(root: str, with_vae: bool = True) -> str:
    """Write a complete tiny FLUX snapshot (transformer + CLIP-L-style
    pooled encoder + T5 + 4ch VAE) under `root` for hermetic CLI tests."""
    from sliders_tpu.models import flux, t5 as t5_mod

    os.makedirs(root, exist_ok=True)
    fcfg = flux.TINY
    fparams = flux.init_params(jax.random.key(20), fcfg)
    os.makedirs(os.path.join(root, "transformer"), exist_ok=True)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({
            "in_channels": fcfg.in_channels,
            "num_layers": fcfg.num_layers,
            "num_single_layers": fcfg.num_single_layers,
            "attention_head_dim": fcfg.attention_head_dim,
            "num_attention_heads": fcfg.num_attention_heads,
            "joint_attention_dim": fcfg.joint_attention_dim,
            "pooled_projection_dim": fcfg.pooled_projection_dim,
            "guidance_embeds": fcfg.guidance_embeds,
            "axes_dims_rope": list(fcfg.axes_dims_rope),
        }, f)
    write_safetensors(
        os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"),
        fparams,
    )

    # CLIP: pooled dim == hidden == fcfg.pooled_projection_dim
    vocab = make_tokenizer_files(os.path.join(root, "tokenizer"))
    eos = vocab["<|endoftext|>"]
    te_cfg = clip_text.ClipTextConfig(
        vocab_size=len(vocab), hidden_size=fcfg.pooled_projection_dim,
        num_layers=2, num_heads=2,
        intermediate_size=2 * fcfg.pooled_projection_dim, max_positions=16,
        eos_token_id=eos, hidden_act="quick_gelu",
    )
    te_params = clip_text.init_params(jax.random.key(21), te_cfg)
    os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(clip_hf_config(te_cfg), f)
    write_safetensors(os.path.join(root, "text_encoder", "model.safetensors"), te_params)

    # T5: d_model == joint_attention_dim
    t5_cfg = t5_mod.T5Config(
        vocab_size=32, d_model=fcfg.joint_attention_dim, d_kv=8, d_ff=64,
        num_layers=2, num_heads=2,
    )
    t5_params = t5_mod.init_params(jax.random.key(22), t5_cfg)
    os.makedirs(os.path.join(root, "text_encoder_2"), exist_ok=True)
    with open(os.path.join(root, "text_encoder_2", "config.json"), "w") as f:
        json.dump({"vocab_size": t5_cfg.vocab_size, "d_model": t5_cfg.d_model,
                   "d_kv": t5_cfg.d_kv, "d_ff": t5_cfg.d_ff,
                   "num_layers": t5_cfg.num_layers,
                   "num_heads": t5_cfg.num_heads}, f)
    write_safetensors(
        os.path.join(root, "text_encoder_2", "model.safetensors"), t5_params
    )
    make_t5_fast_tokenizer(os.path.join(root, "tokenizer_2"))

    if with_vae:
        vae_params = vae.init_params(jax.random.key(23), vae.TINY)
        os.makedirs(os.path.join(root, "vae"), exist_ok=True)
        with open(os.path.join(root, "vae", "config.json"), "w") as f:
            json.dump(vae_hf_config(vae.TINY), f)
        write_safetensors(
            os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"), vae_params
        )
    return root
