"""Textual-inversion baseline generator — the reference's
eval-scripts/generate_images_textinversion.py (SD1: a pipeline with the
learned token baked in, prompt suffixed `" with {token}"`) and
generate_images_textinversion_xl.py:9-27 (SDXL: a learned {'emb','emb2'}
pair written into BOTH encoders' embedding rows via set_XLembedding).

Unified CLI over the same CSV contract (case_number,prompt,evaluation_seed):
  - `--embedding_file` injects a learned embedding: a torch .pt holding
    either {'emb': ..., 'emb2': ...} (XL pair), {token: tensor} (diffusers
    learned_embeds.bin), or a raw tensor. Without it the base snapshot is
    assumed to already contain the token (the SD1 reference flow).
  - `--xl` selects the SDXL path (both encoders).
Output: `{save_path}/{name}/{case_number}_{i}.png` (reference layout).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _resolve_embedding(emb_dict, token: str, key: str):
    """Pull one encoder's learned vector out of the checkpoint's dict."""
    import torch

    if isinstance(emb_dict, dict):
        if key in emb_dict:
            v = emb_dict[key]
        elif token in emb_dict:
            v = emb_dict[token]
        elif len(emb_dict) == 1:
            v = next(iter(emb_dict.values()))
        else:
            raise KeyError(
                f"cannot find {key!r} or {token!r} in embedding file keys {sorted(emb_dict)}"
            )
    else:
        v = emb_dict
    if isinstance(v, torch.Tensor):
        v = v.float().numpy()
    return np.asarray(v)


def inject_token(models, token: str, emb_path, xl: bool):
    """Write the learned embedding(s) into the loaded encoders, adding the
    token to the tokenizer(s) if it isn't a single token yet."""
    import torch

    import jax.numpy as jnp

    from sliders_tpu.evals.baselines import (
        inject_learned_token,
        resize_token_embeddings,
    )

    emb_dict = torch.load(emb_path, map_location="cpu", weights_only=True)
    for i, te in enumerate(models.text_encoders):
        if xl or len(models.text_encoders) > 1:
            vec = _resolve_embedding(emb_dict, token, "emb" if i == 0 else "emb2")
        else:
            vec = _resolve_embedding(emb_dict, token, "emb")
        try:
            ids = te.tokenizer.tokenize(token)
        except KeyError:  # chars outside the vocab -> must be added
            ids = []
        if len(ids) != 1:
            if te.tokenizer.add_tokens(token) == 0:
                raise ValueError(f"token {token!r} is neither single nor addable")
            te.params = resize_token_embeddings(te.params, len(te.tokenizer))
            ids = [te.tokenizer.convert_tokens_to_ids(token)]
        te.params = inject_learned_token(te.params, jnp.asarray(vec), [int(ids[0])])


def main(args):
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.encoding import encode_prompts, encode_prompts_xl

    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32
    if args.xl:
        models = loader.load_sdxl(args.model_name, dtype=dtype, load_vae=True)
    else:
        models = loader.load_sd(args.model_name, v2=args.v2, dtype=dtype, load_vae=True)

    if args.embedding_file:
        inject_token(models, args.token, args.embedding_file, args.xl)

    schedule = make_schedule()
    sampler = make_sampler(schedule, args.scheduler, args.ddim_steps)
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, guidance_rescale=0.0,
        compute_dtype=dtype, is_xl=models.is_xl,
    )

    name = os.path.basename(
        (args.embedding_file or args.model_name).rstrip("/")
    ).replace(".pt", "").replace(".bin", "")
    out_dir = os.path.join(args.save_path, name)
    os.makedirs(out_dir, exist_ok=True)

    suffix = args.suffix.format(token=args.token)
    B = args.num_samples
    df = pd.read_csv(args.prompts_path)
    for _, row in df.iterrows():
        case = int(row.case_number)
        if not (args.from_case <= case <= args.till_case):
            continue
        prompt = f"{row.prompt}{suffix}"
        seed = int(row.evaluation_seed)
        print(prompt, seed)

        if models.is_xl:
            toks = [te.tokenizer for te in models.text_encoders]
            ps = [te.params for te in models.text_encoders]
            cs = [te.config for te in models.text_encoders]
            cond, pooled_c = encode_prompts_xl(toks, ps, cs, [prompt])
            uncond, pooled_u = encode_prompts_xl(toks, ps, cs, [""])
            tid = t2i.get_add_time_ids(args.image_size, args.image_size)
            added = {
                "text_embeds": jnp.tile(pooled_c, (B, 1)),
                "time_ids": jnp.tile(tid, (B, 1)),
                "uncond_text_embeds": jnp.tile(pooled_u, (B, 1)),
                "uncond_time_ids": jnp.tile(tid, (B, 1)),
            }
        else:
            te = models.text_encoders[0]
            cond = encode_prompts(te.tokenizer, te.params, te.config, [prompt])
            uncond = encode_prompts(te.tokenizer, te.params, te.config, [""])
            added = None

        lats = t2i.initial_latents(
            jax.random.key(seed), B, args.image_size, args.image_size,
            sampler.init_noise_sigma,
        )
        x = fn(
            models.unet_params, lats, jnp.tile(cond, (B, 1, 1)),
            jnp.tile(uncond, (B, 1, 1)), None, jnp.asarray(0.0),
            jnp.asarray(-1.0), jnp.asarray(float(args.guidance_scale)),
            jax.random.key(seed), added,
        )
        imgs = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
        for i in range(B):
            Image.fromarray(imgs[i]).save(os.path.join(out_dir, f"{case}_{i}.png"))


def build_parser():
    p = argparse.ArgumentParser(prog="Generate Text Inversion Images")
    p.add_argument("--model_name", required=True, help="base snapshot dir (token baked in, or use --embedding_file)")
    p.add_argument("--prompts_path", required=True, help="csv with case_number,prompt,evaluation_seed")
    p.add_argument("--token", required=True, help="learned token, e.g. '<sks-eyebrows>' or 'sks'")
    p.add_argument("--embedding_file", default=None, help="torch .pt: {'emb','emb2'} (XL) / {token: vec} / raw tensor")
    p.add_argument("--save_path", default="images/text_inversion")
    p.add_argument("--suffix", default=" with {token}", help="prompt suffix template (XL eyesize ref used ' with {token} eyes')")
    p.add_argument("--xl", action="store_true")
    p.add_argument("--v2", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--num_samples", type=int, default=5)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1000000)
    p.add_argument("--scheduler", default="ddim")
    p.add_argument("--precision", default="bfloat16")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
