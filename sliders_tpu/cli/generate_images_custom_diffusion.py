"""Custom-diffusion baseline generator — the reference's
eval-scripts/generate_images_customdiffusion.py:788-814 CLI: load an SDXL
base, apply a custom-diffusion delta checkpoint (modifier token embeddings
into BOTH encoders + attn2 projections over the UNet), then for each CSV row
sample `"{prompt} with {token}"` at 50 steps / CFG 7.5 and save
`{save_path}/{run}/{case_number}_{i}.png`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.evals.baselines import load_custom_diffusion
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.encoding import encode_prompts_xl

    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32
    models = loader.load_sdxl(args.base, dtype=dtype, load_vae=True)

    tokenizers = [te.tokenizer for te in models.text_encoders]
    te_params = [te.params for te in models.text_encoders]
    unet_params, te_params = load_custom_diffusion(
        args.model_name, models.unet_params, tokenizers, te_params,
        compress=args.compress,
    )

    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", args.ddim_steps)
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, guidance_rescale=0.0,
        compute_dtype=dtype, is_xl=True,
    )
    configs = [te.config for te in models.text_encoders]

    run = os.path.basename(os.path.dirname(os.path.abspath(args.model_name)))
    out_dir = os.path.join(args.save_path, run)
    os.makedirs(out_dir, exist_ok=True)

    df = pd.read_csv(args.prompts_path)
    tid = t2i.get_add_time_ids(args.image_size, args.image_size)
    B = args.num_samples
    for _, row in df.iterrows():
        case = int(row.case_number)
        if not (args.from_case <= case <= args.till_case):
            continue
        prompt = f"{row.prompt} with {args.token}"
        seed = int(row.evaluation_seed)
        print(prompt, seed)

        cond, pooled_c = encode_prompts_xl(tokenizers, te_params, configs, [prompt])
        uncond, pooled_u = encode_prompts_xl(tokenizers, te_params, configs, [""])
        added = {
            "text_embeds": jnp.tile(pooled_c, (B, 1)),
            "time_ids": jnp.tile(tid, (B, 1)),
            "uncond_text_embeds": jnp.tile(pooled_u, (B, 1)),
            "uncond_time_ids": jnp.tile(tid, (B, 1)),
        }
        lats = t2i.initial_latents(
            jax.random.key(seed), B, args.image_size, args.image_size,
            sampler.init_noise_sigma,
        )
        x = fn(
            unet_params, lats, jnp.tile(cond, (B, 1, 1)), jnp.tile(uncond, (B, 1, 1)),
            None, jnp.asarray(0.0), jnp.asarray(-1.0),
            jnp.asarray(float(args.guidance_scale)), jax.random.key(seed), added,
        )
        imgs = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
        for i in range(B):
            Image.fromarray(imgs[i]).save(os.path.join(out_dir, f"{case}_{i}.png"))


def build_parser():
    p = argparse.ArgumentParser(prog="Generate Custom Diffusion Images")
    p.add_argument("--model_name", required=True, help="path to custom-diffusion delta checkpoint (.pt)")
    p.add_argument("--prompts_path", required=True, help="csv with case_number,prompt,evaluation_seed")
    p.add_argument("--token", required=True, help="modifier token, e.g. '<sks-eyebrows>'")
    p.add_argument("--base", required=True, help="local SDXL snapshot dir")
    p.add_argument("--save_path", default="images/customdiffusion")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--num_samples", type=int, default=5)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1000000)
    p.add_argument("--compress", action="store_true", help="low-rank {'u','v'} additive deltas")
    p.add_argument("--precision", default="bfloat16")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
