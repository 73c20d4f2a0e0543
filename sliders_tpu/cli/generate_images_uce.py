"""UCE baseline generator — the reference's
eval-scripts/generate_images-uce.py:193-274 CLI: load an SD base and a
UCE-edited full UNet state_dict (.pt), and for each CSV row and each scale in
[-2,-1,-.5,0,.5,1,2] sample with the weight-interpolated UNet
``old + scale * (edited - old)`` swapped in at the start_noise boundary
(base weights while t > start_noise). Output layout matches the reference:
`{save_path}/{name}/{scale}/{case_number}_{i}.png` plus an `all/` strip.

TPU shape: the per-scale interpolation happens INSIDE one jitted two-segment
sampling program (scale is a traced scalar), so all scales share a single
compile; samples are batched per call.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEFAULT_SCALES = (-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)


def main(args):
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.evals.baselines import load_uce_unet, make_uce_sampling_fn
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.encoding import encode_prompts

    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32
    models = loader.load_sd(args.base, v2=args.v2, dtype=dtype, load_vae=True)
    edited_params = load_uce_unet(args.model_name, models.unet_params)

    schedule = make_schedule()
    # reference uses LMSDiscreteScheduler for UCE eval (generate_images-uce.py:62)
    sampler = make_sampler(schedule, args.scheduler, args.ddim_steps)
    fn = make_uce_sampling_fn(
        models.unet_config, sampler, compute_dtype=dtype
    )

    scales = (
        [float(s) for s in args.scales.split(",")]
        if args.scales is not None
        else list(DEFAULT_SCALES)
    )
    name = os.path.basename(args.model_name).replace(".pt", "")
    folder_path = os.path.join(args.save_path, name)
    os.makedirs(os.path.join(folder_path, "all"), exist_ok=True)
    # the '0.5'->'half' SUBSTRING replace is the reference's own folder
    # convention (generate_images_sd1.py:116-121) — scoring.py unmangles it
    # the same way, so e.g. 10.5 -> '1half' matches the reference layout
    # rather than fixing it (interop contract)
    scale_strs = [
        str(s).replace("0.5", "half").rstrip("0").rstrip(".") if "." in str(s) else str(s)
        for s in scales
    ]
    scale_strs = [s if s else "0" for s in scale_strs]
    for s in scale_strs:
        os.makedirs(os.path.join(folder_path, s), exist_ok=True)

    te = models.text_encoders[0]
    B = args.num_samples
    df = pd.read_csv(args.prompts_path)
    for _, row in df.iterrows():
        case = int(row.case_number)
        if not (args.from_case <= case <= args.till_case):
            continue
        prompt = str(row.prompt)
        seed = int(row.evaluation_seed)
        print(prompt, seed)

        cond = encode_prompts(te.tokenizer, te.params, te.config, [prompt])
        uncond = encode_prompts(te.tokenizer, te.params, te.config, [""])
        lats = t2i.initial_latents(
            jax.random.key(seed), B, args.image_size, args.image_size,
            sampler.init_noise_sigma,
        )
        per_scale = []
        for scale in scales:
            x = fn(
                models.unet_params, edited_params, lats,
                jnp.tile(cond, (B, 1, 1)), jnp.tile(uncond, (B, 1, 1)),
                jnp.asarray(float(scale)), jnp.asarray(float(args.start_noise)),
                jnp.asarray(float(args.guidance_scale)), jax.random.key(seed),
            )
            per_scale.append(
                np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
            )
        h, w = per_scale[0].shape[1:3]
        for i in range(B):
            strip = Image.new("RGB", (w * len(scales), h))
            for j, (s_str, imgs) in enumerate(zip(scale_strs, per_scale)):
                im = Image.fromarray(imgs[i])
                im.save(os.path.join(folder_path, s_str, f"{case}_{i}.png"))
                strip.paste(im, (j * w, 0))
            strip.save(os.path.join(folder_path, "all", f"{case}_{i}.png"))


def build_parser():
    p = argparse.ArgumentParser(
        prog="generateImages", description="Generate images with a UCE-edited UNet"
    )
    p.add_argument("--model_name", required=True, help="UCE-edited UNet state_dict (.pt)")
    p.add_argument("--prompts_path", required=True, help="csv with case_number,prompt,evaluation_seed")
    p.add_argument("--base", required=True, help="local SD snapshot dir")
    p.add_argument("--save_path", required=True)
    p.add_argument("--v2", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--num_samples", type=int, default=5)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1000000)
    p.add_argument("--start_noise", type=int, default=800)
    p.add_argument("--scales", default=None, help="comma-separated; default -2,-1,-0.5,0,0.5,1,2")
    p.add_argument("--scheduler", default="lms")
    p.add_argument("--precision", default="bfloat16")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
