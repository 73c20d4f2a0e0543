"""SD1 slider inference demo — the SD1-sliders-inference.ipynb flow as a
script: load a local SD snapshot + a trained slider (reference .pt
checkpoints load directly), sweep scales with start-noise gating, save a
grid.

Usage:
  python examples/sd1_slider_inference.py --base /path/sd15 \
      --slider age_alpha1.0_rank4_noxattn_last.safetensors \
      --prompt 'photo of a person' --scales '0,1,2,3' --start_noise 800
"""

import argparse

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.encoding import encode_prompts

    models = loader.load_sd(args.base, dtype=jnp.bfloat16, load_vae=True)
    weights = lora_io.load_slider(args.slider, models.unet_params) if args.slider else None

    schedule = make_schedule()
    # the notebook uses the LMS scheduler at 50 steps (cell 4)
    sampler = make_sampler(schedule, args.scheduler, args.steps)
    fn = t2i.make_sampling_fn(models.unet_config, sampler)

    te = models.text_encoders[0]
    cond = encode_prompts(te.tokenizer, te.params, te.config, [args.prompt])
    uncond = encode_prompts(te.tokenizer, te.params, te.config, [""])
    lats = t2i.initial_latents(
        jax.random.key(args.seed), 1, args.size, args.size, sampler.init_noise_sigma
    )

    scales = [float(s) for s in args.scales.split(",")]
    panels = []
    for s in scales:
        x = fn(
            models.unet_params, lats, cond, uncond, weights,
            jnp.asarray(s), jnp.asarray(float(args.start_noise)),
            jnp.asarray(args.guidance), jax.random.key(args.seed),
        )
        img = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))[0]
        panels.append(Image.fromarray(img))
        print(f"scale {s:+g} done")

    grid = Image.new("RGB", (panels[0].width * len(panels), panels[0].height))
    for i, p in enumerate(panels):
        grid.paste(p, (i * p.width, 0))
    grid.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True)
    p.add_argument("--slider", default=None)
    p.add_argument("--prompt", required=True)
    p.add_argument("--scales", default="0,1,2,3")
    p.add_argument("--start_noise", type=int, default=800)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--scheduler", default="lms")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="slider_sweep.png")
    main(p.parse_args())
