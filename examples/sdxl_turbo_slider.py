"""SDXL-Turbo few-step slider inference — demo_SDXL_Turbo.ipynb as a script:
3 steps, guidance 1 (no CFG batch-doubling), slider gated at start_noise 700
(notebook cell 6).

Usage:
  python examples/sdxl_turbo_slider.py --base /path/sdxl-turbo \
      --slider muscular_last.safetensors --prompt 'photo of a man' --scales '-2,0,2'
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
    from sliders_tpu.pipelines.encoding import encode_prompts_xl

    models = loader.load_sdxl(args.base, dtype=jnp.bfloat16, load_vae=True)
    weights = lora_io.load_slider(args.slider, models.unet_params) if args.slider else None

    schedule = make_schedule()
    sampler = make_sampler(schedule, "euler_a", args.steps)
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, use_cfg=False, is_xl=True
    )

    toks = [te.tokenizer for te in models.text_encoders]
    ps = [te.params for te in models.text_encoders]
    cs = [te.config for te in models.text_encoders]
    cond, pooled = encode_prompts_xl(toks, ps, cs, [args.prompt])
    tid = t2i.get_add_time_ids(args.size, args.size)
    added = {"text_embeds": pooled, "time_ids": tid}

    lats = t2i.initial_latents(
        jax.random.key(args.seed), 1, args.size, args.size, sampler.init_noise_sigma
    )
    panels = []
    for s in [float(x) for x in args.scales.split(",")]:
        x = fn(
            models.unet_params, lats, cond, cond, weights,
            jnp.asarray(s), jnp.asarray(700.0), jnp.asarray(1.0),
            jax.random.key(args.seed), added,
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
    p.add_argument("--scales", default="-2,0,2")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="turbo_sweep.png")
    main(p.parse_args())
