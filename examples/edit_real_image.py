"""Real-image slider editing — demo_image_editing.ipynb as a script:
null-text inversion of a real photo, then slider-guided re-sampling at
start_noise 500 (notebook cells 3-10).

Usage:
  python examples/edit_real_image.py --base /path/sd15 --image face.png \
      --prompt 'photo of a person' --slider age_last.safetensors --scales '0,2,4'
"""

import argparse

import numpy as np


def main(args):
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.data.paired_images import preprocess_image
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines.inversion import edit_image

    models = loader.load_sd(args.base, dtype=jnp.float32, load_vae=True)
    weights = lora_io.load_slider(args.slider, models.unet_params) if args.slider else None

    img = preprocess_image(Image.open(args.image), args.size)
    scales = [float(s) for s in args.scales.split(",")]
    outs = edit_image(
        models, jnp.asarray(img), args.prompt, weights, scales,
        num_steps=args.steps, start_noise=args.start_noise,
        guidance_scale=args.guidance, num_inner_steps=args.inner_steps,
    )
    panels = [Image.fromarray(np.asarray(outs[s])) for s in scales]
    grid = Image.new("RGB", (panels[0].width * len(panels), panels[0].height))
    for i, p in enumerate(panels):
        grid.paste(p, (i * p.width, 0))
    grid.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--slider", default=None)
    p.add_argument("--scales", default="0,2,4")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--start_noise", type=int, default=500)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--inner_steps", type=int, default=10)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="edited_sweep.png")
    main(p.parse_args())
