"""Per-word cross-attention map extraction — the reference's
show_cross_attention diagnostics (trainscripts/textsliders/ptp_utils.py:
243-295 via demo_image_editing.ipynb) as a script.

Runs one UNet forward at a chosen timestep with the attention taps active,
aggregates the 16x16 cross-attention maps over the up+down blocks, and
saves one grayscale heat map per prompt token (optionally with a slider
applied at a given scale, to inspect how the slider shifts attention).

Usage:
  python examples/attention_maps.py --base /path/sd15 \
      --prompt 'photo of an old person' --t 501 --out maps/ \
      [--slider age_last.safetensors --scale 2.0] [--res 16]
"""

import argparse
import os

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader
    from sliders_tpu.ops.basic import SliderLora
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.pipelines.attention_control import (
        aggregate_attention,
        group_store,
        make_attention_maps_fn,
        word_attention_maps,
    )
    from sliders_tpu.pipelines.encoding import encode_prompts

    models = loader.load_sd(args.base, dtype=jnp.float32)
    te = models.text_encoders[0]
    ehs = encode_prompts(te.tokenizer, te.params, te.config, [args.prompt])
    latents = t2i.initial_latents(
        jax.random.key(args.seed), 1, args.size, args.size, 1.0
    )

    lora = None
    if args.slider:
        weights = lora_io.load_slider(args.slider, models.unet_params)
        lora = SliderLora(weights=weights, multiplier=jnp.asarray(args.scale))

    fn = make_attention_maps_fn(models.unet_config)
    _eps, raw = fn(
        models.unet_params, latents, jnp.asarray([float(args.t)]), ehs, lora=lora
    )
    store = group_store(raw)
    agg = aggregate_attention(store, args.res, from_where=("up", "down"), is_cross=True)

    os.makedirs(args.out, exist_ok=True)
    maps = word_attention_maps(te.tokenizer, args.prompt, agg)
    for name, m in maps.items():
        img = (np.kron(m, np.ones((16, 16))) * 255).astype(np.uint8)
        safe = name.replace(":", "_").replace("/", "_")
        Image.fromarray(img, "L").save(os.path.join(args.out, f"{safe}.png"))
        print(f"{name}: peak {m.max():.3f} -> {safe}.png")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True, help="local SD snapshot dir")
    p.add_argument("--prompt", required=True)
    p.add_argument("--slider", default=None)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--t", type=int, default=501, help="diffusion timestep")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--res", type=int, default=16, help="map resolution to aggregate")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="attention_maps")
    main(p.parse_args())
