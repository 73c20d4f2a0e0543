"""FLUX slider inference — the flux-sliders inference flow as a script:
FlowMatch-Euler with resolution shift, guidance embedding, slider gated by
step index (custom_flux_pipeline.py:694-731).

Usage:
  python examples/flux_slider_inference.py --base /path/FLUX.1-dev \
      --slider age_flux_last.safetensors --prompt 'portrait photo' \
      --scales '-4,0,4' --skip_till 2

Full FLUX-dev (11.9B params, ~23 GB bf16) exceeds one v5e chip's 16 GB
HBM; pass --pp N on an N*k-chip host to shard the block stacks by layer
over a pipeline mesh axis (parallel/pipeline.py) — e.g. --pp 4 on a v5e-8
leaves ~5.8 GB of transformer weights per chip:
  python examples/flux_slider_inference.py --base ... --pp 4
"""

import argparse

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import flux, loader, vae as vae_mod
    from sliders_tpu.pipelines.flux_t2i import (
        encode_prompts_flux,
        initial_packed_latents,
        make_flux_sampling_fn,
    )

    models = loader.load_flux(args.base, dtype=jnp.bfloat16, load_vae=True)
    weights = (
        lora_io.load_slider(args.slider, models.transformer_params)
        if args.slider else None
    )

    latent_hw = args.size // 8
    seq_len = (latent_hw // 2) ** 2
    sampler = make_flowmatch_sampler(num_steps=args.steps, image_seq_len=seq_len)
    mesh = None
    transformer_params = models.transformer_params
    if args.pp > 1:
        from sliders_tpu.parallel import mesh as pmesh, pipeline as pl

        mesh = pmesh.make_mesh(dp=1, tp=1, pp=args.pp)
        # any pp works: stacks are identity-padded to a stage multiple
        # (FLUX-dev's 19 double blocks are prime — pipeline.pad_stack_to_stages)
        transformer_params = pl.flux_pp_params(
            mesh, transformer_params, models.transformer_config
        )
    fn = make_flux_sampling_fn(
        models.transformer_config, sampler, latent_hw=latent_hw, mesh=mesh,
        num_microbatches=args.microbatches,
    )

    pooled, t5e = encode_prompts_flux(models, [args.prompt])
    lats = initial_packed_latents(
        jax.random.key(args.seed), 1, args.size, args.size,
        models.vae_config.latent_channels,
    )
    panels = []
    for s in [float(x) for x in args.scales.split(",")]:
        packed = fn(
            transformer_params, lats, pooled, t5e, weights,
            jnp.asarray(s), jnp.asarray(args.skip_till), jnp.asarray(args.guidance),
        )
        lat = flux.unpack_latents(packed, latent_hw, latent_hw)
        img = vae_mod.decode(
            models.vae_params, models.vae_config,
            vae_mod.denormalize_latents(models.vae_config, lat).astype(jnp.float32),
        )
        img = np.asarray(jnp.clip(img / 2 + 0.5, 0, 1) * 255).astype(np.uint8)[0]
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
    p.add_argument("--scales", default="-4,0,4")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--skip_till", type=int, default=2,
                   help="slider active when step index > skip_till")
    p.add_argument("--guidance", type=float, default=3.5)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="flux_sweep.png")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (layer-shard the block "
                        "stacks over a pp mesh axis; full FLUX-dev needs "
                        "this — it exceeds one chip's HBM)")
    p.add_argument("--microbatches", type=int, default=1)
    main(p.parse_args())
