"""Train a FLUX text slider (flow matching).

The reference ships this flow as a notebook (train-flux-concept-sliders.ipynb,
missing from its snapshot — flux-sliders/README.md:15-23 + utils specify the
behavior): rank-r LoRA on the FluxTransformer attention blocks, ortho-up
frozen init for non-'full' methods, CLIP pooled + T5 sequence conditioning,
the same prompt-pair slider objective.

Usage:
  python -m sliders_tpu.cli.train_flux_slider --config_file data/config.yaml \
      [--prompts_file ... --rank 16 --alpha 1 --name age_flux]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from sliders_tpu.core import config as config_util
    from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines.flux_t2i import encode_prompts_flux
    from sliders_tpu.prompts import load_prompts_from_yaml
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.flux_slider import make_flux_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState, stack_prompt_pairs

    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    if args.prompts_file is not None:
        config.prompts_file = args.prompts_file
    if args.rank is not None:
        config.network.rank = args.rank
    if args.alpha is not None:
        config.network.alpha = args.alpha
    config.save.name += f"_alpha{config.network.alpha}"
    config.save.name += f"_rank{config.network.rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"

    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]
    prompts = load_prompts_from_yaml(config.prompts_file, attributes)

    from sliders_tpu.parallel import mesh as pmesh

    pmesh.maybe_initialize_distributed()  # multi-host: before any device op
    dtype = jnp.bfloat16 if config.train.precision in ("bf16", "bfloat16") else jnp.float32
    models = loader.load_flux(config.pretrained_model.name_or_path, dtype=dtype)

    mesh = None
    if len(jax.devices()) > 1 or config.tpu.tp > 1:
        mesh = pmesh.make_mesh(dp=config.tpu.dp, tp=config.tpu.tp)
        if prompts[0].batch_size % mesh.shape["dp"] != 0:
            mesh = pmesh.make_mesh(dp=1, tp=config.tpu.tp)
        models.transformer_params = pmesh.shard_params(
            mesh, models.transformer_params, tp_enabled=config.tpu.tp > 1
        )

    # ortho-up frozen init for non-'full' methods (flux lora.py:52-69,120-126)
    ortho = config.network.training_method != "full"
    lora = lnet.create_slider_network(
        jax.random.key(args.seed + 1),
        models.transformer_params,
        rank=config.network.rank,
        alpha=config.network.alpha,
        train_method=config.network.training_method,
        ortho_up=ortho,
    )
    print(f"create LoRA for transformer: {len(lora)} modules (ortho_up={ortho}).")
    mask = lnet.trainable_mask(lora, ortho_up=ortho)
    optimizer = opt_factory.make_optimizer(
        config.train.optimizer,
        opt_factory.make_lr_schedule(
            config.train.lr_scheduler, config.train.lr, config.train.iterations
        ),
        opt_factory.parse_optimizer_args(config.train.optimizer_args),
        trainable_mask=mask,
    )

    resolution = prompts[0].resolution
    seq_len = ((resolution // 8) // 2) ** 2
    sampler = make_flowmatch_sampler(
        num_steps=config.train.max_denoising_steps, image_seq_len=seq_len
    )
    chunk = max(1, config.tpu.steps_per_call)
    steps_by_n: dict = {}

    def get_step(n):
        if n not in steps_by_n:
            steps_by_n[n] = make_flux_slider_step(
                models.transformer_config, sampler, optimizer,
                resolution=resolution,
                batch_size=prompts[0].batch_size,
                transformer_guidance=args.transformer_guidance,
                compute_dtype=dtype,
                remat=config.tpu.remat,
                mesh=mesh,
                donate=config.tpu.donate,
                trainable_mask=mask,
                chunk=n,
            )
        return steps_by_n[n]

    # encode + stack prompt pairs
    pair_dicts = []
    for s in prompts:
        sign = 1.0 if s.action == "enhance" else -1.0
        pair = {"guidance_signed": jnp.asarray(sign * s.guidance_scale)}
        for role, prompt in (
            ("target", s.target), ("positive", s.positive),
            ("neutral", s.neutral), ("unconditional", s.unconditional),
        ):
            pooled, t5e = encode_prompts_flux(models, [prompt], max_t5_len=args.t5_len)
            pair[f"{role}_pooled"] = pooled[0]
            pair[f"{role}_t5"] = t5e[0]
        pair_dicts.append(pair)
    pairs = stack_prompt_pairs(pair_dicts)

    state = SliderTrainState.create(jax.random.key(args.seed), lora, optimizer)
    save_dir = Path(config.save.path)
    save_dir.mkdir(parents=True, exist_ok=True)
    ext = ".safetensors" if config.save.format == "safetensors" else ".pt"
    with open(save_dir / f"{config.save.name}_metadata.json", "w") as f:
        json.dump({"prompts": [p.model_dump() for p in prompts],
                   "config": json.loads(config.model_dump_json())}, f, indent=2)

    i = 0
    while i < config.train.iterations:
        n = min(chunk, config.train.iterations - i)
        # align chunk ends to the save cadence so periodic artifacts hold
        # exactly their labeled step's weights (see training/driver.py)
        per = config.save.per_steps
        if per and per > 0:
            boundary = max(((i + per - 1) // per) * per, per)
            n = min(n, boundary - i + 1)
        state, metrics = get_step(n)(state, models.transformer_params, pairs)
        per_step = (
            [jax.tree.map(lambda a, j=j: a[j], metrics) for j in range(n)]
            if n > 1
            else [metrics]
        )
        for j, m in enumerate(per_step):
            sj = i + j
            if sj % config.logging.log_every == 0:
                print(f"step {sj}: loss*1k={float(m['loss']) * 1000:.4f}")
            if sj % config.save.per_steps == 0 and sj != 0 and sj != config.train.iterations - 1:
                lora_io.save_slider(
                    str(save_dir / f"{config.save.name}_{sj}steps{ext}"),
                    jax.device_get(state.lora),
                )
        i += n
    lora_io.save_slider(
        str(save_dir / f"{config.save.name}_last{ext}"), jax.device_get(state.lora)
    )
    print("Done.")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--prompts_file", default=None)
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--attributes", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--t5_len", type=int, default=512)
    p.add_argument(
        "--transformer_guidance", type=float, default=1.0,
        help="guidance-embedding value during training (FLUX.1-dev)",
    )
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
