"""Train a text slider (SD1/2 or SDXL) — CLI-compatible with the reference
trainers (train_lora.py:371-429 / train_lora_xl.py): same flags, same
run-name mangling `_alpha{a}_rank{r}_{method}` (train_lora.py:360-363), same
config/prompt YAMLs.

Usage:
  python -m sliders_tpu.cli.train_text_slider --config_file data/config.yaml \
      [--prompts_file ... --rank 4 --alpha 1 --name age_slider \
       --attributes 'male, female' --xl --resume path.msgpack]
"""

from __future__ import annotations

import argparse

from sliders_tpu.core import config as config_util
from sliders_tpu.models import loader
from sliders_tpu.parallel import mesh as pmesh
from sliders_tpu.prompts import load_prompts_from_yaml
from sliders_tpu.training.driver import train_text_sliders


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]
    if args.prompts_file is not None:
        config.prompts_file = args.prompts_file
    if args.alpha is not None:
        config.network.alpha = args.alpha
    if args.rank is not None:
        config.network.rank = args.rank
    config.save.name += f"_alpha{config.network.alpha}"
    config.save.name += f"_rank{config.network.rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"

    prompts = load_prompts_from_yaml(config.prompts_file, attributes)
    for p in prompts:
        print(p)

    import jax
    import jax.numpy as jnp

    from sliders_tpu.ops.attention import set_default_attention_impl

    pmesh.maybe_initialize_distributed()  # multi-host: before any device op
    set_default_attention_impl(config.tpu.attention)

    dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
        config.train.precision, jnp.float32
    )
    if args.xl:
        models = loader.load_sdxl(config.pretrained_model.name_or_path, dtype=dtype)
    else:
        models = loader.load_sd(
            config.pretrained_model.name_or_path,
            v2=config.pretrained_model.v2,
            clip_skip=config.pretrained_model.clip_skip,
            dtype=dtype,
        )
    mesh = None
    if len(jax.devices()) > 1 or config.tpu.tp > 1:
        mesh = pmesh.make_mesh(dp=config.tpu.dp, tp=config.tpu.tp)
        models.unet_params = pmesh.shard_params(
            mesh, models.unet_params, tp_enabled=config.tpu.tp > 1
        )

    train_text_sliders(config, prompts, models, mesh=mesh, resume_from=args.resume)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True, help="Config file for training.")
    parser.add_argument("--prompts_file", default=None, help="Prompts file for training.")
    parser.add_argument("--alpha", type=float, default=None, help="LoRA weight.")
    parser.add_argument("--rank", type=int, default=None, help="Rank of LoRA.")
    parser.add_argument(
        "--device", type=int, default=0,
        help="Ignored (kept for reference-CLI compatibility; device placement "
        "is the TPU mesh).",
    )
    parser.add_argument("--name", type=str, default=None, help="Run name.")
    parser.add_argument(
        "--attributes", type=str, default=None,
        help="attributes to disentangle (comma separated string)",
    )
    parser.add_argument("--xl", action="store_true", help="Train on SDXL.")
    parser.add_argument("--resume", type=str, default=None, help="Train state to resume: msgpack file (single-host) or orbax dir (mesh runs, reshards onto this run's mesh).")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
