"""Train a FLEET of text sliders — one jitted step trains every slider.

Where the reference trains one slider per process (trainscripts/
textsliders/train_lora.py, one run per prompts YAML), this trains one
slider per --prompts_file concurrently: K adapters ride the same UNet
calls as per-row stacked LoRA (training/fleet.py). One process, one
compiled program, K artifacts; on a dp mesh each chip trains its own
sliders with ZERO gradient collectives. Honest one-chip economics
(BASELINE.md round-4 fleet table): SD1.5 512px is MXU-bound at the solo
batch already, so fleet-4 is 0.66x sequential in the exact-parity per-row
mode and 1.04x with --shared_t_to — the throughput win is multi-chip.

Usage:
  python -m sliders_tpu.cli.train_fleet --config_file data/config.yaml \
      --prompts_file data/prompts-age_GPT.yaml data/prompts-smile_GPT.yaml \
      [--names age,smile --rank 4 --alpha 1 --xl --resume state.msgpack]

Each slider saves the solo artifact set: `{name}_last.safetensors` +
periodic `{name}_{i}steps...` — drop-in for every downstream CLI.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from sliders_tpu.core import config as config_util
from sliders_tpu.models import loader
from sliders_tpu.parallel import mesh as pmesh
from sliders_tpu.prompts import load_prompts_from_yaml
from sliders_tpu.training.fleet import train_fleet


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]
    if args.alpha is not None:
        config.network.alpha = args.alpha
    if args.rank is not None:
        config.network.rank = args.rank
    suffix = (
        f"_alpha{config.network.alpha}_rank{config.network.rank}"
        f"_{config.network.training_method}"
    )
    config.save.name += suffix
    config.save.path += f"/{config.save.name}_fleet"

    if args.names is not None:
        names = [n.strip() for n in args.names.split(",")]
        if len(names) != len(args.prompts_file):
            raise SystemExit("--names must list one name per --prompts_file")
    else:
        names = [Path(p).stem for p in args.prompts_file]
    prompt_sets = [
        (name + suffix, load_prompts_from_yaml(path, attributes))
        for name, path in zip(names, args.prompts_file)
    ]
    for name, settings in prompt_sets:
        print(f"[{name}] {len(settings)} prompt pair(s)")

    import jax
    import jax.numpy as jnp

    from sliders_tpu.ops.attention import set_default_attention_impl

    pmesh.maybe_initialize_distributed()
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
        import math

        # fleet rows shard over dp, so dp must divide the fleet size; clamp
        # the requested/default dp to the largest compatible divisor (the
        # remaining devices still serve tp if configured)
        n_dev = len(jax.devices())
        dp = config.tpu.dp if config.tpu.dp != -1 else n_dev // config.tpu.tp
        rows = len(prompt_sets)
        dp_fit = math.gcd(dp, rows)
        if dp_fit != dp:
            print(f"fleet of {rows} does not divide dp={dp}; using dp={dp_fit}")
        if dp_fit > 1 or config.tpu.tp > 1:
            mesh = pmesh.make_mesh(dp=dp_fit, tp=config.tpu.tp)
            models.unet_params = pmesh.shard_params(
                mesh, models.unet_params, tp_enabled=config.tpu.tp > 1
            )

    train_fleet(
        config, prompt_sets, models, mesh=mesh, resume_from=args.resume,
        shared_t_to=args.shared_t_to, t_to_mode=args.t_to_mode,
        t_to_strata=args.t_to_strata,
    )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True, help="Config file for training.")
    parser.add_argument(
        "--prompts_file", nargs="+", required=True,
        help="One prompts YAML per slider; all sliders train concurrently.",
    )
    parser.add_argument(
        "--names", default=None,
        help="Comma-separated slider names (default: prompts-file stems).",
    )
    parser.add_argument("--name", default=None, help="Run-name prefix override.")
    parser.add_argument("--alpha", type=float, default=None, help="LoRA weight.")
    parser.add_argument("--rank", type=int, default=None, help="Rank of LoRA.")
    parser.add_argument(
        "--attributes", default=None,
        help="Attributes to disentangle (comma separated), applied to every slider.",
    )
    parser.add_argument("--xl", action="store_true", help="Train SDXL sliders.")
    parser.add_argument("--resume", default=None, help="Fleet trainstate msgpack.")
    parser.add_argument(
        "--shared_t_to", action="store_true",
        help="share row 0's per-iteration t_to draw across the fleet: "
        "removes the E[max_K t_to] denoise-loop inflation (~1.6x for K=4) "
        "at the cost of correlated (not per-slider-stream) t_to draws; "
        "per-slider marginals are unchanged.",
    )
    parser.add_argument(
        "--t_to_mode", default=None,
        choices=["per_row", "shared", "stratified"],
        help="joint distribution of the K rows' t_to draws (marginals stay "
        "Uniform{1..T-1} in every mode): per_row = i.i.d. solo streams "
        "(E[max] loop inflation ~1.6x at K=4), shared = row 0's draw for "
        "all (optimal loop, fully correlated), stratified = shared coarse "
        "stratum + independent within-stratum jitter (~7%% inflation at "
        "K=4/S=8, correlation only through the stratum).",
    )
    parser.add_argument(
        "--t_to_strata", type=int, default=8,
        help="stratum count S for --t_to_mode stratified (larger = faster "
        "loop, coarser shared quantization).",
    )
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
