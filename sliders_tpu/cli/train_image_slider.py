"""Train an image slider from paired before/after folders — CLI-compatible
with the reference (train_lora-scale.py:376-501 / train_lora-scale-xl.py):
`--name ... --rank 4 --alpha 1 --config_file ... --folder_main ...
--folders 'bigsize,smallsize' --scales '1,-1' [--xl] [--stylecheck]`.

Training resolution follows the reference scripts: 256 for SD1, 512 for XL
(train_lora-scale.py:219, train_lora-scale-xl.py).
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

from sliders_tpu.core import config as config_util
from sliders_tpu.data.paired_images import PairedImageFolders, parse_folder_args
from sliders_tpu.models import loader
from sliders_tpu.prompts import load_prompts_from_yaml


def train_one(config, prompts, models, folder_main, folders, scales, resolution, seed=0):
    import jax
    import jax.numpy as jnp

    from pathlib import Path
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.driver import PromptEmbedsCache
    from sliders_tpu.training.image_slider import make_image_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState

    from sliders_tpu.parallel import mesh as pmesh

    dataset = PairedImageFolders(folder_main, folders, scales)
    cache = PromptEmbedsCache(models)
    settings = prompts[0]  # reference samples one prompt set per run

    # dp mesh over the fused +-s batch (2 images per pair); tp shards the
    # attention/ff matmuls (parallel/mesh.py rules)
    mesh = None
    if len(jax.devices()) > 1 or config.tpu.tp > 1:
        mesh = pmesh.make_mesh(dp=config.tpu.dp, tp=config.tpu.tp)
        if 2 % mesh.shape["dp"] != 0:  # batch is 2*B with B=1
            mesh = pmesh.make_mesh(dp=1, tp=config.tpu.tp)
        models.unet_params = pmesh.shard_params(
            mesh, models.unet_params, tp_enabled=config.tpu.tp > 1
        )
        models.vae_params = pmesh.replicate(mesh, models.vae_params)

    schedule = make_schedule(
        prediction_type="v_prediction" if config.pretrained_model.v_pred else "epsilon"
    )
    sampler = make_sampler(
        schedule, config.train.noise_scheduler, config.train.max_denoising_steps
    )
    # image sliders use kaiming a=sqrt(5) down-init (imagesliders/lora.py:96)
    lora = lnet.create_slider_network(
        jax.random.key(seed + 1),
        models.unet_params,
        rank=config.network.rank,
        alpha=config.network.alpha,
        train_method=config.network.training_method,
        network_type=config.network.type,
        init_a=math.sqrt(5),
    )
    print(f"create LoRA for U-Net: {len(lora)} modules.")
    optimizer = opt_factory.make_optimizer(
        config.train.optimizer,
        opt_factory.make_lr_schedule(
            config.train.lr_scheduler, config.train.lr, config.train.iterations
        ),
        opt_factory.parse_optimizer_args(config.train.optimizer_args),
        trainable_mask=lnet.trainable_mask(lora),
    )
    compute_dtype = jnp.bfloat16 if config.train.precision in ("bf16", "bfloat16") else jnp.float32
    # dispatch-amortization (tpu.steps_per_call): the chunked step scans over
    # a STACKED (chunk,)-leading batch of per-iteration image pairs, so the
    # reference's per-iteration resampling (train_lora-scale.py:211-220) is
    # preserved; prompt embeddings transfer once per dispatch
    chunk_cfg = max(1, config.tpu.steps_per_call)
    steps_cache: dict = {}

    def get_step(chunk):
        if chunk not in steps_cache:
            steps_cache[chunk] = make_image_slider_step(
                models.unet_config, models.vae_config, schedule, sampler, optimizer,
                max_denoising_steps=config.train.max_denoising_steps,
                compute_dtype=compute_dtype,
                remat=config.tpu.remat,
                is_xl=models.is_xl,
                mesh=mesh,
                donate=config.tpu.donate,
                chunk=chunk,
            )
        return steps_cache[chunk]

    state = SliderTrainState.create(jax.random.key(seed), lora, optimizer)

    batch_static = {}
    for k, prompt in (
        ("positive", settings.positive),
        ("neutral", settings.neutral),
        ("unconditional", settings.unconditional),
    ):
        e = cache[prompt]
        if models.is_xl:
            batch_static[k] = e[0]
            batch_static[f"pooled_{k}"] = e[1]
        else:
            batch_static[k] = e
    if models.is_xl:
        batch_static["time_ids"] = t2i.get_add_time_ids(resolution, resolution)[0]

    host_rng = np.random.default_rng(seed)
    save_dir = Path(config.save.path)
    save_dir.mkdir(parents=True, exist_ok=True)
    ext = ".safetensors" if config.save.format == "safetensors" else ".pt"

    def to_u8(a):
        # images come from uint8 sources; ship them uint8 and normalize on
        # device (4x less traffic through the tunnel, image_slider.py)
        return np.clip((np.asarray(a, np.float32) + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)

    i = 0
    while i < config.train.iterations:
        n = min(chunk_cfg, config.train.iterations - i)
        # align chunk ends to the save cadence so each periodic artifact
        # holds exactly the weights of its labeled step; the phase locks to
        # the per_steps cycle after the first save, so the set of distinct
        # chunk lengths (each a one-time jit compile) stays <=4
        if config.save.per_steps and config.save.per_steps > 0:
            boundary = max(
                ((i + config.save.per_steps - 1) // config.save.per_steps)
                * config.save.per_steps,
                config.save.per_steps,
            )
            n = min(n, boundary - i + 1)
        samples = [dataset.sample_pair(host_rng, resolution) for _ in range(n)]
        if n == 1:
            s, lo, hi = samples[0]
            batch = dict(
                batch_static,
                images_low=to_u8(lo)[None],
                images_high=to_u8(hi)[None],
                scale=jnp.asarray(s, jnp.float32),
            )
        else:
            batch = dict(
                batch_static,
                images_low=np.stack([to_u8(lo)[None] for _, lo, _ in samples]),
                images_high=np.stack([to_u8(hi)[None] for _, _, hi in samples]),
                scale=jnp.asarray([s for s, _, _ in samples], jnp.float32),
            )
        step = get_step(n)
        state, metrics = step(state, models.unet_params, models.vae_params, batch)
        per_step = (
            [jax.tree.map(lambda a, j=j: a[j], metrics) for j in range(n)]
            if n > 1
            else [metrics]
        )
        for j, m in enumerate(per_step):
            sj = i + j
            if sj % config.logging.log_every == 0:
                print(
                    f"step {sj}: loss*1k={float(m['loss']) * 1000:.4f} "
                    f"scale={float(m['scale'])}"
                )
            if (
                config.save.per_steps
                and config.save.per_steps > 0
                and sj % config.save.per_steps == 0
                and sj != 0
                and sj != config.train.iterations - 1
                and j == n - 1
            ):
                print("Saving...")
                lora_io.save_slider(
                    str(save_dir / f"{config.save.name}_{sj}steps{ext}"),
                    jax.device_get(state.lora),
                )
        i += n
    print("Saving...")
    lora_io.save_slider(
        str(save_dir / f"{config.save.name}_last{ext}"), jax.device_get(state.lora)
    )
    print("Done.")
    return jax.device_get(state.lora)


def train_fleet_images(
    config, prompts, models, fleet_mains, folders, scales, resolution, seed=0
):
    """Train one image slider per (name, folder_main) entry CONCURRENTLY in
    one jitted step (training/fleet.make_fleet_image_step) — the fleet path
    for the reference's --stylecheck loop, which trains the style folders
    sequentially (imagesliders/train_lora-scale.py:408-417). Every slider
    saves the solo artifact set `{name}_{config.save.name}_last.{ext}`."""
    import jax
    import jax.numpy as jnp

    from pathlib import Path
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.driver import PromptEmbedsCache
    from sliders_tpu.training.fleet import (
        make_fleet_image_step,
        stack_fleet,
        unstack_fleet,
    )
    from sliders_tpu.training.text_slider import SliderTrainState

    from sliders_tpu.parallel import mesh as pmesh

    K = len(fleet_mains)
    datasets = [
        (name, PairedImageFolders(main, folders, scales))
        for name, main in fleet_mains
    ]
    cache = PromptEmbedsCache(models)
    settings = prompts[0]

    mesh = None
    if len(jax.devices()) > 1 or config.tpu.tp > 1:
        n_dev = len(jax.devices())
        dp = config.tpu.dp if config.tpu.dp != -1 else n_dev // config.tpu.tp
        dp_fit = math.gcd(dp, K)
        if dp_fit > 1 or config.tpu.tp > 1:
            mesh = pmesh.make_mesh(dp=dp_fit, tp=config.tpu.tp)
            models.unet_params = pmesh.shard_params(
                mesh, models.unet_params, tp_enabled=config.tpu.tp > 1
            )
            models.vae_params = pmesh.replicate(mesh, models.vae_params)

    schedule = make_schedule(
        prediction_type="v_prediction" if config.pretrained_model.v_pred else "epsilon"
    )
    sampler = make_sampler(
        schedule, config.train.noise_scheduler, config.train.max_denoising_steps
    )
    loras = [
        lnet.create_slider_network(
            jax.random.fold_in(jax.random.key(seed + 1), r),
            models.unet_params,
            rank=config.network.rank,
            alpha=config.network.alpha,
            train_method=config.network.training_method,
            network_type=config.network.type,
            init_a=math.sqrt(5),
        )
        for r in range(K)
    ]
    fleet_tree = stack_fleet(loras)
    print(f"fleet: {K} image sliders x {len(loras[0])} LoRA modules")
    optimizer = opt_factory.make_optimizer(
        config.train.optimizer,
        opt_factory.make_lr_schedule(
            config.train.lr_scheduler, config.train.lr, config.train.iterations
        ),
        opt_factory.parse_optimizer_args(config.train.optimizer_args),
        trainable_mask=lnet.trainable_mask(fleet_tree),
    )
    compute_dtype = (
        jnp.bfloat16 if config.train.precision in ("bf16", "bfloat16") else jnp.float32
    )
    chunk_cfg = max(1, config.tpu.steps_per_call)
    steps_cache: dict = {}

    def get_step(chunk):
        if chunk not in steps_cache:
            steps_cache[chunk] = make_fleet_image_step(
                models.unet_config, models.vae_config, schedule, sampler, optimizer,
                n_sliders=K,
                optimizer_name=config.train.optimizer,
                max_denoising_steps=config.train.max_denoising_steps,
                compute_dtype=compute_dtype,
                remat=config.tpu.remat,
                is_xl=models.is_xl,
                mesh=mesh,
                donate=config.tpu.donate,
                chunk=chunk,
            )
        return steps_cache[chunk]

    state = SliderTrainState.create(jax.random.key(seed), fleet_tree, optimizer)

    batch_static = {}
    for k, prompt in (
        ("positive", settings.positive),
        ("neutral", settings.neutral),
    ):
        e = cache[prompt]
        if models.is_xl:
            batch_static[k] = jnp.broadcast_to(e[0], (K,) + e[0].shape)
            batch_static[f"pooled_{k}"] = jnp.broadcast_to(e[1], (K,) + e[1].shape)
        else:
            batch_static[k] = jnp.broadcast_to(e, (K,) + e.shape)
    if models.is_xl:
        tid = t2i.get_add_time_ids(resolution, resolution)[0]
        batch_static["time_ids"] = jnp.broadcast_to(tid, (K,) + tid.shape)

    host_rng = np.random.default_rng(seed)
    save_dir = Path(config.save.path)
    save_dir.mkdir(parents=True, exist_ok=True)
    ext = ".safetensors" if config.save.format == "safetensors" else ".pt"

    def to_u8(a):
        return np.clip(
            (np.asarray(a, np.float32) + 1.0) * 127.5 + 0.5, 0, 255
        ).astype(np.uint8)

    def save_all(suffix):
        for (name, _), solo in zip(
            datasets, unstack_fleet(jax.device_get(state.lora))
        ):
            lora_io.save_slider(str(save_dir / f"{name}{suffix}{ext}"), solo)

    i = 0
    while i < config.train.iterations:
        n = min(chunk_cfg, config.train.iterations - i)
        if config.save.per_steps and config.save.per_steps > 0:
            boundary = max(
                ((i + config.save.per_steps - 1) // config.save.per_steps)
                * config.save.per_steps,
                config.save.per_steps,
            )
            n = min(n, boundary - i + 1)
        # one fresh pair per slider per iteration (the reference resamples
        # every iteration); leaves are (K, 1, H, W, 3) / (K,), stacked to a
        # leading (chunk,) axis when scanning
        draws = [
            [ds.sample_pair(host_rng, resolution) for _, ds in datasets]
            for _ in range(n)
        ]

        def iter_batch(row):
            return (
                np.stack([to_u8(lo)[None] for _, lo, _ in row]),
                np.stack([to_u8(hi)[None] for _, _, hi in row]),
                np.asarray([s for s, _, _ in row], np.float32),
            )

        if n == 1:
            lo, hi, sc = iter_batch(draws[0])
            batch = dict(batch_static, images_low=lo, images_high=hi,
                         scale=jnp.asarray(sc))
        else:
            per = [iter_batch(row) for row in draws]
            batch = dict(
                batch_static,
                images_low=np.stack([p[0] for p in per]),
                images_high=np.stack([p[1] for p in per]),
                scale=jnp.asarray(np.stack([p[2] for p in per])),
            )
        state, metrics = get_step(n)(state, models.unet_params, models.vae_params, batch)
        per_step = (
            [jax.tree.map(lambda a, j=j: a[j], metrics) for j in range(n)]
            if n > 1
            else [metrics]
        )
        for j, m in enumerate(per_step):
            sj = i + j
            if sj % config.logging.log_every == 0:
                loss = np.asarray(m["loss"])
                print(
                    f"fleet step {sj}: mean loss*1k={float(loss.mean()) * 1000:.4f} "
                    f"({K} image sliders)"
                )
            if (
                config.save.per_steps
                and config.save.per_steps > 0
                and sj % config.save.per_steps == 0
                and sj != 0
                and sj != config.train.iterations - 1
                and j == n - 1
            ):
                print("Saving...")
                save_all(f"_{sj}steps")
        i += n
    print("Saving...")
    save_all("_last")
    print("Done.")
    return unstack_fleet(jax.device_get(state.lora))


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]
    if args.rank is not None:
        config.network.rank = args.rank
    if args.alpha is not None:
        config.network.alpha = args.alpha
    config.save.name += f"_alpha{config.network.alpha}"
    config.save.name += f"_rank{config.network.rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"

    import jax.numpy as jnp

    from sliders_tpu.parallel import mesh as _pmesh

    _pmesh.maybe_initialize_distributed()  # multi-host: before any device op
    dtype = jnp.bfloat16 if config.train.precision in ("bf16", "bfloat16") else jnp.float32
    if args.xl:
        models = loader.load_sdxl(
            config.pretrained_model.name_or_path, dtype=dtype, load_vae=True
        )
        resolution = args.resolution or 512
    else:
        models = loader.load_sd(
            config.pretrained_model.name_or_path,
            v2=config.pretrained_model.v2,
            clip_skip=config.pretrained_model.clip_skip,
            dtype=dtype,
            load_vae=True,
        )
        resolution = args.resolution or 256

    prompts = load_prompts_from_yaml(config.prompts_file, attributes)
    folders, scales = parse_folder_args(args.folders, args.scales)

    if args.stylecheck is not None:
        # reference --stylecheck: iterate numbered style folders
        # (train_lora-scale.py:408-417)
        base_name, base_main = config.save.name, args.folder_main
        styles = sorted(os.listdir(base_main))
        if args.fleet:
            # fleet path: every style's slider trains CONCURRENTLY in one
            # jitted step (training/fleet.make_fleet_image_step)
            fleet_mains = [
                (f"{style}_{base_name}", os.path.join(base_main, style))
                for style in styles
            ]
            train_fleet_images(
                config, prompts, models, fleet_mains, folders, scales, resolution
            )
        else:
            for style in styles:
                folder_main = os.path.join(base_main, style)
                config.save.name = f"{style}_{base_name}"
                train_one(config, prompts, models, folder_main, folders, scales, resolution)
    elif args.fleet:
        raise SystemExit("--fleet needs --stylecheck (one slider per style folder)")
    else:
        train_one(config, prompts, models, args.folder_main, folders, scales, resolution)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--prompts_file", default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--device", type=int, default=0, help="Ignored (mesh handles placement).")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--attributes", type=str, default=None)
    p.add_argument("--folder_main", type=str, required=True)
    p.add_argument("--folders", type=str, default="verylow, low, high, veryhigh")
    p.add_argument("--scales", type=str, default="-2, -1, 1, 2")
    p.add_argument("--stylecheck", type=str, default=None)
    p.add_argument(
        "--fleet", action="store_true",
        help="with --stylecheck: train every style's slider concurrently in "
        "one jitted step (training/fleet.py) instead of sequentially",
    )
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--xl", action="store_true")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
