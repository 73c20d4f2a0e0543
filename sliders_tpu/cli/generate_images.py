"""CSV-driven scale-sweep image generation — the reference eval generators
(eval-scripts/generate_images_sd1.py / generate_images_xl.py) as one CLI.

Per CSV row (case_number, prompt, evaluation_seed) and slider scale, sample
with the slider gated by start_noise and save
`{save_path}/{name}/{scale}/{case_number}_{i}.png` plus an `all/` grid —
the directory contract the CLIP/LPIPS scorers read.

TPU re-design: the entire scale sweep for one prompt is ONE batched denoise
using per-sample LoRA multipliers (the reference loops scales and re-runs
the full 50-step loop per scale — we do all scales in a single pass,
~len(scales)x fewer UNet launches at better MXU utilization).

Slider hyperparameters come from the `_metadata.json` sidecar when present,
else are parsed from the checkpoint filename exactly like the reference
(generate_images_sd1.py:80-104).
"""

from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np


DEFAULT_SCALES = [-2.0, -1.0, 0.0, 1.0, 2.0]
HSPACE_SCALES = [-5.0, -2.0, -1.0, 0.0, 1.0, 2.0, 5.0]


def infer_params_from_name(model_path: str) -> dict:
    """Reference checkpoint-layout hyperparam parsing
    (eval-scripts/generate_images_sd1.py:78-91).

    The reference reads the PARENT directory name
    (`model_name.split('/')[-2]`, i.e. models/<run_name>/<ckpt>.pt) and
    composes the train method from fragments: base 'xattn', overridden to
    'noxattn' if present, then '-hspace' / '-last' appended; hspace/last
    checkpoints auto-widen the scale sweep to [-5,-2,-1,0,1,2,5]. We extend
    this with basename fallback (our own save convention mangles
    `_alpha{a}_rank{r}_{method}` into the FILE name) and rank/alpha token
    parsing from either component.
    """
    parent = os.path.basename(os.path.dirname(os.path.abspath(model_path)))
    base = os.path.basename(model_path).replace(".safetensors", "").replace(".pt", "")
    # our own save convention suffixes the FILE with _last / _{i}steps
    # (lora/io.py) — strip those so they don't false-trigger the reference's
    # 'last' (hspace-last) fragment, which lives in the method name
    base = re.sub(r"_(last|\d+steps)$", "", base)
    def method_tokens(s: str) -> set:
        # underscore-delimited tokens plus their hyphen-split parts, so a
        # run name like 'ballast' or 'fullface' never false-matches a
        # fragment by substring
        toks = set()
        for t in s.split("_"):
            toks.add(t)
            toks.update(t.split("-"))
        return toks

    fragments = {"xattn", "noxattn", "hspace", "last", "full", "selfattn",
                 "innoxattn", "xattn-strict"}
    base_toks, parent_toks = method_tokens(base), method_tokens(parent)
    # our save convention mangles `_alpha{a}_rank{r}_{method}` into the FILE
    # name, the reference's into the parent dir — prefer whichever actually
    # carries method fragments, basename first (an unrelated parent dir that
    # happens to contain e.g. 'full' must not override the file's own tokens)
    toks = base_toks if base_toks & fragments else parent_toks

    # exact method token first (our mangled basenames / explicit run names)
    out = {"rank": 4, "alpha": 1.0, "scales": list(DEFAULT_SCALES)}
    method = None
    for m in (
        "noxattn-hspace-last", "noxattn-hspace", "xattn-strict", "innoxattn",
        "noxattn", "selfattn", "xattn", "full",
    ):
        if m in toks:
            method = m
            break
    if method is None:
        # reference fragment composition (generate_images_sd1.py:80-91)
        method = "xattn"
        if "noxattn" in toks:
            method = "noxattn"
        if "hspace" in toks:
            method += "-hspace"
        if "last" in toks:
            method += "-last"
    if "hspace" in toks or "last" in toks:
        out["scales"] = list(HSPACE_SCALES)
    out["train_method"] = method
    out["network_type"] = "lierla" if method == "xattn" else "c3lier"

    for token in (parent + "_" + base).split("_"):
        if token.startswith("rank"):
            try:
                out["rank"] = int(token[4:])
            except ValueError:
                pass
        if token.startswith("alpha"):
            try:
                out["alpha"] = float(token[5:])
            except ValueError:
                pass
    return out


def _infer_scales(model_path: str) -> list:
    """Scale sweep from the metadata sidecar when present, else from the
    checkpoint path (the reference filename convention)."""
    meta_path = model_path.rsplit("_", 1)[0] + "_metadata.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        method = meta.get("config", {}).get("network", {}).get("training_method", "")
        print(f"slider hyperparams from {meta_path}")
        if "hspace" in method or "last" in method:
            return list(HSPACE_SCALES)
        return list(DEFAULT_SCALES)
    inferred = infer_params_from_name(model_path)
    print(f"slider hyperparams from checkpoint path: {inferred}")
    return inferred["scales"]


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i

    import pandas as pd

    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32

    if getattr(args, "fleet", None):
        # fail fast (before the expensive model load) on fleet arg problems
        names = [
            os.path.basename(p).replace(".pt", "").replace(".safetensors", "")
            for p in args.fleet
        ]
        dup = sorted({n for n in names if names.count(n) > 1})
        if dup:
            # output folders are keyed by basename; two entries sharing one
            # (e.g. out1/age_last.pt and out2/age_last.pt) would silently
            # overwrite each other's sweeps
            raise SystemExit(
                f"--fleet entries share basename(s) {dup}; rename the "
                "checkpoints or pass them in separate runs"
            )
        # infer the sweep per checkpoint (hspace/last sliders widen to +-5);
        # a fleet mixing conventions has no single correct sweep
        per_ckpt = [_infer_scales(p) for p in args.fleet]
        if args.scales is None and any(s != per_ckpt[0] for s in per_ckpt):
            raise SystemExit(
                "--fleet checkpoints imply different scale sweeps "
                f"({dict(zip(args.fleet, per_ckpt))}); pass --scales "
                "explicitly to sweep them together"
            )

    if args.xl:
        models = loader.load_sdxl(args.base, dtype=dtype, load_vae=True)
    else:
        models = loader.load_sd(
            args.base, v2=args.v2, clip_skip=args.clip_skip, dtype=dtype, load_vae=True
        )

    weights = None
    fleet_adapters = None
    inferred_scales = list(DEFAULT_SCALES)
    if getattr(args, "compose", None):
        # multi-slider composition (lora/compose.py): each entry is
        # 'ckpt:scale'; the swept "scale" column then acts as a global
        # intensity multiplier on the whole composition (1 = nominal).
        from sliders_tpu.lora.compose import compose_sliders

        if args.model_name or getattr(args, "fleet", None):
            raise SystemExit(
                "--compose conflicts with --model_name/--fleet; fold the "
                "named slider into the composition as another --compose "
                "CKPT:SCALE entry"
            )
        adapters = []
        for entry in args.compose:
            path, _, s = entry.rpartition(":")
            try:
                s = float(s)
            except ValueError:
                path = ""
            if not path:
                raise SystemExit(f"--compose wants CKPT:SCALE, got {entry!r}")
            adapters.append((lora_io.load_slider(path, models.unet_params), s))
        weights = compose_sliders(adapters)
        inferred_scales = [0.0, 1.0]  # base vs composed, unless --scales
    elif getattr(args, "fleet", None):
        # multi-slider fleet sweep: every checkpoint's whole (samples x
        # scales) sweep rides ONE batched denoise via per-row stacked
        # adapters (lora/batch.py — the same machinery the serving engine
        # uses for multi-tenant batching). Sliders share the per-sample
        # initial noise, so rows are directly comparable across sliders.
        if args.model_name:
            raise SystemExit("--fleet and --model_name conflict")
        fleet_adapters = [
            (
                os.path.basename(p).replace(".pt", "").replace(".safetensors", ""),
                lora_io.load_slider(p, models.unet_params),
            )
            for p in args.fleet
        ]
        # the sweep was validated per-checkpoint before model load
        inferred_scales = _infer_scales(args.fleet[0])
    elif args.model_name:
        weights = lora_io.load_slider(args.model_name, models.unet_params)
        inferred_scales = _infer_scales(args.model_name)

    # reference behavior: hspace/last sliders auto-widen the sweep to +-5
    # (generate_images_sd1.py:84-89) unless the user passed --scales
    scales = (
        [float(s) for s in args.scales.split(",")]
        if args.scales is not None
        else inferred_scales
    )

    schedule = make_schedule()
    sampler = make_sampler(schedule, args.scheduler, args.ddim_steps)
    use_cfg = args.guidance_scale > 1.0
    mesh = None
    n_dp = 1
    if args.dp != 1:
        # data-parallel sweep: rows of the (samples x scales) batch spread
        # over the dp mesh axis; the batch is padded up to a dp multiple
        # and the padding sliced off after decode
        from sliders_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(dp=args.dp)
        n_dp = mesh.shape["dp"]
        print(f"data-parallel sweep over {n_dp} devices")
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, use_cfg=use_cfg,
        guidance_rescale=0.7 if args.xl else 0.0, compute_dtype=dtype,
        is_xl=models.is_xl, mesh=mesh,
    )

    if getattr(args, "compose", None):
        # encode the per-adapter scales too: re-running with different scales
        # must land in a different folder, not overwrite the first sweep
        name = "compose_" + "+".join(
            os.path.basename(e.rpartition(":")[0])
            .replace(".pt", "")
            .replace(".safetensors", "")
            + "_" + e.rpartition(":")[2]
            for e in args.compose
        )
    else:
        name = (
            os.path.basename(args.model_name or "base").replace(".pt", "").replace(".safetensors", "")
        )
    if fleet_adapters is not None:
        folder_paths = [os.path.join(args.save_path, n) for n, _ in fleet_adapters]
    else:
        folder_paths = [os.path.join(args.save_path, name)]
    scale_strs = [str(s).replace("0.5", "half").rstrip("0").rstrip(".") if "." in str(s) else str(s) for s in scales]
    scale_strs = [s if s else "0" for s in scale_strs]
    for folder_path in folder_paths:
        os.makedirs(os.path.join(folder_path, "all"), exist_ok=True)
        for s in scale_strs:
            os.makedirs(os.path.join(folder_path, s), exist_ok=True)

    df = pd.read_csv(args.prompts_path)
    n_scales = len(scales)
    scale_vec = jnp.asarray(scales, jnp.float32)

    n_fleet = len(fleet_adapters) if fleet_adapters is not None else 1
    if fleet_adapters is not None:
        # per-row stacked tree, built once (row counts are constant across
        # prompts): slider-major layout [s0 x n_solo, s1 x n_solo, ...];
        # dp-pad rows reuse slider 0 at scale 0 (exact no-op rows)
        from sliders_tpu.lora.batch import stack_sliders

        n_solo = args.num_samples * n_scales
        pad_rows = (-(n_solo * n_fleet)) % n_dp
        weights = stack_sliders(
            [w for _, w in fleet_adapters for _ in range(n_solo)]
            + [fleet_adapters[0][1]] * pad_rows
        )

    for _, row in df.iterrows():
        case = int(row.case_number)
        if not (args.from_case <= case <= args.till_case):
            continue
        prompt = str(row.prompt)
        seed = int(row.evaluation_seed)
        print(prompt, seed)

        cond, uncond, added1 = t2i.encode_conditioning(
            models, prompt, args.negative_prompt or "", args.image_size
        )

        # ALL sliders x ALL samples x ALL scales in ONE batched denoise:
        # layout is slider-major then sample-major
        # [(k0,s0,scale0), (k0,s0,scale1), ..., (k1,s0,scale0), ...];
        # every slider sees the same per-sample initial noise
        n_total = n_fleet * args.num_samples * n_scales
        pad = (-n_total) % n_dp  # dp wants equal rows per device
        lats = jnp.concatenate(
            [
                jnp.tile(
                    t2i.initial_latents(
                        jax.random.key(seed + i * 1000), 1,
                        args.image_size, args.image_size, sampler.init_noise_sigma,
                    ),
                    (n_scales, 1, 1, 1),
                )
                for i in range(args.num_samples)
            ]
        )
        if n_fleet > 1:
            lats = jnp.tile(lats, (n_fleet, 1, 1, 1))
        scale_all = jnp.tile(scale_vec, (n_fleet * args.num_samples,))
        if pad:
            # wrap-index: pad may exceed n_total (e.g. 3 rows on 8 devices)
            lats = jnp.concatenate([lats, lats[jnp.arange(pad) % n_total]])
            scale_all = jnp.concatenate([scale_all, jnp.zeros((pad,), scale_all.dtype)])
        cond_b, uncond_b, added_b = t2i.tile_conditioning(
            cond, uncond, added1, n_total + pad
        )
        x = fn(
            models.unet_params, lats, cond_b, uncond_b, weights,
            scale_all, jnp.asarray(float(args.start_noise)),
            jnp.asarray(float(args.guidance_scale)), jax.random.key(seed),
            added_b,
        )[:n_total]
        imgs = np.asarray(t2i.decode_images(models.vae_params, models.vae_config, x))
        for k, folder_path in enumerate(folder_paths):
            base_row = k * args.num_samples * n_scales
            for i in range(args.num_samples):
                pil = [
                    Image.fromarray(imgs[base_row + i * n_scales + j])
                    for j in range(n_scales)
                ]
                for s_str, im in zip(scale_strs, pil):
                    im.save(os.path.join(folder_path, s_str, f"{case}_{i}.png"))
                grid = Image.new("RGB", (imgs.shape[2] * n_scales, imgs.shape[1]))
                for j, im in enumerate(pil):
                    grid.paste(im, (j * imgs.shape[2], 0))
                grid.save(os.path.join(folder_path, "all", f"{case}_{i}.png"))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default=None, help="slider checkpoint (.pt/.safetensors); omit for base model")
    p.add_argument(
        "--compose", action="append", default=None, metavar="CKPT:SCALE",
        help="compose multiple sliders (repeatable): each checkpoint at its "
        "own signed scale, swept scales multiply the whole composition "
        "(default sweep 0,1 = base vs composed)",
    )
    p.add_argument(
        "--fleet", action="append", default=None, metavar="CKPT",
        help="evaluate multiple sliders in one run (repeatable): every "
        "checkpoint's (samples x scales) sweep rides one batched denoise "
        "via per-row stacked adapters; outputs land in one folder per "
        "slider. Sliders share per-sample noise, so rows are comparable.",
    )
    p.add_argument(
        "--dp", type=int, default=1,
        help="data-parallel devices for the sweep batch (-1 = all devices; "
        "1 disables)",
    )
    p.add_argument("--prompts_path", required=True, help="csv with case_number,prompt,evaluation_seed")
    p.add_argument("--save_path", required=True)
    p.add_argument("--base", required=True, help="local model snapshot dir")
    p.add_argument("--negative_prompt", default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1000000)
    p.add_argument("--start_noise", type=int, default=750)
    p.add_argument(
        "--scales", type=str, default=None,
        help="comma-separated sweep; default [-2..2], auto-widened to +-5 for hspace/last sliders",
    )
    p.add_argument("--scheduler", type=str, default="ddim", choices=["ddim", "ddpm", "lms", "euler_a"])
    p.add_argument("--precision", type=str, default="bfloat16")
    p.add_argument("--xl", action="store_true")
    p.add_argument("--v2", action="store_true", help="SD2.x base model")
    p.add_argument("--clip_skip", type=int, default=None)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
