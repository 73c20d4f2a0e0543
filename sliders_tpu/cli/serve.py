"""Serve sliders over HTTP: warm compiled sampler + hot-swappable LoRAs.

No reference equivalent (its inference surface is batch scripts/notebooks;
the gradio demo lives in a separate HF space repo). See
sliders_tpu/serving/server.py for the API and the TPU-first design notes.

  python -m sliders_tpu.cli.serve --base /path/sd15 \
      --slider age=out/age_last.safetensors --port 8000
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/generate -d \
      '{"prompt": "photo of a person", "slider": "age", "scales": [-2,0,2]}'
"""

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="local model snapshot dir")
    p.add_argument("--xl", action="store_true")
    p.add_argument("--flux", action="store_true",
                   help="serve a FLUX snapshot (flow matching, guidance "
                   "embedding, step-index slider gate)")
    p.add_argument("--v2", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=None,
                   help="denoise steps (default 50; 30 for --flux)")
    p.add_argument("--scheduler", default="ddim", choices=["ddim", "ddpm", "lms", "euler_a"])
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="CFG scale (default 7.5; guidance-embed value 3.5 "
                   "for --flux)")
    p.add_argument("--start_noise", type=float, default=750.0)
    p.add_argument("--skip_till", type=float, default=-1.0,
                   help="FLUX slider gate: LoRA active when step > this")
    p.add_argument("--pp", type=int, default=1,
                   help="FLUX pipeline-parallel stages (layer-sharded "
                   "MMDiT; capacity path for full flux-dev)")
    p.add_argument("--precision", default="bfloat16")
    p.add_argument(
        "--slider", action="append", default=[], metavar="NAME=CKPT",
        help="preload a slider checkpoint under NAME (repeatable)",
    )
    p.add_argument("--no_warmup", action="store_true", help="skip compile warmup")
    p.add_argument(
        "--warmup_multi", action="store_true",
        help="also pre-compile the cross-slider (stacked-adapter) batch "
        "program so the first coalesced mixed batch doesn't stall on it",
    )
    p.add_argument(
        "--buckets", default=None, metavar="N,N,...",
        help="batch bucket sizes (each compiles one program; requests pad "
        "up to the next bucket). Default 1,2,4,8,16; a deployment that "
        "always sweeps 5 scales should pin --buckets 5",
    )
    p.add_argument(
        "--dp", type=int, default=1,
        help="data-parallel devices for batched denoises (-1 = all devices; "
        "1 disables) — request rows shard over the dp mesh axis",
    )
    p.add_argument(
        "--continuous", action="store_true",
        help="step-level continuous batching: keep one fixed row bucket "
        "permanently in flight, requests join mid-denoise at chunk "
        "boundaries and exit when their steps complete (best for "
        "sustained overlapping traffic; SD/XL only, deterministic "
        "samplers only, incompatible with --dp)",
    )
    p.add_argument(
        "--cont_rows", type=int, default=None,
        help="continuous-mode row bucket (default: largest --buckets "
        "entry); every request's scale sweep must fit in it",
    )
    p.add_argument(
        "--chunk_steps", type=int, default=5,
        help="continuous-mode denoise steps per device call (admission "
        "granularity; smaller = lower join latency, more dispatches)",
    )
    return p


def main(args):
    import jax.numpy as jnp

    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import SliderEngine, make_http_server

    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32
    if args.flux:
        models = loader.load_flux(args.base, dtype=dtype, load_vae=True)
    elif args.xl:
        models = loader.load_sdxl(args.base, dtype=dtype, load_vae=True)
    else:
        models = loader.load_sd(args.base, v2=args.v2, dtype=dtype, load_vae=True)

    buckets = None
    if args.buckets is not None:
        try:
            buckets = tuple(int(b) for b in args.buckets.split(","))
        except ValueError:
            raise SystemExit(
                f"--buckets wants comma-separated ints (e.g. 5 or 4,8), "
                f"got {args.buckets!r}"
            )
        if not buckets or any(b < 1 for b in buckets):
            raise SystemExit(
                f"--buckets wants positive batch sizes, got {args.buckets!r}"
            )

    if args.flux:
        if args.continuous:
            raise SystemExit(
                "--continuous is SD/XL only (the FLUX engine batches at "
                "request boundaries)"
            )
        from sliders_tpu.serving.server import FluxSliderEngine

        mesh = None
        if args.pp > 1:
            from sliders_tpu.parallel import mesh as pmesh

            mesh = pmesh.make_mesh(dp=1, tp=1, pp=args.pp)
            print(f"serving pipeline-parallel over {args.pp} stages")
        engine = FluxSliderEngine(
            models,
            steps=30 if args.ddim_steps is None else args.ddim_steps,
            image_size=args.image_size,
            guidance_scale=(
                3.5 if args.guidance_scale is None else args.guidance_scale
            ),
            skip_till=args.skip_till,
            compute_dtype=dtype,
            mesh=mesh,
            buckets=buckets,
        )
    else:
        mesh = None
        if args.dp != 1:
            from sliders_tpu.parallel import mesh as pmesh

            mesh = pmesh.make_mesh(dp=args.dp)
            print(f"serving data-parallel over {mesh.shape['dp']} devices")
        engine = SliderEngine(
            models,
            scheduler=args.scheduler,
            steps=50 if args.ddim_steps is None else args.ddim_steps,
            image_size=args.image_size,
            guidance_scale=(
                7.5 if args.guidance_scale is None else args.guidance_scale
            ),
            start_noise=args.start_noise,
            compute_dtype=dtype,
            mesh=mesh,
            buckets=buckets,
            continuous=args.continuous,
            continuous_rows=args.cont_rows,
            chunk_steps=args.chunk_steps,
        )
    for spec in args.slider:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--slider wants NAME=CKPT, got {spec!r}")
        engine.load_slider(name, path)
        print(f"loaded slider {name!r} from {path}")

    if not args.no_warmup:
        print("warmup compile...")
        engine.warmup(
            with_slider=next(iter(engine.sliders), None),
            multi_tenant=args.warmup_multi and bool(engine.sliders),
        )
        print("warm.")

    server = make_http_server(engine, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        engine.close()


if __name__ == "__main__":
    main(build_parser().parse_args())
