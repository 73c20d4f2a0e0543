"""Real-weight validation runbook: ONE command to run the moment real model
snapshots appear (VERDICT r3 item 8 — this environment has no HF hub, so
the four real-weight gates in tests/test_real_weights.py skip; this script
is the documented path from "snapshots on disk" to "parity validated").

    python -m sliders_tpu.cli.validate_real_weights \
        --sd15 /root/models/sd15 \
        [--ckpt /root/models/sd15.safetensors] \
        [--clip /root/models/clip-vit-base-patch32] \
        [--alexnet /root/models/alexnet.pth --lpips_lins /root/models/lpips_alex_lins.pth] \
        [--slider out/age_last.safetensors] \
        --out /tmp/realweight_validation

Steps (each prints PASS/RECORDED/SKIP and the script exits nonzero on any
failure):
  1. load + convert the snapshot; pin the structural param count
  2. eps golden: record on first run, compare on later runs
     (utils/goldens.py; golden lives at tests/goldens/sd15_eps_golden.npz)
  3. single-file checkpoint vs snapshot cross-check (--ckpt)
  4. CLIP scorer red/blue sanity on real ViT-B/32 (--clip)
  5. LPIPS monotone-perturbation sanity on real weights (--alexnet/...)
  6. 50-step 512px sampling sweep (scales -2..2 with --slider, else scale
     0) saved under --out — eyeball these, then run the reference protocol
     (cli/generate_images + cli/clip_score + cli/lpips_score) for the
     BASELINE.json CLIP/LPIPS parity row.

The same gates also light up as pytest tests once env vars point at the
snapshots (tests/test_real_weights.py header).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sd15", required=True, help="diffusers-layout SD snapshot dir")
    p.add_argument("--xl", action="store_true", help="snapshot is SDXL")
    p.add_argument("--ckpt", default=None, help="single-file .ckpt/.safetensors of the same model")
    p.add_argument("--clip", default=None, help="openai/clip-vit-base-patch32 snapshot dir")
    p.add_argument("--alexnet", default=None, help="torchvision alexnet state_dict .pth")
    p.add_argument("--lpips_lins", default=None, help="lpips package alex.pth lin weights")
    p.add_argument("--slider", default=None, help="trained slider checkpoint for the sweep")
    p.add_argument("--golden", default=None, help="eps golden path (default tests/goldens/...)")
    p.add_argument("--out", default="/tmp/realweight_validation")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--precision", default="float32")
    return p


def main(args) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sliders_tpu.models import loader
    from sliders_tpu.utils.goldens import record_or_compare_eps_golden

    os.makedirs(args.out, exist_ok=True)
    dtype = jnp.bfloat16 if args.precision in ("bf16", "bfloat16") else jnp.float32
    results = {}
    failed = []

    def report(step, status, detail=""):
        results[step] = {"status": status, "detail": detail}
        print(f"[{step}] {status} {detail}".rstrip(), flush=True)
        if status == "FAIL":
            failed.append(step)

    # 1. load + structural pin ------------------------------------------------
    try:
        load = loader.load_sdxl if args.xl else loader.load_sd
        m = load(args.sd15, dtype=dtype, load_vae=True)
        n_params = sum(int(np.size(x)) for x in jax.tree.leaves(m.unet_params))
        report("load", "PASS", f"unet params: {n_params:,}")
    except Exception as e:
        report("load", "FAIL", repr(e))
        print(json.dumps(results))
        return 1

    # 2. eps golden -----------------------------------------------------------
    golden = args.golden or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "tests", "goldens",
        "sdxl_eps_golden.npz" if args.xl else "sd15_eps_golden.npz",
    )
    try:
        status = record_or_compare_eps_golden(m, golden)
        report("eps_golden", status.upper(), golden)
    except Exception as e:
        report("eps_golden", "FAIL", repr(e))

    # 3. single-file cross-check ----------------------------------------------
    if args.ckpt:
        try:
            from sliders_tpu.models import unet2d
            from sliders_tpu.utils.goldens import fixed_unet_probe

            m2 = loader.load_sd(args.ckpt, dtype=dtype, tokenizer_dir=args.sd15)
            x, t, ehs = fixed_unet_probe(m.unet_config)
            a = np.asarray(unet2d.apply(m.unet_params, m.unet_config, x, t, ehs))
            b = np.asarray(unet2d.apply(m2.unet_params, m2.unet_config, x, t, ehs))
            np.testing.assert_allclose(a, b, atol=1e-4)
            report("single_file", "PASS")
        except Exception as e:
            report("single_file", "FAIL", repr(e))
    else:
        report("single_file", "SKIP", "no --ckpt")

    # 4. CLIP sanity ------------------------------------------------------------
    if args.clip:
        try:
            from sliders_tpu.models.clip_vision import (
                clip_logits_per_image, load_clip_model, preprocess_images,
            )

            params, vcfg, tcfg, tok = load_clip_model(args.clip)
            probe = np.zeros((2, 224, 224, 3), np.float32)
            probe[0, ..., 0] = 255.0
            probe[1, ..., 2] = 255.0
            logits = np.asarray(clip_logits_per_image(
                params, preprocess_images(jnp.asarray(probe)),
                jnp.asarray(tok(["a red photo"])), vcfg, tcfg,
            ))
            assert logits[0, 0] > logits[1, 0], logits
            report("clip", "PASS", f"red {logits[0,0]:.2f} > blue {logits[1,0]:.2f}")
        except Exception as e:
            report("clip", "FAIL", repr(e))
    else:
        report("clip", "SKIP", "no --clip")

    # 5. LPIPS sanity -----------------------------------------------------------
    if args.alexnet and args.lpips_lins:
        try:
            from sliders_tpu.evals.lpips import load_torch_weights, lpips_distance

            lp = load_torch_weights(args.alexnet, args.lpips_lins)
            rng = np.random.default_rng(0)
            x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
            d0 = float(lpips_distance(lp, x, x)[0])
            d1 = float(lpips_distance(lp, x, np.clip(x + 0.1 * rng.normal(size=x.shape), -1, 1).astype(np.float32))[0])
            d2 = float(lpips_distance(lp, x, np.clip(x + 0.5 * rng.normal(size=x.shape), -1, 1).astype(np.float32))[0])
            assert d0 < 1e-5 and d0 < d1 < d2, (d0, d1, d2)
            report("lpips", "PASS", f"0 < {d1:.4f} < {d2:.4f}")
        except Exception as e:
            report("lpips", "FAIL", repr(e))
    else:
        report("lpips", "SKIP", "no --alexnet/--lpips_lins")

    # 6. sampling sweep ----------------------------------------------------------
    try:
        from PIL import Image

        from sliders_tpu.diffusion import make_sampler, make_schedule
        from sliders_tpu.pipelines import text2image as t2i

        sampler = make_sampler(make_schedule(), "ddim", num_steps=args.steps)
        fn = t2i.make_sampling_fn(
            m.unet_config, sampler, compute_dtype=dtype, is_xl=args.xl,
            guidance_rescale=0.7 if args.xl else 0.0,
        )
        weights, scales = None, [0.0]
        if args.slider:
            from sliders_tpu.lora import io as lora_io

            weights = lora_io.load_slider(args.slider, m.unet_params)
            scales = [-2.0, -1.0, 0.0, 1.0, 2.0]
        cond, uncond, added = t2i.encode_conditioning(
            m, "photo of a person", "", args.image_size
        )
        B = len(scales)
        cond, uncond, added = t2i.tile_conditioning(cond, uncond, added, B)
        lats = t2i.initial_latents(
            jax.random.key(42), B, args.image_size, args.image_size,
            sampler.init_noise_sigma,
        )
        t0 = time.time()
        x = fn(
            m.unet_params, lats, cond, uncond, weights,
            jnp.asarray(scales, jnp.float32), jnp.full((B,), 750.0),
            jnp.full((B,), 7.5), jax.random.key(0), added,
        )
        imgs = np.asarray(t2i.decode_images(m.vae_params, m.vae_config, x))
        dt = time.time() - t0
        for s, img in zip(scales, imgs):
            Image.fromarray(img).save(os.path.join(args.out, f"sweep_{s:+.1f}.png"))
        report("sweep", "PASS", f"{B} images in {dt:.1f}s -> {args.out}")
    except Exception as e:
        report("sweep", "FAIL", repr(e))

    with open(os.path.join(args.out, "validation.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"failed": failed, "out": args.out}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(build_parser().parse_args()))
