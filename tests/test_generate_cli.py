"""End-to-end sweep generation CLI on the tiny snapshot + scoring layout."""

import os
import sys

import numpy as np
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    return make_tiny_snapshot(str(tmp_path_factory.mktemp("sd_tiny_gen")))


def test_generate_images_cli(snapshot, tmp_path):
    import pandas as pd

    csv = tmp_path / "prompts.csv"
    pd.DataFrame(
        {
            "case_number": [0, 1],
            "prompt": ["old person", "photo"],
            "evaluation_seed": [11, 22],
        }
    ).to_csv(csv, index=False)

    from sliders_tpu.cli.generate_images import build_parser, main

    out = tmp_path / "runs"
    args = build_parser().parse_args(
        [
            "--base", snapshot,
            "--prompts_path", str(csv),
            "--save_path", str(out),
            "--scales=-1,0,1",
            "--ddim_steps", "3",
            "--image_size", "64",
            "--guidance_scale", "7.5",
            "--precision", "float32",
            "--num_samples", "2",
        ]
    )
    main(args)

    run_dir = out / "base"
    for scale in ("-1", "0", "1", "all"):
        assert (run_dir / scale).is_dir(), scale
        files = os.listdir(run_dir / scale)
        assert {"0_0.png", "0_1.png", "1_0.png", "1_1.png"} <= set(files)

    # images decode and differ across prompts
    from PIL import Image

    a = np.asarray(Image.open(run_dir / "0" / "0_0.png"))
    b = np.asarray(Image.open(run_dir / "0" / "1_0.png"))
    # tiny VAE has 2 blocks -> x2 upsampling of the 8x8 latents (real SD
    # VAEs are x8, giving image_size-sized outputs)
    assert a.shape == (16, 16, 3)
    assert (a != b).any()

    # the sweep layout feeds the scorers (random CLIP weights)
    import jax

    from sliders_tpu.evals.scoring import clip_scores
    from sliders_tpu.models import clip_text, clip_vision

    v_cfg = clip_vision.TINY_VISION
    t_cfg = clip_text.TINY
    cparams = clip_vision.init_params(jax.random.key(0), v_cfg, t_cfg)

    class FakeTok:
        def __call__(self, prompts):
            ids = np.full((len(prompts), 16), 99, np.int32)
            ids[:, 0] = 98
            return ids

    df = clip_scores(str(run_dir), "old person", str(csv), cparams, v_cfg, t_cfg, FakeTok())
    assert {"clip_-1", "clip_0", "clip_1"} <= set(df.columns)
    assert df["clip_0"].notna().all()


def test_generate_images_cli_compose(snapshot, tmp_path):
    """--compose CKPT:SCALE (repeatable): sweep gates the whole composition.

    Output must match the single-slider path run with the pre-composed
    adapter — and the composed run's scale-1 images must differ from scale-0
    (the sliders actually engage through the CLI plumbing)."""
    import pandas as pd
    import jax
    import jax.numpy as jnp

    from sliders_tpu.cli.generate_images import build_parser, main
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader

    models = loader.load_sd(snapshot, dtype=jnp.float32)
    paths = []
    for i, (rank, method) in enumerate([(4, "noxattn"), (2, "selfattn")]):
        w = lnet.create_slider_network(
            jax.random.key(10 + i), models.unet_params, rank=rank,
            train_method=method,
        )
        w = {m: {**e, "up": e["up"] + 0.3} for m, e in w.items()}
        p = str(tmp_path / f"slider{i}.safetensors")
        lora_io.save_slider(p, w)
        paths.append(p)

    csv = tmp_path / "prompts.csv"
    pd.DataFrame(
        {"case_number": [0], "prompt": ["photo"], "evaluation_seed": [7]}
    ).to_csv(csv, index=False)

    out = tmp_path / "runs"
    args = build_parser().parse_args(
        [
            "--base", snapshot,
            "--prompts_path", str(csv),
            "--save_path", str(out),
            "--compose", f"{paths[0]}:1.5",
            "--compose", f"{paths[1]}:-0.5",
            "--ddim_steps", "3",
            "--image_size", "64",
            "--precision", "float32",
            "--start_noise", "1000",
        ]
    )
    main(args)

    run_dir = out / "compose_slider0_1.5+slider1_-0.5"
    from PIL import Image

    base_img = np.asarray(Image.open(run_dir / "0" / "0_0.png"))
    comp_img = np.asarray(Image.open(run_dir / "1" / "0_0.png"))
    assert (base_img != comp_img).any()


def test_generate_images_cli_fleet(snapshot, tmp_path):
    """--fleet CKPT (repeatable): K sliders' sweeps in one batched denoise
    via per-row stacked adapters (mixed ranks allowed). Per-slider outputs
    must match each slider's SOLO run with the same seeds to decode
    precision (stacked einsum/grouped-conv vs solo matmul/conv differ by a
    few ULP before uint8 quantization)."""
    import pandas as pd
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sliders_tpu.cli.generate_images import build_parser, main
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader

    models = loader.load_sd(snapshot, dtype=jnp.float32)
    paths = []
    for i, rank in enumerate([4, 2]):  # mixed ranks: the stacker rank-pads
        w = lnet.create_slider_network(
            jax.random.key(30 + i), models.unet_params, rank=rank,
            train_method="noxattn",
        )
        w = {m: {**e, "up": e["up"] + (0.25 if i == 0 else -0.4)} for m, e in w.items()}
        p = str(tmp_path / f"fslider{i}.safetensors")
        lora_io.save_slider(p, w)
        paths.append(p)

    csv = tmp_path / "prompts.csv"
    pd.DataFrame(
        {"case_number": [0], "prompt": ["photo"], "evaluation_seed": [7]}
    ).to_csv(csv, index=False)

    common = [
        "--base", snapshot,
        "--prompts_path", str(csv),
        "--scales=-1,0,1",
        "--ddim_steps", "3",
        "--image_size", "64",
        "--precision", "float32",
        "--start_noise", "1000",
    ]
    for k, p in enumerate(paths):
        main(build_parser().parse_args(
            common + ["--save_path", str(tmp_path / "solo"), "--model_name", p]
        ))
    main(build_parser().parse_args(
        common + ["--save_path", str(tmp_path / "fleet"),
                  "--fleet", paths[0], "--fleet", paths[1]]
    ))

    for k in range(2):
        for scale in ("-1", "0", "1"):
            solo = np.asarray(
                Image.open(tmp_path / "solo" / f"fslider{k}" / scale / "0_0.png")
            ).astype(np.int16)
            fleet = np.asarray(
                Image.open(tmp_path / "fleet" / f"fslider{k}" / scale / "0_0.png")
            ).astype(np.int16)
            assert np.abs(solo - fleet).max() <= 1, (k, scale)
    # the two sliders actually produce different images at scale 1
    a = np.asarray(Image.open(tmp_path / "fleet" / "fslider0" / "1" / "0_0.png"))
    b = np.asarray(Image.open(tmp_path / "fleet" / "fslider1" / "1" / "0_0.png"))
    assert (a != b).any()
