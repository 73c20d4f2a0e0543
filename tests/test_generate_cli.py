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
