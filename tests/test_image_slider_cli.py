"""End-to-end image-slider CLI on the tiny snapshot with paired folders."""

import os

import numpy as np
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


def test_train_image_slider_cli(tmp_path):
    from PIL import Image

    snap = make_tiny_snapshot(str(tmp_path / "snap"))

    # paired before/after folders (same filenames, different brightness)
    data = tmp_path / "eyesize"
    for folder, val in (("small", 60), ("big", 200)):
        os.makedirs(data / folder)
        rng = np.random.default_rng(0)
        for name in ("a.png", "b.png"):
            arr = (rng.random((48, 48, 3)) * 40 + val).astype(np.uint8)
            Image.fromarray(arr).save(data / folder / name)

    prompts = tmp_path / "prompts.yaml"
    prompts.write_text(
        "- target: ''\n  positive: ''\n  unconditional: ''\n  neutral: ''\n"
        "  guidance_scale: 1\n  resolution: 48\n"
    )
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"""
prompts_file: {prompts}
pretrained_model:
  name_or_path: {snap}
network:
  rank: 2
  training_method: noxattn
train:
  precision: float32
  iterations: 3
  lr: 0.001
  max_denoising_steps: 5
save:
  name: eyesize
  path: {tmp_path}/out
  per_steps: 100
tpu:
  remat: false
  donate: false
"""
    )

    from sliders_tpu.cli.train_image_slider import build_parser, main

    args = build_parser().parse_args(
        [
            "--config_file", str(cfg),
            "--folder_main", str(data),
            "--folders", "small, big",
            "--scales=-1, 1",
            "--resolution", "48",
        ]
    )
    main(args)

    out = tmp_path / "out" / "eyesize_alpha1.0_rank2_noxattn"
    files = os.listdir(out)
    assert any(f.endswith("_last.safetensors") for f in files), files
