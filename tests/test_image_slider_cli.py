"""End-to-end image-slider CLI on the tiny snapshot with paired folders."""

import os

import numpy as np
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


def _setup(tmp_path, steps_per_call=1, iterations=3, per_steps=100):
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
  iterations: {iterations}
  lr: 0.001
  max_denoising_steps: 5
save:
  name: eyesize
  path: {tmp_path}/out
  per_steps: {per_steps}
tpu:
  remat: false
  donate: false
  steps_per_call: {steps_per_call}
"""
    )

    from sliders_tpu.cli.train_image_slider import build_parser

    return build_parser().parse_args(
        [
            "--config_file", str(cfg),
            "--folder_main", str(data),
            "--folders", "small, big",
            "--scales=-1, 1",
            "--resolution", "48",
        ]
    )


def test_train_image_slider_cli(tmp_path):
    from sliders_tpu.cli.train_image_slider import main

    main(_setup(tmp_path))
    out = tmp_path / "out" / "eyesize_alpha1.0_rank2_noxattn"
    files = os.listdir(out)
    assert any(f.endswith("_last.safetensors") for f in files), files


def test_train_image_slider_cli_per_steps_zero(tmp_path):
    """save.per_steps: 0 disables periodic saves (no ZeroDivisionError in
    the chunk-alignment / save-cadence arithmetic); only _last is written."""
    from sliders_tpu.cli.train_image_slider import main

    main(_setup(tmp_path, steps_per_call=2, iterations=3, per_steps=0))
    out = tmp_path / "out" / "eyesize_alpha1.0_rank2_noxattn"
    files = os.listdir(out)
    assert any(f.endswith("_last.safetensors") for f in files), files
    assert not any("steps.safetensors" in f for f in files), files


def test_train_image_slider_cli_chunked_matches_unchunked(tmp_path):
    """tpu.steps_per_call scans stacked per-iteration batches — the SAME
    image pairs in the same order as the unchunked run (host_rng draws are
    call-for-call identical), so the final weights must match."""
    from safetensors.numpy import load_file

    from sliders_tpu.cli.train_image_slider import main

    main(_setup(tmp_path / "c1", steps_per_call=1, iterations=5))
    main(_setup(tmp_path / "c3", steps_per_call=3, iterations=5))
    w1 = load_file(
        tmp_path / "c1" / "out" / "eyesize_alpha1.0_rank2_noxattn" / "eyesize_alpha1.0_rank2_noxattn_last.safetensors"
    )
    w3 = load_file(
        tmp_path / "c3" / "out" / "eyesize_alpha1.0_rank2_noxattn" / "eyesize_alpha1.0_rank2_noxattn_last.safetensors"
    )
    assert set(w1) == set(w3)
    for k in w1:
        np.testing.assert_allclose(w3[k], w1[k], atol=1e-5, err_msg=k)


def test_train_image_slider_cli_stylecheck_fleet(tmp_path):
    """--stylecheck --fleet trains one slider per style folder CONCURRENTLY
    (training/fleet.make_fleet_image_step) and writes every style's solo
    artifact set."""
    from PIL import Image

    snap = make_tiny_snapshot(str(tmp_path / "snap"))
    styles = tmp_path / "styles"
    rng = np.random.default_rng(0)
    for style, base in (("style1", 50), ("style2", 150)):
        for folder, off in (("small", 0), ("big", 60)):
            d = styles / style / folder
            os.makedirs(d)
            for name in ("a.png", "b.png"):
                arr = (rng.random((48, 48, 3)) * 30 + base + off).astype(np.uint8)
                Image.fromarray(arr).save(d / name)

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
  iterations: 4
  lr: 0.001
  max_denoising_steps: 5
save:
  name: size
  path: {tmp_path}/out
  per_steps: 2
tpu:
  remat: false
  donate: false
  steps_per_call: 2
"""
    )

    from sliders_tpu.cli.train_image_slider import build_parser, main

    main(build_parser().parse_args(
        [
            "--config_file", str(cfg),
            "--folder_main", str(styles),
            "--folders", "small, big",
            "--scales=-1, 1",
            "--resolution", "48",
            "--stylecheck", "yes",
            "--fleet",
        ]
    ))

    out = tmp_path / "out" / "size_alpha1.0_rank2_noxattn"
    from safetensors.numpy import load_file

    ws = []
    for style in ("style1", "style2"):
        f = out / f"{style}_size_alpha1.0_rank2_noxattn_last.safetensors"
        assert f.exists(), os.listdir(out)
        ws.append(load_file(f))
    assert set(ws[0]) == set(ws[1])
    # different style data -> different adapters
    assert any((ws[0][k] != ws[1][k]).any() for k in ws[0])
