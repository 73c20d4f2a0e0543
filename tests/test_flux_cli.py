"""End-to-end FLUX slider training CLI on the tiny hermetic snapshot
(reconstructed trainer per SURVEY §2.3 — the reference ships no FLUX train
script, only the notebook flow). Exercises the T5 fast tokenizer path
(no sentencepiece) and chunked dispatch with an uneven tail."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from helpers import make_tiny_flux_snapshot

pytestmark = pytest.mark.slow


def test_train_flux_cli_e2e(tmp_path):
    from sliders_tpu.cli.train_flux_slider import build_parser, main

    snap = make_tiny_flux_snapshot(str(tmp_path / "flux_tiny"))
    prompts = tmp_path / "prompts.yaml"
    prompts.write_text(
        "- target: person\n  positive: very old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 1\n"
        "  resolution: 64\n  batch_size: 1\n"
    )
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"""
prompts_file: "{prompts}"
pretrained_model:
  name_or_path: "{snap}"
network:
  type: lierla
  rank: 2
  alpha: 1.0
  training_method: xattn
train:
  precision: float32
  iterations: 5
  lr: 0.0002
  optimizer: adamw
  lr_scheduler: constant
  max_denoising_steps: 3
save:
  name: flux_tiny_slider
  path: "{tmp_path / 'out'}"
  per_steps: 2
tpu:
  remat: false
  steps_per_call: 2
"""
    )
    args = build_parser().parse_args(
        ["--config_file", str(cfg), "--t5_len", "16", "--seed", "1"]
    )
    main(args)

    out = tmp_path / "out" / "flux_tiny_slider_alpha1.0_rank2_xattn"
    last = out / "flux_tiny_slider_alpha1.0_rank2_xattn_last.safetensors"
    periodic = out / "flux_tiny_slider_alpha1.0_rank2_xattn_2steps.safetensors"
    meta = out / "flux_tiny_slider_alpha1.0_rank2_xattn_metadata.json"
    assert last.exists() and meta.exists()
    # step 2 falls inside the second (tail) chunk and must still save
    assert periodic.exists()
    md = json.loads(meta.read_text())
    assert md["config"]["network"]["rank"] == 2

    from safetensors.numpy import load_file

    state = load_file(str(last))
    downs = [k for k in state if k.endswith("lora_down.weight")]
    assert downs and all(np.isfinite(v).all() for v in state.values())
