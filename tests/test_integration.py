"""End-to-end slice: local snapshot -> load -> train text slider -> save ->
reload -> sample with the trained slider (the §7.2 milestone path), plus
checkpoint/resume determinism."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.core.config import RootConfig
from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import io as lora_io
from sliders_tpu.models import loader
from sliders_tpu.pipelines import text2image as t2i
from sliders_tpu.prompts import load_prompts_from_yaml
from sliders_tpu.training.driver import train_text_sliders

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    return make_tiny_snapshot(str(tmp_path_factory.mktemp("sd_tiny")))


@pytest.fixture(scope="module")
def run_cfg(snapshot, tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    prompts_file = out / "prompts.yaml"
    prompts_file.write_text(
        "- target: person\n  positive: old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 2\n"
        "  resolution: 64\n  batch_size: 1\n"
    )
    cfg = RootConfig(
        **{
            "prompts_file": str(prompts_file),
            "pretrained_model": {"name_or_path": snapshot},
            "network": {"rank": 2, "alpha": 1.0, "training_method": "noxattn"},
            "train": {
                "precision": "float32",
                "noise_scheduler": "ddim",
                "iterations": 6,
                "lr": 1e-3,
                "optimizer": "adamw",
                "lr_scheduler": "constant",
                "max_denoising_steps": 5,
            },
            "save": {"name": "tiny_slider", "path": str(out), "per_steps": 3},
            "logging": {"verbose": False, "log_every": 2},
            "tpu": {"remat": False, "donate": False, "state_checkpoint_every": 2},
        }
    )
    return cfg, out


def test_load_models(snapshot):
    m = loader.load_sd(snapshot, dtype=jnp.float32, load_vae=True)
    assert not m.is_xl
    assert m.unet_config.block_out_channels == (32, 64)
    assert m.vae_params is not None
    te = m.text_encoders[0]
    emb = te.tokenizer(["old person"])
    # tokenizer length follows the encoder's positions (77 for real CLIP)
    assert emb.shape == (1, te.config.max_positions)


def test_train_save_reload_sample(run_cfg, snapshot):
    cfg, out = run_cfg
    models = loader.load_sd(snapshot, dtype=jnp.float32)
    prompts = load_prompts_from_yaml(cfg.prompts_file)
    final = train_text_sliders(cfg, prompts, models, seed=0)

    # periodic + final + metadata + trainstate artifacts exist
    assert (out / "tiny_slider_3steps.safetensors").exists()
    assert (out / "tiny_slider_last.safetensors").exists()
    assert (out / "tiny_slider_metadata.json").exists()
    assert (out / "tiny_slider_trainstate.msgpack").exists()
    meta = json.loads((out / "tiny_slider_metadata.json").read_text())
    assert meta["config"]["network"]["rank"] == 2

    # reload the slider and run a gated sweep
    weights = lora_io.load_slider(str(out / "tiny_slider_last.safetensors"), models.unet_params)
    assert set(weights) == set(final)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 4)
    fn = t2i.make_sampling_fn(models.unet_config, sampler, compute_dtype=jnp.float32)
    te = models.text_encoders[0]
    from sliders_tpu.pipelines.encoding import encode_prompts

    cond = encode_prompts(te.tokenizer, te.params, te.config, ["person"])
    uncond = encode_prompts(te.tokenizer, te.params, te.config, [""])
    lats = t2i.initial_latents(jax.random.key(0), 1, 64, 64, sampler.init_noise_sigma)
    outs = {}
    for scale in (-1.0, 0.0, 1.0):
        outs[scale] = fn(
            models.unet_params, lats, cond, uncond, weights,
            jnp.asarray(scale), jnp.asarray(1000.0), jnp.asarray(7.5),
            jax.random.key(1),
        )
    assert np.isfinite(np.asarray(outs[1.0])).all()
    # trained slider moves the output in scale-dependent directions
    assert np.abs(np.asarray(outs[1.0]) - np.asarray(outs[0.0])).max() > 1e-6
    assert np.abs(np.asarray(outs[-1.0]) - np.asarray(outs[1.0])).max() > 1e-6


def test_resume_determinism(run_cfg, snapshot, tmp_path):
    """Training 6 steps straight == training 2, resuming from the state
    checkpoint, and finishing — byte-identical LoRA (the resumability the
    reference lacks, SURVEY.md §5.3/5.4)."""
    cfg, out = run_cfg
    models = loader.load_sd(snapshot, dtype=jnp.float32)
    prompts = load_prompts_from_yaml(cfg.prompts_file)

    cfg_a = cfg.model_copy(deep=True)
    cfg_a.save.path = str(tmp_path / "a")
    cfg_a.save.name = "full"
    full = train_text_sliders(cfg_a, prompts, models, seed=7)

    cfg_b = cfg.model_copy(deep=True)
    cfg_b.save.path = str(tmp_path / "b")
    cfg_b.save.name = "part"
    cfg_b.train.iterations = 3  # runs steps 0..2, checkpoints at step 2
    train_text_sliders(cfg_b, prompts, models, seed=7)
    ckpt = str(tmp_path / "b" / "part_trainstate.msgpack")
    assert os.path.exists(ckpt)

    cfg_c = cfg.model_copy(deep=True)
    cfg_c.save.path = str(tmp_path / "c")
    cfg_c.save.name = "resumed"
    resumed = train_text_sliders(cfg_c, prompts, models, seed=7, resume_from=ckpt)

    for m in full:
        np.testing.assert_allclose(
            np.asarray(full[m]["up"]), np.asarray(resumed[m]["up"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(full[m]["down"]), np.asarray(resumed[m]["down"]), atol=1e-6
        )
