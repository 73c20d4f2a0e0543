"""End-to-end SDXL slice: tiny XL snapshot -> dual-encoder load -> XL slider
training via the driver -> gated XL sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.core.config import RootConfig
from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import io as lora_io
from sliders_tpu.models import loader
from sliders_tpu.pipelines import text2image as t2i
from sliders_tpu.pipelines.encoding import encode_prompts_xl
from sliders_tpu.prompts import load_prompts_from_yaml
from sliders_tpu.training.driver import train_text_sliders

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    return make_tiny_snapshot(str(tmp_path_factory.mktemp("sdxl_tiny")), xl=True)


def test_load_sdxl(snapshot):
    m = loader.load_sdxl(snapshot, dtype=jnp.float32, load_vae=True)
    assert m.is_xl and len(m.text_encoders) == 2
    assert m.text_encoders[1].tokenizer.pad_token_id == 0  # model_util.py:150
    assert m.unet_config.addition_embed_type == "text_time"


def test_xl_train_and_sample(snapshot, tmp_path):
    models = loader.load_sdxl(snapshot, dtype=jnp.float32)
    prompts_file = tmp_path / "prompts.yaml"
    prompts_file.write_text(
        "- target: person\n  positive: old person\n  action: enhance\n"
        "  guidance_scale: 2\n  resolution: 64\n"
    )
    cfg = RootConfig(
        **{
            "prompts_file": str(prompts_file),
            "pretrained_model": {"name_or_path": snapshot},
            "network": {"rank": 2, "training_method": "noxattn"},
            "train": {
                "precision": "float32", "iterations": 3, "lr": 1e-3,
                "max_denoising_steps": 4,
            },
            "save": {"name": "xl_slider", "path": str(tmp_path / "out"), "per_steps": 100},
            "tpu": {"remat": False, "donate": False},
        }
    )
    prompts = load_prompts_from_yaml(cfg.prompts_file)
    final = train_text_sliders(cfg, prompts, models, seed=0)
    assert (tmp_path / "out" / "xl_slider_last.safetensors").exists()

    weights = lora_io.load_slider(
        str(tmp_path / "out" / "xl_slider_last.safetensors"), models.unet_params
    )
    sampler = make_sampler(make_schedule(), "ddim", 3)
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, guidance_rescale=0.7,
        compute_dtype=jnp.float32, is_xl=True,
    )
    toks = [te.tokenizer for te in models.text_encoders]
    ps = [te.params for te in models.text_encoders]
    cs = [te.config for te in models.text_encoders]
    cond, pooled_c = encode_prompts_xl(toks, ps, cs, ["person"])
    uncond, pooled_u = encode_prompts_xl(toks, ps, cs, [""])
    tid = t2i.get_add_time_ids(64, 64)
    added = {
        "text_embeds": pooled_c, "time_ids": tid,
        "uncond_text_embeds": pooled_u, "uncond_time_ids": tid,
    }
    lats = t2i.initial_latents(jax.random.key(0), 1, 64, 64, sampler.init_noise_sigma)
    outs = {}
    for s in (-1.0, 1.0):
        outs[s] = fn(
            models.unet_params, lats, cond, uncond, weights,
            jnp.asarray(s), jnp.asarray(1000.0), jnp.asarray(5.0),
            jax.random.key(1), added,
        )
        assert np.isfinite(np.asarray(outs[s])).all()
    assert np.abs(np.asarray(outs[1.0]) - np.asarray(outs[-1.0])).max() > 1e-6
