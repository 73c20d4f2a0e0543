"""Driver extras: dynamic resolution buckets, offset noise, composition
guidance, custom-diffusion weight loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion.guidance import apply_noise_offset, compose_velocities
from sliders_tpu.training.driver import random_resolution_in_bucket

pytestmark = pytest.mark.slow


def test_random_resolution_bucket():
    rng = np.random.default_rng(0)
    for _ in range(50):
        h, w = random_resolution_in_bucket(rng, 512)
        assert h % 64 == 0 and w % 64 == 0
        assert 256 <= h < 512 and 256 <= w < 512


def test_offset_noise():
    lat = jnp.zeros((2, 8, 8, 4))
    out = apply_noise_offset(lat, 0.1, jax.random.key(0))
    arr = np.asarray(out)
    # per-channel constant shift: every spatial position identical
    assert np.allclose(arr, arr[:, :1, :1, :], atol=1e-6)
    assert np.abs(arr).max() > 0


def test_compose_velocities():
    uncond = jnp.ones((1, 4))
    preds = jnp.stack([jnp.full((1, 4), 2.0), jnp.full((1, 4), 3.0)])
    out = compose_velocities(uncond, preds, 0.5)
    np.testing.assert_allclose(np.asarray(out), 1.0 + 0.5 * 5.0)


def test_custom_diffusion_weights():
    from sliders_tpu.evals.baselines import apply_custom_diffusion
    from sliders_tpu.models import unet2d

    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    key = "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"
    new_w = np.random.default_rng(0).standard_normal((32, 32)).astype(np.float32)
    out = apply_custom_diffusion(params, {"unet." + key: new_w})
    got = out["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn2"]["to_k"]["weight"]
    np.testing.assert_allclose(np.asarray(got), new_w.T, atol=1e-6)
    with pytest.raises(ValueError):
        apply_custom_diffusion(params, {"other.weight": new_w})


def test_dynamic_resolution_training(tmp_path):
    """Two iterations at different sampled resolutions compile separate
    bucket steps and both run."""
    import sys

    sys.path.insert(0, str(tmp_path))
    from helpers import make_tiny_snapshot
    from sliders_tpu.core.config import RootConfig
    from sliders_tpu.models import loader
    from sliders_tpu.prompts import load_prompts_from_yaml
    from sliders_tpu.training.driver import train_text_sliders

    snap = make_tiny_snapshot(str(tmp_path / "snap"))
    models = loader.load_sd(snap, dtype=jnp.float32)
    pf = tmp_path / "p.yaml"
    pf.write_text(
        "- target: person\n  action: enhance\n  guidance_scale: 1\n"
        "  resolution: 128\n  dynamic_resolution: true\n"
    )
    cfg = RootConfig(
        **{
            "prompts_file": str(pf),
            "pretrained_model": {"name_or_path": snap},
            "network": {"rank": 2, "training_method": "noxattn"},
            "train": {"precision": "float32", "iterations": 3, "lr": 1e-3,
                      "max_denoising_steps": 3},
            "save": {"name": "dyn", "path": str(tmp_path / "out"), "per_steps": 100},
            "tpu": {"remat": False, "donate": False},
        }
    )
    prompts = load_prompts_from_yaml(cfg.prompts_file)
    final = train_text_sliders(cfg, prompts, models, seed=3)
    assert final  # completed without shape errors across buckets


@pytest.mark.slow
def test_steps_per_call_chunking(tmp_path):
    """tpu.steps_per_call=3 must produce the same training result as the
    per-step driver loop (RNG folds in the absolute step counter) including
    the un-even tail chunk, and still write the periodic artifacts."""
    import sys

    sys.path.insert(0, str(tmp_path))
    from helpers import make_tiny_snapshot
    from sliders_tpu.core.config import RootConfig
    from sliders_tpu.models import loader
    from sliders_tpu.prompts import load_prompts_from_yaml
    from sliders_tpu.training.driver import train_text_sliders

    snap = make_tiny_snapshot(str(tmp_path / "snap"))
    models = loader.load_sd(snap, dtype=jnp.float32)
    pf = tmp_path / "p.yaml"
    pf.write_text(
        "- target: person\n  positive: old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 2\n"
        "  resolution: 64\n"
    )
    base = {
        "prompts_file": str(pf),
        "pretrained_model": {"name_or_path": snap},
        "network": {"rank": 2, "training_method": "noxattn"},
        "train": {"precision": "float32", "iterations": 5, "lr": 1e-3,
                  "max_denoising_steps": 3},
        "save": {"name": "chunked", "path": str(tmp_path / "out_c"), "per_steps": 3},
        "tpu": {"remat": False, "donate": False, "steps_per_call": 3},
    }
    prompts = load_prompts_from_yaml(pf)
    final_c = train_text_sliders(RootConfig(**base), prompts, models, seed=3)

    plain = dict(base)
    plain["save"] = {"name": "plain", "path": str(tmp_path / "out_p"), "per_steps": 3}
    plain["tpu"] = {"remat": False, "donate": False}
    final_p = train_text_sliders(RootConfig(**plain), prompts, models, seed=3)

    for mname in final_p:
        np.testing.assert_allclose(
            np.asarray(final_c[mname]["up"]),
            np.asarray(final_p[mname]["up"]),
            rtol=5e-4, atol=1e-7,
        )
    # periodic save fired inside the chunk (step 3 of 0..4)
    assert (tmp_path / "out_c" / "chunked_3steps.safetensors").exists()
    assert (tmp_path / "out_c" / "chunked_last.safetensors").exists()


@pytest.mark.slow
def test_chunk_larger_than_save_cadence_saves_exact_states(tmp_path):
    """steps_per_call=10 with per_steps=2: chunk ends are cadence-aligned,
    so each periodic artifact holds exactly its labeled step's weights —
    byte-comparable to the unchunked run's artifacts."""
    import sys

    sys.path.insert(0, str(tmp_path))
    from helpers import make_tiny_snapshot
    from safetensors.numpy import load_file
    from sliders_tpu.core.config import RootConfig
    from sliders_tpu.models import loader
    from sliders_tpu.prompts import load_prompts_from_yaml
    from sliders_tpu.training.driver import train_text_sliders

    snap = make_tiny_snapshot(str(tmp_path / "snap"))
    models = loader.load_sd(snap, dtype=jnp.float32)
    pf = tmp_path / "p.yaml"
    pf.write_text(
        "- target: person\n  positive: old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 2\n"
        "  resolution: 64\n"
    )
    base = {
        "prompts_file": str(pf),
        "pretrained_model": {"name_or_path": snap},
        "network": {"rank": 2, "training_method": "noxattn"},
        "train": {"precision": "float32", "iterations": 6, "lr": 1e-3,
                  "max_denoising_steps": 3},
        "save": {"name": "big", "path": str(tmp_path / "out_big"), "per_steps": 2},
        "tpu": {"remat": False, "donate": False, "steps_per_call": 10},
    }
    prompts = load_prompts_from_yaml(pf)
    train_text_sliders(RootConfig(**base), prompts, models, seed=4)

    plain = dict(base)
    plain["save"] = {"name": "ref", "path": str(tmp_path / "out_ref"), "per_steps": 2}
    plain["tpu"] = {"remat": False, "donate": False}
    train_text_sliders(RootConfig(**plain), prompts, models, seed=4)

    for s in (2, 4):
        a = load_file(str(tmp_path / "out_big" / f"big_{s}steps.safetensors"))
        b = load_file(str(tmp_path / "out_ref" / f"ref_{s}steps.safetensors"))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=1e-7, err_msg=f"step {s}: {k}")
