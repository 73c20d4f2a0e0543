"""UCE / textual-inversion baselines + prompt-helper tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.evals.baselines import (
    inject_learned_token,
    interpolate_params,
    make_uce_sampling_fn,
)
from sliders_tpu.models import clip_text, unet2d
from sliders_tpu.tools.prompt_helper import (
    expand_preservation,
    generate_prompts_sliders,
    parse_llm_response,
)

import pytest

pytestmark = pytest.mark.slow


def test_interpolate_params():
    old = {"a": jnp.zeros((2, 2)), "b": jnp.ones((3,))}
    new = {"a": jnp.ones((2, 2)) * 2, "b": jnp.ones((3,)) * 3}
    mid = interpolate_params(old, new, 0.5)
    np.testing.assert_allclose(np.asarray(mid["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(mid["b"]), 2.0)
    # scale 0 -> old exactly
    z = interpolate_params(old, new, 0.0)
    np.testing.assert_allclose(np.asarray(z["a"]), 0.0)


def test_uce_sampler_gating():
    cfg = unet2d.TINY
    old = unet2d.init_params(jax.random.key(0), cfg)
    edited = jax.tree.map(lambda x: x + 0.01, old)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 4)
    fn = make_uce_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    lats = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    cond = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
    uncond = jax.random.normal(jax.random.key(3), (1, 7, cfg.cross_attention_dim))

    args = (lats, cond, uncond)
    base = fn(old, edited, *args, jnp.asarray(0.0), jnp.asarray(1000.0), jnp.asarray(7.5), jax.random.key(4))
    # scale 0 == old model throughout
    off = fn(old, edited, *args, jnp.asarray(0.0), jnp.asarray(-1.0), jnp.asarray(7.5), jax.random.key(4))
    np.testing.assert_allclose(np.asarray(base), np.asarray(off), atol=1e-5)
    on = fn(old, edited, *args, jnp.asarray(1.0), jnp.asarray(1000.0), jnp.asarray(7.5), jax.random.key(4))
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-5


def test_inject_learned_token():
    cfg = clip_text.TINY
    params = clip_text.init_params(jax.random.key(0), cfg)
    vec = jnp.full((cfg.hidden_size,), 0.123)
    out = inject_learned_token(params, vec, [7])
    emb = out["text_model"]["embeddings"]["token_embedding"]["weight"]
    np.testing.assert_allclose(np.asarray(emb[7]), 0.123, atol=1e-6)
    # other rows untouched
    orig = params["text_model"]["embeddings"]["token_embedding"]["weight"]
    np.testing.assert_allclose(np.asarray(emb[8]), np.asarray(orig[8]))


FAKE_RESPONSE = """Target: person
Positive: person, smiling, happy face, big smile
Negative: person, frowning, grumpy, sad
Preservation: white race, black race; male, female
Name: smile_GPT
"""


def test_parse_and_expand():
    result, classes, name = parse_llm_response(FAKE_RESPONSE)
    assert result["target"] == "person"
    assert result["neutral"] == "person"
    assert result["unconditional"].startswith("person, frowning")
    assert classes == [["white race", "black race"], ["male", "female"]]
    assert name == "smile_GPT"
    expanded = expand_preservation(result, classes)
    assert len(expanded) == 4
    targets = {e["target"] for e in expanded}
    assert "male white race person" in targets or "male black race person" in targets


def test_generate_prompts_yaml_roundtrip(tmp_path):
    from sliders_tpu.prompts import load_prompts_from_yaml

    path = str(tmp_path / "out.yaml")
    entries, saved = generate_prompts_sliders(
        "make people smile", llm=lambda s, u: FAKE_RESPONSE, file_name_to_save=path
    )
    assert saved == path and len(entries) == 4
    assert entries[0]["guidance"] == 4 and entries[0]["action"] == "enhance"
    # the emitted YAML loads through the training prompt loader, including
    # the 'guidance' -> guidance_scale mapping
    settings = load_prompts_from_yaml(path)
    assert len(settings) == 4
    assert settings[0].guidance_scale == 4.0
    assert settings[0].action == "enhance"
