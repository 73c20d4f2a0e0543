"""Single-file LDM checkpoint conversion tests.

A synthetic LDM state dict is produced from our tiny diffusers-named trees
via the inverse key map; the forward converter must reconstruct the original
trees exactly (numerics + complete coverage of every parameter)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.models import convert, ldm_checkpoint as ldm, unet2d, vae as vae_mod
from sliders_tpu.utils import pytree


def _make_ldm_state(tree, key_map, vae_attn_to_conv=False):
    """our tree -> torch-layout flat LDM dict via the inverse key map."""
    torch_state = convert.to_torch_layout(tree)
    out = {}
    for k, w in torch_state.items():
        base, _, suffix = k.rpartition(".")
        assert base in key_map, f"no ldm key for {base}"
        if (
            vae_attn_to_conv
            and w.ndim == 2
            and any(base.endswith(s) for s in ("to_q", "to_k", "to_v", "to_out.0"))
        ):
            w = w[:, :, None, None]  # diffusers linear -> ldm 1x1 conv
        out[f"{key_map[base]}.{suffix}"] = w
    return out


def test_unet_roundtrip_exact():
    cfg = unet2d.TINY
    tree = jax.device_get(unet2d.init_params(jax.random.key(0), cfg))
    key_map = ldm.diffusers_to_ldm_keys(cfg)
    state = _make_ldm_state(tree, key_map)
    assert all(k.startswith("model.diffusion_model.") for k in state)

    unet_tree, _, _ = ldm.convert_ldm_state(state, cfg)
    flat_orig = pytree.flatten(tree)
    flat_new = pytree.flatten(unet_tree)
    assert set(flat_new) == set(flat_orig)
    for k in flat_orig:
        np.testing.assert_array_equal(np.asarray(flat_new[k]), np.asarray(flat_orig[k]))


def test_unet_sdxl_shape_keymap_covers_all_params():
    """Every param of the tiny-XL tree must have an LDM key (incl. the
    text_time label_emb) — guards the index arithmetic."""
    cfg = unet2d.TINY_XL
    shapes = jax.eval_shape(lambda k: unet2d.init_params(k, cfg), jax.random.key(0))
    key_map = ldm.diffusers_to_ldm_keys(cfg)
    for path in pytree.flatten(shapes):
        base, _, _ = path.rpartition(".")
        assert base in key_map, path


def test_vae_roundtrip_exact():
    cfg = vae_mod.TINY
    tree = jax.device_get(vae_mod.init_params(jax.random.key(0), cfg))
    key_map = ldm.diffusers_to_ldm_keys(unet2d.TINY, cfg)
    state = _make_ldm_state(tree, key_map, vae_attn_to_conv=True)
    assert any(k.startswith("first_stage_model.") for k in state)

    _, vae_tree, _ = ldm.convert_ldm_state(state, unet2d.TINY, cfg)
    flat_orig = pytree.flatten(tree)
    flat_new = pytree.flatten(vae_tree)
    assert set(flat_new) == set(flat_orig)
    for k in flat_orig:
        np.testing.assert_array_equal(np.asarray(flat_new[k]), np.asarray(flat_orig[k]))


def test_text_encoder_passthrough():
    from sliders_tpu.models import clip_text

    tree = jax.device_get(clip_text.init_params(jax.random.key(0), clip_text.TINY))
    torch_state = convert.to_torch_layout(tree)
    state = {f"cond_stage_model.transformer.{k}": v for k, v in torch_state.items()}
    _, _, text_tree = ldm.convert_ldm_state(state, unet2d.TINY)
    flat_orig = pytree.flatten(tree)
    flat_new = pytree.flatten(text_tree)
    assert set(flat_new) == set(flat_orig)


@pytest.mark.slow
def test_single_file_safetensors(tmp_path):
    from safetensors.numpy import save_file

    cfg = unet2d.TINY
    tree = jax.device_get(unet2d.init_params(jax.random.key(0), cfg))
    state = _make_ldm_state(tree, ldm.diffusers_to_ldm_keys(cfg))
    f = str(tmp_path / "model.safetensors")
    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in state.items()}, f)

    unet_tree, _, _ = ldm.load_single_file(f, cfg)
    out = unet2d.apply(
        unet_tree, cfg,
        jax.random.normal(jax.random.key(1), (1, 16, 16, 4)),
        jnp.asarray([100.0]),
        jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim)),
    )
    ref = unet2d.apply(
        tree, cfg,
        jax.random.normal(jax.random.key(1), (1, 16, 16, 4)),
        jnp.asarray([100.0]),
        jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_loader_single_file_dispatch(tmp_path):
    """loader.load_sd accepts a single-file checkpoint + local tokenizer dir
    (model_util.py:111-116 dispatch). Uses the tiny config via monkeypatched
    architecture configs."""
    from unittest import mock

    from safetensors.numpy import save_file

    from sliders_tpu.models import clip_text, loader
    from helpers import make_tokenizer_files

    ucfg = unet2d.TINY
    vcfg = vae_mod.TINY
    unet_tree = jax.device_get(unet2d.init_params(jax.random.key(0), ucfg))
    vae_tree = jax.device_get(vae_mod.init_params(jax.random.key(1), vcfg))
    tok_dir = str(tmp_path / "tok")
    vocab = make_tokenizer_files(tok_dir)
    te_cfg = clip_text.ClipTextConfig(
        vocab_size=len(vocab), hidden_size=ucfg.cross_attention_dim, num_layers=2,
        num_heads=2, intermediate_size=64, max_positions=16,
        eos_token_id=vocab["<|endoftext|>"],
    )
    text_tree = jax.device_get(clip_text.init_params(jax.random.key(2), te_cfg))

    state = {}
    state.update(_make_ldm_state(unet_tree, ldm.diffusers_to_ldm_keys(ucfg)))
    state.update(
        _make_ldm_state(vae_tree, ldm.diffusers_to_ldm_keys(ucfg, vcfg), vae_attn_to_conv=True)
    )
    state.update(
        {f"cond_stage_model.transformer.{k}": v
         for k, v in convert.to_torch_layout(text_tree).items()}
    )
    f = str(tmp_path / "sd.safetensors")
    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in state.items()}, f)

    with mock.patch.object(unet2d, "SD15", ucfg), \
         mock.patch.object(vae_mod, "SD_VAE", vcfg), \
         mock.patch.object(clip_text, "CLIP_L", te_cfg):
        m = loader.load_sd(f, dtype=jnp.float32, load_vae=True, tokenizer_dir=tok_dir)
    assert m.unet_config is ucfg and m.vae_params is not None
    ids = m.text_encoders[0].tokenizer(["old person"])
    assert ids.shape == (1, 16)
    # missing tokenizer_dir -> clear error
    with pytest.raises(ValueError):
        loader.load_sd(f, dtype=jnp.float32)
