"""FLUX MMDiT + flow-matching slider tests (tiny config)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import flux

pytestmark = pytest.mark.slow


def test_param_count_golden():
    shapes = jax.eval_shape(lambda k: flux.init_params(k, flux.FLUX_DEV), jax.random.key(0))
    total = sum(math.prod(l.shape) for l in jax.tree.leaves(shapes))
    assert total == 11_901_408_320  # FLUX.1-dev transformer
    shapes_s = jax.eval_shape(
        lambda k: flux.init_params(k, flux.FLUX_SCHNELL), jax.random.key(0)
    )
    total_s = sum(math.prod(l.shape) for l in jax.tree.leaves(shapes_s))
    # schnell drops exactly the guidance embedder (two linears)
    assert total - total_s == (256 * 3072 + 3072) + (3072 * 3072 + 3072)


def test_pack_unpack_roundtrip():
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    packed = flux.pack_latents(lat)
    assert packed.shape == (2, 16, 16)
    back = flux.unpack_latents(packed, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_rope_tables():
    ids = jnp.asarray(flux.image_ids(8, 8))
    assert ids.shape == (16, 3)
    cos, sin = flux.rope_tables(ids, flux.TINY)
    assert cos.shape == (16, 16)  # sum(axes_dims_rope)
    np.testing.assert_allclose(np.asarray(cos**2 + sin**2), 1.0, atol=1e-5)
    # rotation preserves norms
    x = jax.random.normal(jax.random.key(1), (1, 16, 2 * 16))
    rx = flux.apply_rope(x, cos, sin, num_heads=2)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(rx, axis=-1)),
        np.asarray(jnp.linalg.norm(x, axis=-1)),
        rtol=1e-5,
    )
    # position 0 (txt ids) is identity rotation
    tids = jnp.asarray(flux.text_ids(4))
    c0, s0 = flux.rope_tables(tids, flux.TINY)
    np.testing.assert_allclose(np.asarray(c0), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_flux():
    cfg = flux.TINY
    params = flux.init_params(jax.random.key(0), cfg)
    B, L_txt = 2, 5
    packed = jax.random.normal(jax.random.key(1), (B, 16, cfg.in_channels))
    pooled = jax.random.normal(jax.random.key(2), (B, cfg.pooled_projection_dim))
    txt = jax.random.normal(jax.random.key(3), (B, L_txt, cfg.joint_attention_dim))
    tids = jnp.asarray(flux.text_ids(L_txt))
    iids = jnp.asarray(flux.image_ids(8, 8))
    return cfg, params, packed, pooled, txt, tids, iids


def test_forward_shapes_and_conditioning(tiny_flux):
    cfg, params, packed, pooled, txt, tids, iids = tiny_flux
    t = jnp.asarray([0.9, 0.5])
    g = jnp.asarray([1.0, 1.0])
    out = flux.apply(params, cfg, packed, t, pooled, txt, tids, iids, guidance=g)
    assert out.shape == packed.shape
    assert np.isfinite(np.asarray(out)).all()
    # guidance embedding conditions the output
    out2 = flux.apply(params, cfg, packed, t, pooled, txt, tids, iids, guidance=g + 3.0)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-4
    # missing guidance raises for guidance_embeds variants
    with pytest.raises(ValueError):
        flux.apply(params, cfg, packed, t, pooled, txt, tids, iids)


def test_flux_lora_targeting(tiny_flux):
    cfg, params, *_ = tiny_flux
    paths = lnet.target_module_paths(params, "lierla", "full")
    # 2 double blocks x 8 linears + 2 single blocks x 3 linears
    assert len(paths) == 2 * 8 + 2 * 3
    # 'xattn' == parents containing 'attn' -> same set for FLUX
    assert lnet.target_module_paths(params, "lierla", "xattn") == paths
    # ortho-up init: nonzero orthonormal rows, frozen by the mask
    lora = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, train_method="xattn", ortho_up=True
    )
    up = lora[paths[0]]["up"]
    np.testing.assert_allclose(np.asarray(up @ up.T), np.eye(4), atol=1e-4)
    mask = lnet.trainable_mask(lora, ortho_up=True)
    assert not mask[paths[0]]["up"] and mask[paths[0]]["down"]


def test_flux_slider_training_step(tiny_flux):
    cfg, params, *_ = tiny_flux
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.flux_slider import make_flux_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState, stack_prompt_pairs

    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="xattn")
    mask = lnet.trainable_mask(lora)
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 5e-3, 50), trainable_mask=mask
    )
    sampler = make_flowmatch_sampler(num_steps=4, mu=0.5)
    step = make_flux_slider_step(
        cfg, sampler, optimizer, resolution=64, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    ks = jax.random.split(jax.random.key(5), 8)
    L = 5
    pair = {}
    for i, role in enumerate(("target", "positive", "neutral", "unconditional")):
        pair[f"{role}_t5"] = jax.random.normal(ks[2 * i], (L, cfg.joint_attention_dim))
        pair[f"{role}_pooled"] = jax.random.normal(ks[2 * i + 1], (cfg.pooled_projection_dim,))
    pair["guidance_signed"] = jnp.asarray(1.0)
    pairs = stack_prompt_pairs([pair])
    state = SliderTrainState.create(jax.random.key(6), lora, optimizer)

    zero = jnp.asarray(0, jnp.int32)
    losses = []
    for _ in range(20):
        state, metrics = step(state.replace(step=zero), params, pairs)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_flux_sampling_gating(tiny_flux):
    cfg, params, packed, pooled, txt, tids, iids = tiny_flux
    from sliders_tpu.pipelines.flux_t2i import make_flux_sampling_fn

    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="xattn")
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    sampler = make_flowmatch_sampler(num_steps=4, image_seq_len=16)
    fn = make_flux_sampling_fn(cfg, sampler, latent_hw=8, compute_dtype=jnp.float32)
    base = fn(params, packed, pooled, txt, lora, jnp.asarray(0.0), jnp.asarray(-1), jnp.asarray(1.0))
    # skip_till >= n-1 -> slider never active
    off = fn(params, packed, pooled, txt, lora, jnp.asarray(4.0), jnp.asarray(10), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(base), np.asarray(off), atol=1e-5)
    on = fn(params, packed, pooled, txt, lora, jnp.asarray(4.0), jnp.asarray(-1), jnp.asarray(1.0))
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-4


def test_flux_lora_checkpoint_roundtrip(tmp_path, tiny_flux):
    """FLUX slider checkpoints use the same lora_unet_* convention; the
    underscore-name resolution must handle single_transformer_blocks."""
    from sliders_tpu.lora import io as lio

    cfg, params, *_ = tiny_flux
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="xattn")
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    f = str(tmp_path / "flux_slider.safetensors")
    lio.save_slider(f, lora)
    loaded = lio.load_slider(f, params)
    assert set(loaded) == set(lora)
    for m in lora:
        np.testing.assert_allclose(
            np.asarray(loaded[m]["down"]), np.asarray(lora[m]["down"]), atol=1e-6
        )
