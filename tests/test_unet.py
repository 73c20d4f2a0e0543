"""UNet2DConditionModel structure + behavior tests.

Without diffusers in the image, structural fidelity is pinned by exact
parameter-count golden values for the real configs (they match the published
diffusers models down to the last scalar) plus op-level torch parity
(test_ops.py); behavior tests run the tiny configs end to end."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora


def _count(cfg):
    shapes = jax.eval_shape(lambda k: unet2d.init_params(k, cfg), jax.random.key(0))
    return sum(math.prod(l.shape) for l in jax.tree.leaves(shapes))


@pytest.mark.parametrize(
    "cfg,expected",
    [
        (unet2d.SD15, 859_520_964),  # diffusers sd-v1-5 unet total
        (unet2d.SD21, 865_910_724),  # diffusers sd-2-1 unet total
        (unet2d.SDXL, 2_567_463_684),  # diffusers sdxl-base-1.0 unet total
    ],
)
def test_param_count_golden(cfg, expected):
    assert _count(cfg) == expected


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    t = jnp.array([10.0, 500.0])
    return cfg, params, x, ehs, t


def test_forward_shape_and_determinism(tiny_setup):
    cfg, params, x, ehs, t = tiny_setup
    out = unet2d.apply(params, cfg, x, t, ehs)
    assert out.shape == (2, 16, 16, 4)
    out2 = unet2d.apply(params, cfg, x, t, ehs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert np.isfinite(np.asarray(out)).all()


def test_jit_matches_eager(tiny_setup):
    cfg, params, x, ehs, t = tiny_setup
    eager = unet2d.apply(params, cfg, x, t, ehs)
    jitted = jax.jit(lambda p, x, t, e: unet2d.apply(p, cfg, x, t, e))(params, x, t, ehs)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


@pytest.mark.slow
def test_remat_matches(tiny_setup):
    cfg, params, x, ehs, t = tiny_setup
    base = unet2d.apply(params, cfg, x, t, ehs)
    rem = unet2d.apply(params, cfg, x, t, ehs, remat=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rem), atol=1e-5)


def test_lora_zero_scale_is_identity_nonzero_changes(tiny_setup):
    cfg, params, x, ehs, t = tiny_setup
    name = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    c = cfg.block_out_channels[0]
    lora = SliderLora(
        weights={
            name: {
                "down": jax.random.normal(jax.random.key(5), (c, 4)) * 0.1,
                "up": jax.random.normal(jax.random.key(6), (4, c)) * 0.1,
                "alpha": jnp.asarray(1.0),
            }
        },
        multiplier=jnp.asarray(0.0),
    )
    base = unet2d.apply(params, cfg, x, t, ehs)
    off = unet2d.apply(params, cfg, x, t, ehs, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(off), atol=1e-6)
    on = unet2d.apply(params, cfg, x, t, ehs, lora=lora.with_multiplier(2.0))
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-4


def test_lora_scale_is_runtime_scalar_no_recompile(tiny_setup):
    """Slider scale must be a traced value: one compiled program serves all
    scales (the reference needs context-manager mutation per scale)."""
    cfg, params, x, ehs, t = tiny_setup
    name = "mid_block.attentions.0.transformer_blocks.0.attn2.to_q"
    c = cfg.block_out_channels[-1]
    weights = {
        name: {
            "down": jax.random.normal(jax.random.key(5), (c, 4)) * 0.1,
            "up": jax.random.normal(jax.random.key(6), (4, c)) * 0.1,
            "alpha": jnp.asarray(1.0),
        }
    }

    @jax.jit
    def f(mult):
        return unet2d.apply(
            params, cfg, x, t, ehs, lora=SliderLora(weights=weights, multiplier=mult)
        )

    outs = {s: f(jnp.asarray(s)) for s in (-2.0, 0.0, 1.0)}
    assert f._cache_size() == 1
    base = unet2d.apply(params, cfg, x, t, ehs)
    np.testing.assert_allclose(np.asarray(outs[0.0]), np.asarray(base), atol=1e-5)


def test_tiny_xl_added_cond():
    cfg = unet2d.TINY_XL
    params = unet2d.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    t = jnp.array([10.0, 500.0])
    added = {
        "text_embeds": jax.random.normal(jax.random.key(3), (2, 16)),
        "time_ids": jnp.tile(jnp.array([[128.0, 128.0, 0.0, 0.0, 128.0, 128.0]]), (2, 1)),
    }
    out = unet2d.apply(params, cfg, x, t, ehs, added_cond=added)
    assert out.shape == (2, 16, 16, 4)
    # missing added_cond must raise (the reference asserts the 2816 contract)
    with pytest.raises(ValueError):
        unet2d.apply(params, cfg, x, t, ehs)
    # conditioning actually conditions
    added2 = dict(added, text_embeds=added["text_embeds"] + 1.0)
    out2 = unet2d.apply(params, cfg, x, t, ehs, added_cond=added2)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-4


@pytest.mark.slow
def test_grad_flows_only_through_lora(tiny_setup):
    cfg, params, x, ehs, t = tiny_setup
    name = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_v"
    c = cfg.block_out_channels[0]
    weights = {
        name: {
            "down": jax.random.normal(jax.random.key(5), (c, 4)) * 0.1,
            "up": jnp.zeros((4, c)),
            "alpha": jnp.asarray(1.0),
        }
    }

    def loss(w):
        out = unet2d.apply(
            params, cfg, x, t, ehs,
            lora=SliderLora(weights=w, multiplier=jnp.asarray(1.0)),
        )
        return (out**2).mean()

    g = jax.grad(loss)(weights)
    # up starts at zero (reference init, lora.py:98) but receives gradient
    assert np.abs(np.asarray(g[name]["up"])).max() > 0
