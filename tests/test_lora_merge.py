"""Merged-weight LoRA fast path == branch path, numerically."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sliders_tpu.lora import network as lnet
from sliders_tpu.lora.merge import merge_lora_weights
from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora


@pytest.mark.slow
def test_merged_equals_branch():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, alpha=2.0,
        train_method="full", network_type="c3lier",
    )
    lora = jax.tree.map(lambda x: x + 0.05, lora)  # nonzero up
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(3), (2, 7, cfg.cross_attention_dim))
    t = jnp.array([500.0, 100.0])

    for mult in (-1.5, 0.0, 1.0):
        branch = unet2d.apply(
            params, cfg, x, t, ehs,
            lora=SliderLora(weights=lora, multiplier=jnp.asarray(mult)),
        )
        merged = unet2d.apply(
            merge_lora_weights(params, lora, jnp.asarray(mult)), cfg, x, t, ehs
        )
        np.testing.assert_allclose(
            np.asarray(branch), np.asarray(merged), atol=2e-4
        ), mult


@pytest.mark.slow
def test_merge_gradients_match_branch():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="noxattn")
    lora = jax.tree.map(lambda v: v + 0.02, lora)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(3), (1, 7, cfg.cross_attention_dim))
    t = jnp.array([300.0])

    def loss_branch(w):
        out = unet2d.apply(
            params, cfg, x, t, ehs, lora=SliderLora(weights=w, multiplier=jnp.asarray(1.0))
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_merged(w):
        out = unet2d.apply(merge_lora_weights(params, w, 1.0), cfg, x, t, ehs)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_branch)(lora)
    g2 = jax.grad(loss_merged)(lora)
    for m in lora:
        for k in ("down", "up"):
            np.testing.assert_allclose(
                np.asarray(g1[m][k]), np.asarray(g2[m][k]), atol=1e-4, rtol=1e-3
            )


def test_merge_preserves_untargeted_leaves():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="xattn")
    merged = merge_lora_weights(params, lora, 1.0)
    # an untargeted leaf is the identical array object (no copy)
    assert merged["conv_in"]["weight"] is params["conv_in"]["weight"]
    # zero-init up -> merged weights equal base everywhere
    a = np.asarray(merged["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn2"]["to_q"]["weight"])
    b = np.asarray(params["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn2"]["to_q"]["weight"])
    np.testing.assert_allclose(a, b, atol=1e-7)
