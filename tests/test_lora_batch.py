"""Per-row stacked LoRA (lora/batch.py): different adapters in one batch.

Pins the multi-tenant serving claim: a batch whose rows carry DIFFERENT
sliders (stacked leaves, ops/basic.py per-row paths) produces exactly what
each row's solo run produces — through a bare linear/conv, the whole tiny
UNet, and the CFG-doubled sampling fn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_tpu.lora import network as lnet
from sliders_tpu.lora.batch import is_stacked, stack_sliders, structure_signature
from sliders_tpu.models import unet2d
from sliders_tpu.ops import basic
from sliders_tpu.ops.basic import SliderLora


def _linear_adapter(key, d_in, d_out, rank, alpha=1.0):
    k1, k2 = jax.random.split(key)
    return {
        "m": {
            "down": jax.random.normal(k1, (d_in, rank), jnp.float32) * 0.1,
            "up": jax.random.normal(k2, (rank, d_out), jnp.float32) * 0.1,
            "alpha": jnp.asarray(alpha, jnp.float32),
        }
    }


def _conv_adapter(key, kh, kw, c_in, c_out, rank, alpha=1.0):
    k1, k2 = jax.random.split(key)
    return {
        "m": {
            "down": jax.random.normal(k1, (kh, kw, c_in, rank), jnp.float32) * 0.1,
            "up": jax.random.normal(k2, (1, 1, rank, c_out), jnp.float32) * 0.1,
            "alpha": jnp.asarray(alpha, jnp.float32),
        }
    }


def test_stack_and_signature():
    a = _linear_adapter(jax.random.key(0), 8, 6, 2)
    b = _linear_adapter(jax.random.key(1), 8, 6, 2, alpha=2.0)
    assert structure_signature(a) == structure_signature(b)
    stacked = stack_sliders([a, b, a])
    assert stacked["m"]["down"].shape == (3, 8, 2)
    assert stacked["m"]["alpha"].shape == (3,)
    assert is_stacked(stacked) and not is_stacked(a)

    # heterogeneous ranks coalesce (Punica-style): same signature, factors
    # zero-padded to the batch max rank, true ranks carried per row
    c = _linear_adapter(jax.random.key(2), 8, 6, 3)
    assert structure_signature(a) == structure_signature(c)
    het = stack_sliders([a, c])
    assert het["m"]["down"].shape == (2, 8, 3)
    assert het["m"]["up"].shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(het["m"]["rank"]), [2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(het["m"]["down"][0, :, 2]), 0.0)
    np.testing.assert_array_equal(np.asarray(het["m"]["up"][0, 2, :]), 0.0)

    d = _linear_adapter(jax.random.key(3), 8, 7, 2)  # different out dim
    with pytest.raises(ValueError, match="different structures"):
        stack_sliders([a, d])
    with pytest.raises(ValueError, match="at least one"):
        stack_sliders([])
    with pytest.raises(ValueError, match="empty adapter tree"):
        structure_signature({})
    assert not is_stacked({})


def test_mixed_rank_rows_bit_identical_to_solo():
    """Heterogeneous multi-tenant batching: a batch mixing rank-2/3/4
    adapters matches each row's solo run — linear rows BIT-identical,
    conv rows to ulp tolerance (the grouped conv's reduction order differs,
    exactly like the same-rank conv case above). Zero-padded rank columns
    are exact no-ops and the per-row rank vector keeps the alpha/rank
    divisor the solo value."""
    lin = [
        _linear_adapter(jax.random.key(0), 8, 6, 2, alpha=1.0),
        _linear_adapter(jax.random.key(1), 8, 6, 4, alpha=3.0),
        _linear_adapter(jax.random.key(2), 8, 6, 3, alpha=2.0),
    ]
    p = {
        "weight": jax.random.normal(jax.random.key(10), (8, 6), jnp.float32),
        "bias": jax.random.normal(jax.random.key(11), (6,), jnp.float32),
    }
    x = jax.random.normal(jax.random.key(12), (3, 5, 8), jnp.float32)
    mult = jnp.asarray([0.5, -1.0, 2.0])
    stacked = SliderLora(weights=stack_sliders(lin), multiplier=mult)
    y = basic.linear(p, x, lora=stacked, name="m")
    for b, w in enumerate(lin):
        solo = basic.linear(
            p, x[b : b + 1],
            lora=SliderLora(weights=w, multiplier=mult[b]), name="m",
        )
        np.testing.assert_array_equal(np.asarray(y[b]), np.asarray(solo[0]))

    conv = [
        _conv_adapter(jax.random.key(20), 3, 3, 4, 6, 2),
        _conv_adapter(jax.random.key(21), 3, 3, 4, 6, 4, alpha=2.0),
    ]
    pc = {
        "weight": jax.random.normal(jax.random.key(22), (3, 3, 4, 6), jnp.float32) * 0.2,
        "bias": jax.random.normal(jax.random.key(23), (6,), jnp.float32),
    }
    xc = jax.random.normal(jax.random.key(24), (2, 8, 8, 4), jnp.float32)
    multc = jnp.asarray([1.5, -0.5])
    stacked_c = SliderLora(weights=stack_sliders(conv), multiplier=multc)
    yc = basic.conv2d(pc, xc, lora=stacked_c, name="m")
    for b, w in enumerate(conv):
        solo = basic.conv2d(
            pc, xc[b : b + 1],
            lora=SliderLora(weights=w, multiplier=multc[b]), name="m",
        )
        np.testing.assert_allclose(
            np.asarray(yc[b]), np.asarray(solo[0]), atol=1e-5
        )


def test_linear_per_row_matches_solo():
    adapters = [
        _linear_adapter(jax.random.key(i), 8, 6, 2, alpha=1.0 + i) for i in range(4)
    ]
    p = {
        "weight": jax.random.normal(jax.random.key(10), (8, 6), jnp.float32),
        "bias": jax.random.normal(jax.random.key(11), (6,), jnp.float32),
    }
    x = jax.random.normal(jax.random.key(12), (4, 5, 8), jnp.float32)
    mult = jnp.asarray([0.5, -1.0, 0.0, 2.0])
    stacked = SliderLora(weights=stack_sliders(adapters), multiplier=mult)
    y = basic.linear(p, x, lora=stacked, name="m")
    for b, w in enumerate(adapters):
        solo = basic.linear(
            p, x[b : b + 1],
            lora=SliderLora(weights=w, multiplier=mult[b]), name="m",
        )
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(solo[0]), atol=1e-6)

    # 2-D activations (time_emb_proj path): (B, C) rows
    x2 = x[:, 0, :]
    y2 = basic.linear(p, x2, lora=stacked, name="m")
    solo2 = basic.linear(
        p, x2[1:2], lora=SliderLora(weights=adapters[1], multiplier=mult[1]), name="m"
    )
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(solo2[0]), atol=1e-6)


@pytest.mark.parametrize("stride,padding", [(1, "SAME"), (2, 1)])
def test_conv_per_row_matches_solo(stride, padding):
    adapters = [_conv_adapter(jax.random.key(i), 3, 3, 4, 6, 2) for i in range(3)]
    p = {
        "weight": jax.random.normal(jax.random.key(10), (3, 3, 4, 6), jnp.float32) * 0.2,
        "bias": jax.random.normal(jax.random.key(11), (6,), jnp.float32),
    }
    x = jax.random.normal(jax.random.key(12), (3, 8, 8, 4), jnp.float32)
    mult = jnp.asarray([1.0, -0.5, 3.0])
    stacked = SliderLora(weights=stack_sliders(adapters), multiplier=mult)
    y = basic.conv2d(p, x, stride=stride, padding=padding, lora=stacked, name="m")
    for b, w in enumerate(adapters):
        solo = basic.conv2d(
            p, x[b : b + 1], stride=stride, padding=padding,
            lora=SliderLora(weights=w, multiplier=mult[b]), name="m",
        )
        np.testing.assert_allclose(
            np.asarray(y[b]), np.asarray(solo[0]), atol=1e-5
        )


def test_tiny_unet_stacked_rows_match_solo():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    adapters = [
        lnet.create_slider_network(
            jax.random.key(1 + i), params, rank=2, train_method="noxattn"
        )
        for i in range(2)
    ]
    # zero-init up defeats the test — give each adapter a distinct nonzero up
    adapters = [
        {m: {**e, "up": e["up"] + (0.3 if i == 0 else -0.2)} for m, e in w.items()}
        for i, w in enumerate(adapters)
    ]
    B = 3
    x = jax.random.normal(jax.random.key(7), (B, 8, 8, 4), jnp.float32)
    ehs = jax.random.normal(jax.random.key(8), (B, 7, cfg.cross_attention_dim))
    t = jnp.asarray(421.0)
    mult = jnp.asarray([1.0, -2.0, 0.5])
    rows = [adapters[0], adapters[1], adapters[0]]
    lora = SliderLora(weights=stack_sliders(rows), multiplier=mult)
    y = unet2d.apply(params, cfg, x, t, ehs, lora=lora)
    for b in range(B):
        solo = unet2d.apply(
            params, cfg, x[b : b + 1], t, ehs[b : b + 1],
            lora=SliderLora(weights=rows[b], multiplier=mult[b]),
        )
        np.testing.assert_allclose(
            np.asarray(y[b]), np.asarray(solo[0]), atol=2e-5
        )


@pytest.mark.slow
def test_sampling_fn_stacked_matches_solo():
    """CFG path: the stacked row axis doubles with the latent rows, and each
    row's start_noise gate rides per-row (serving's exact program)."""
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.pipelines import text2image as t2i

    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    adapters = []
    for i in range(2):
        w = lnet.create_slider_network(
            jax.random.key(1 + i), params, rank=2, train_method="noxattn"
        )
        adapters.append(
            {m: {**e, "up": e["up"] + (0.25 if i == 0 else -0.35)} for m, e in w.items()}
        )
    sampler = make_sampler(make_schedule(), "ddim", num_steps=3)
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    cond = jax.random.normal(jax.random.key(3), (2, 7, cfg.cross_attention_dim))
    uncond = jax.random.normal(jax.random.key(4), (2, 7, cfg.cross_attention_dim))
    lats = t2i.initial_latents(jax.random.key(5), 2, 64, 64, sampler.init_noise_sigma)
    scales = jnp.asarray([1.5, -1.0])
    sn = jnp.asarray([1000.0, 500.0])
    g = jnp.asarray([7.5, 3.0])
    y = fn(
        params, lats, cond, uncond, stack_sliders(adapters),
        scales, sn, g, jax.random.key(6), None,
    )
    for b in range(2):
        solo = fn(
            params, lats[b : b + 1], cond[b : b + 1], uncond[b : b + 1],
            adapters[b], scales[b : b + 1], sn[b : b + 1], g[b : b + 1],
            jax.random.key(6), None,
        )
        np.testing.assert_allclose(
            np.asarray(y[b]), np.asarray(solo[0]), atol=1e-4, rtol=1e-4
        )
