"""Multi-slider composition (lora/compose.py): rank-concat == sum of deltas.

The semantic ground truth for "slider A at s_a plus slider B at s_b" is the
sequentially merged model (each adapter's scaled delta added to the targeted
weights — what nesting the reference's monkey-patched forwards computes,
trainscripts/textsliders/lora.py:103-112). Every path through the composed
adapter must match that."""

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.lora import network as lnet
from sliders_tpu.lora.compose import compose_sliders
from sliders_tpu.lora.merge import lora_deltas, merge_lora_weights
from sliders_tpu.models import unet2d
from sliders_tpu.ops.basic import SliderLora


def _two_adapters(params):
    # different ranks, alphas, and target sets (partial overlap: selfattn's
    # attn1 targets are a subset of noxattn's)
    a = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, alpha=1.0, train_method="noxattn"
    )
    b = lnet.create_slider_network(
        jax.random.key(2), params, rank=2, alpha=4.0, train_method="selfattn"
    )
    bump = lambda w: {
        m: {"down": e["down"] + 0.03, "up": e["up"] + 0.05, "alpha": e["alpha"]}
        for m, e in w.items()
    }
    return bump(a), bump(b)


def test_composed_deltas_are_sum_of_scaled_deltas():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    wa, wb = _two_adapters(params)
    sa, sb = 1.7, -0.6
    composed = compose_sliders([(wa, sa), (wb, sb)])

    da = lora_deltas(wa, sa)
    db = lora_deltas(wb, sb)
    dc = lora_deltas(composed, 1.0)
    assert set(dc) == set(da) | set(db)
    for name, delta in dc.items():
        want = da.get(name, 0.0) + db.get(name, 0.0)
        np.testing.assert_allclose(
            np.asarray(delta), np.asarray(want), atol=1e-6, rtol=1e-5
        )
    # conv entries (4D down) must be among the composed names for c3lier-free
    # methods only when targeted; noxattn targets Attention parents only, so
    # all entries here are linear — shape sanity on the rank axis instead:
    shared = set(wa) & set(wb)
    assert shared, "expected overlapping targets between noxattn and selfattn"
    name = sorted(shared)[0]
    assert composed[name]["down"].shape[-1] == 4 + 2
    assert float(composed[name]["alpha"]) == 6.0


def test_composed_conv_entries():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    wa = lnet.create_slider_network(
        jax.random.key(1), params, rank=2, alpha=1.0,
        train_method="full", network_type="c3lier",
    )
    wa = {m: {**e, "up": e["up"] + 0.1} for m, e in wa.items()}
    conv_names = [m for m, e in wa.items() if e["down"].ndim == 4]
    assert conv_names, "c3lier full should target convs"
    composed = compose_sliders([(wa, 0.8), (wa, -0.3)])
    dc = lora_deltas(composed, 1.0)
    da = lora_deltas(wa, 0.5)  # 0.8 - 0.3
    for name in conv_names:
        np.testing.assert_allclose(
            np.asarray(dc[name]), np.asarray(da[name]), atol=1e-6, rtol=1e-5
        )


def test_composed_branch_forward_matches_sequential_merge():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    wa, wb = _two_adapters(params)
    sa, sb = 1.2, -0.8
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(4), (2, 7, cfg.cross_attention_dim))
    t = jnp.array([500.0, 100.0])

    want = unet2d.apply(
        merge_lora_weights(merge_lora_weights(params, wa, sa), wb, sb),
        cfg, x, t, ehs,
    )
    composed = compose_sliders([(wa, sa), (wb, sb)])
    got = unet2d.apply(
        params, cfg, x, t, ehs,
        lora=SliderLora(weights=composed, multiplier=jnp.asarray(1.0)),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)

    # multiplier 0 gates the whole composition off (start_noise semantics)
    off = unet2d.apply(
        params, cfg, x, t, ehs,
        lora=SliderLora(weights=composed, multiplier=jnp.asarray(0.0)),
    )
    base = unet2d.apply(params, cfg, x, t, ehs)
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), atol=1e-6)


def test_rescaling_composition_reuses_compiled_sampler():
    """Changing per-slider scales changes array values, not shapes — the
    jitted sampler must not retrace."""
    from sliders_tpu.diffusion import schedulers
    from sliders_tpu.pipelines import text2image

    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    wa, wb = _two_adapters(params)
    sampler = schedulers.make_sampler(
        schedulers.make_schedule(), "ddim", num_steps=2
    )
    fn = text2image.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    lat = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    emb = jax.random.normal(jax.random.key(6), (1, 7, cfg.cross_attention_dim))

    outs = []
    for sa in (0.5, 2.0):
        composed = compose_sliders([(wa, sa), (wb, 1.0)])
        outs.append(
            fn(params, lat, emb, emb, composed, jnp.asarray(1.0),
               jnp.asarray(1000.0), jnp.asarray(7.5), jax.random.key(7))
        )
    assert fn._cache_size() == 1
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
