"""Fused GroupNorm Pallas kernel: interpret-mode parity with the reference
f32-statistics formula (ops/basic.group_norm), forward and grad."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.ops import pallas_groupnorm as pg

# the fused-GN kernel is an unrouted recorded experiment (BASELINE.md); its
# interpret-mode compiles are heavy, so the whole module runs in the slow tier
pytestmark = pytest.mark.slow


def _ref(x, w, b, groups, eps, act_silu):
    B, L, C = x.shape
    xg = x.reshape(B, L, groups, C // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    out = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, L, C).astype(x.dtype)
    out = out * w + b
    if act_silu:
        out = jax.nn.silu(out)
    return out


def test_supports_policy():
    assert pg.supports((2, 64, 64, 320), 32)  # SD level-0
    assert pg.supports((2, 4096, 320), 32)
    assert pg.supports((2, 16, 16, 1280), 32)
    assert not pg.supports((2, 64, 64, 321), 32)  # channels not divisible
    assert not pg.supports((2, 128, 128, 512), 32)  # slab exceeds VMEM plan
    assert not pg.supports((64, 64), 32)  # wrong rank


@pytest.mark.parametrize("act_silu", [False, True])
@pytest.mark.parametrize("shape,groups", [((2, 256, 64), 8), ((1, 1024, 96), 32)])
def test_fused_matches_reference(shape, groups, act_silu):
    B, L, C = shape
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (B, L, C), jnp.float32) * 2.0 + 0.5
    w = jax.random.normal(ks[1], (C,), jnp.float32)
    b = jax.random.normal(ks[2], (C,), jnp.float32)

    out = pg.fused_group_norm(x, w, b, groups, 1e-5, act_silu, True)
    ref = _ref(x, w, b, groups, 1e-5, act_silu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = jax.grad(lambda x: pg.fused_group_norm(x, w, b, groups, 1e-5, act_silu, True).sum())(x)
    g_ref = jax.grad(lambda x: _ref(x, w, b, groups, 1e-5, act_silu).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_param_grads_match():
    B, L, C, groups = 2, 256, 64, 8
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, L, C), jnp.float32)
    w = jax.random.normal(ks[1], (C,), jnp.float32)
    b = jax.random.normal(ks[2], (C,), jnp.float32)
    gw, gb = jax.grad(
        lambda w, b: pg.fused_group_norm(x, w, b, groups, 1e-5, True, True).sum(),
        argnums=(0, 1),
    )(w, b)
    gw_r, gb_r = jax.grad(
        lambda w, b: _ref(x, w, b, groups, 1e-5, True).sum(), argnums=(0, 1)
    )(w, b)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), atol=1e-4)
