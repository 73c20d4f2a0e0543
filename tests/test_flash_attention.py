"""Flash-attention dispatch policy + numerics (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.ops import flash_attention as fa
from sliders_tpu.ops import pallas_attention as pa
from sliders_tpu.ops.attention import multihead_attention, xla_attention


def test_supports_policy():
    # FLUX joint attention shapes qualify for the stock kernel (d=128)
    assert fa.supports((2, 24, 4096, 128), (2, 24, 4096, 128))
    assert fa.supports((1, 24, 1024, 128), (1, 24, 1024, 128))
    # SD/SDXL head dims route to the custom SD kernel, not the stock one
    assert not fa.supports((2, 8, 4096, 40), (2, 8, 4096, 40))
    assert not fa.supports((2, 10, 1024, 64), (2, 10, 1024, 64))
    assert not fa.supports((2, 24, 4096, 128), (2, 24, 77, 128))  # cross-attn
    assert not fa.supports((2, 24, 256, 128), (2, 24, 256, 128))  # too small
    assert not fa.supports((2, 24, 4160, 128), (2, 24, 4160, 128))  # not /128
    assert not fa.supports((2, 16, 64), (2, 16, 64))  # wrong rank
    assert not fa.supports((2, 8, 1024, 160), (2, 8, 1024, 160))  # bad head dim


def test_sd_kernel_supports_policy():
    # the SD1.5/SDXL hot shapes (512px level0/1, 1024px SDXL levels)
    assert pa.supports((2, 8, 4096, 40), (2, 8, 4096, 40))
    assert pa.supports((2, 8, 1024, 80), (2, 8, 1024, 80))
    assert pa.supports((2, 10, 4096, 64), (2, 10, 4096, 64))
    # FLUX joint attention (d=128): measured faster than BOTH XLA and the
    # stock flash kernel on v5e (BASELINE.md round-2), so it's ours too
    assert pa.supports((2, 24, 4096, 128), (2, 24, 4096, 128))
    assert pa.supports((1, 24, 1536, 128), (1, 24, 1536, 128))  # 512px FLUX joint
    assert not pa.supports((2, 8, 4096, 40), (2, 8, 77, 40))  # cross-attn
    assert not pa.supports((2, 8, 256, 160), (2, 8, 256, 160))  # tiny L
    assert not pa.supports((2, 8, 1024, 160), (2, 8, 1024, 160))  # d > 128 lanes
    # longer sequences drop to a smaller q block instead of rejecting
    assert pa.supports((2, 8, 8192, 40), (2, 8, 8192, 40))
    assert pa.pick_block_q(8192, 8192) == 128
    # f32 inputs double the K/V footprint -> smaller blocks (the f32
    # sweep generator compile-OOM'd before dtype-aware budgeting)
    assert pa.pick_block_q(4096, 4096, itemsize=4) == 256
    assert not pa.supports_bwd((2, 8, 4096, 40), (2, 8, 4096, 40), itemsize=4)
    # but whole-K/V residency has a hard ceiling
    assert not pa.supports((2, 8, 16384, 40), (2, 8, 16384, 40))


@pytest.mark.slow
@pytest.mark.parametrize(
    "shape",
    [(2, 8, 1024, 40), (1, 2, 1024, 64), (2, 4, 2048, 80), (1, 2, 1536, 128)],
)
def test_sd_kernel_matches_xla_interpret(shape):
    """Custom SD attention kernel (interpret mode): exact-softmax parity with
    the XLA reference path, forward AND grad (custom-vjp recompute)."""
    B, H, L, d = shape
    q = jax.random.normal(jax.random.key(0), (B, H, L, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, H, L, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, H, L, d), jnp.float32)
    ref = xla_attention(q, k, v)
    out = pa.sd_attention(q, k, v, 512, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_ref = jax.grad(lambda q: xla_attention(q, k, v).sum())(q)
    g = jax.grad(lambda q: pa.sd_attention(q, k, v, 512, True).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("d", [64, 128])
def test_flash_matches_xla_interpret(d):
    """Run the pallas kernel in interpret mode on CPU and compare to the XLA
    softmax-attention path."""
    from jax.experimental.pallas import tpu as pltpu

    B, H, L = 1, 2, 1024
    q = jax.random.normal(jax.random.key(0), (B, H, L, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, H, L, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, H, L, d), jnp.float32)
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(2, 1024, 8, 40), (1, 1536, 2, 128)])
def test_sd_kernel_blhd_matches_xla_interpret(shape):
    """Head-minor (B, L, H, d) kernel entry: parity with the XLA path,
    forward and grad."""
    B, L, H, d = shape
    q = jax.random.normal(jax.random.key(0), (B, L, H, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, L, H, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, L, H, d), jnp.float32)

    def ref(q, k, v):
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(xla_attention(t(q), t(k), t(v)))

    out = pa.sd_attention_blhd(q, k, v, 512, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)), atol=1e-5)

    g_ref = jax.grad(lambda q: ref(q, k, v).sum())(q)
    g = jax.grad(lambda q: pa.sd_attention_blhd(q, k, v, 512, True).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 4, 1024, 40), (1, 2, 1536, 128)])
def test_sd_kernel_bwd_all_grads_interpret(shape):
    """Pallas backward kernel (dq + accumulated dk/dv across q-block grid
    steps): parity with the XLA VJP on all three gradients, with a
    non-trivial cotangent."""
    B, H, L, d = shape
    assert pa.supports_bwd((B, H, L, d), (B, H, L, d))
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (B, H, L, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, d), jnp.float32)
    ct = jax.random.normal(ks[3], (B, H, L, d), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(pa.sd_attention(q, k, v, 512, True) * ct)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=f"d{name}"
        )


def test_sd_kernel_bwd_supports_policy():
    assert pa.supports_bwd((2, 8, 4096, 40), (2, 8, 4096, 40))
    assert pa.supports_bwd((1, 24, 4096, 128), (1, 24, 4096, 128))
    assert not pa.supports_bwd((2, 8, 4096, 40), (2, 8, 77, 40))  # cross
    assert not pa.supports_bwd((2, 8, 8192, 40), (2, 8, 8192, 40))  # VMEM
    assert not pa.supports_bwd((2, 8, 1024, 160), (2, 8, 1024, 160))  # d>128
