"""Flash-attention dispatch policy + numerics (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.ops import flash_attention as fa
from sliders_tpu.ops.attention import multihead_attention, xla_attention


def test_supports_policy():
    # FLUX joint attention shapes qualify (d=128)
    assert fa.supports((2, 24, 4096, 128), (2, 24, 4096, 128))
    assert fa.supports((1, 24, 1024, 128), (1, 24, 1024, 128))
    # SD/SDXL head dims pad the 128-lane registers -> XLA path (measured faster)
    assert not fa.supports((2, 8, 4096, 40), (2, 8, 4096, 40))
    assert not fa.supports((2, 10, 1024, 64), (2, 10, 1024, 64))
    assert not fa.supports((2, 24, 4096, 128), (2, 24, 77, 128))  # cross-attn
    assert not fa.supports((2, 24, 256, 128), (2, 24, 256, 128))  # too small
    assert not fa.supports((2, 24, 4160, 128), (2, 24, 4160, 128))  # not /128
    assert not fa.supports((2, 16, 64), (2, 16, 64))  # wrong rank
    assert not fa.supports((2, 8, 1024, 160), (2, 8, 1024, 160))  # bad head dim


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
