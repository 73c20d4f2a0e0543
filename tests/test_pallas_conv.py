"""Pallas 3x3 conv kernel (ops/pallas_conv.py): interpret-mode parity with
XLA's conv + bias, plus the supports()/VMEM-budget routing policy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.ops import pallas_conv as pc

pytestmark = pytest.mark.slow


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 128, 128),   # single N-tile
        (1, 8, 8, 256, 256),     # bottleneck-ish
        (1, 8, 8, 512, 256),     # C != N, N-tiled
    ],
)
def test_conv3x3_parity_interpret(shape):
    B, H, W, C, N = shape
    x = jax.random.normal(jax.random.key(1), (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (3, 3, C, N), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.key(3), (N,), jnp.float32)
    assert pc.supports(x.shape, w.shape, itemsize=4)
    got = pc.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, w, b)), atol=2e-3, rtol=1e-4
    )


def test_conv3x3_no_bias_interpret():
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (3, 3, 128, 128), jnp.float32) * 0.05
    got = pc.conv3x3(x, w, None, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_supports_policy():
    # 3x3 stride-1 SAME with lane-sized channels: yes
    assert pc.supports((2, 64, 64, 320), (3, 3, 320, 320))
    assert pc.supports((2, 8, 8, 2560), (3, 3, 2560, 1280))
    # stride 2: no
    assert not pc.supports((2, 64, 64, 320), (3, 3, 320, 320), stride=2)
    # 1x1: no (XLA matmul path is fine)
    assert not pc.supports((2, 64, 64, 320), (1, 1, 320, 320))
    # lane-starved stem / head convs: no
    assert not pc.supports((2, 64, 64, 4), (3, 3, 4, 320))
    assert not pc.supports((2, 64, 64, 320), (3, 3, 320, 4))
    # 1024px level-0 (130x130x320 image = 21 MB > VMEM): no
    assert not pc.supports((2, 128, 128, 320), (3, 3, 320, 320))
