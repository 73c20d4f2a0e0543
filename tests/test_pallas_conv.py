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


def test_conv2d_routing_integration_interpret():
    """The ops.basic.conv2d 'auto' routing branch (zero-bias synthesis + LoRA
    tail after the Pallas conv) — exercised on CPU via the 'interpret' impl
    (pallas_conv.set_interpret), value AND grad parity vs the XLA path."""
    from sliders_tpu.ops import basic

    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 128), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (3, 3, 128, 128), jnp.float32) * 0.05
    down = jax.random.normal(jax.random.key(3), (3, 3, 128, 2), jnp.float32) * 0.05
    up = jax.random.normal(jax.random.key(4), (1, 1, 2, 128), jnp.float32) * 0.05
    lw = {"conv": {"down": down, "up": up, "alpha": 1.0}}

    def run(p, lw):
        lora = basic.SliderLora(weights=lw, multiplier=jnp.asarray(1.0))
        return basic.conv2d(p, x, lora=lora, name="conv")

    def loss(p, lw):
        return jnp.sum(run(p, lw) ** 2)

    for p in ({"weight": w, "bias": jax.random.normal(jax.random.key(5), (128,))},
              {"weight": w}):  # no-bias: the routed branch synthesizes zeros
        ref_y = run(p, lw)
        ref_g = jax.grad(loss, argnums=1)(p, lw)
        pc.set_interpret(True)
        basic.set_conv_impl("interpret")
        try:
            assert pc.routed(x.shape, w.shape, 1, 4)
            got_y = run(p, lw)
            got_g = jax.grad(loss, argnums=1)(p, lw)
        finally:
            basic.set_conv_impl("xla")
            pc.set_interpret(False)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=2e-3, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=1e-3)


# ---------------------------------------------------------------------------
# fused resnet conv (round 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["none", "temb", "residual"])
def test_fused_conv3x3_parity_interpret(mode):
    """Fused GN-affine+SiLU prologue + conv + epilogue kernel vs the pure-XLA
    reference, interpret mode."""
    k = jax.random.key(0)
    B, H, W, C, N = 2, 8, 32, 64, 128
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, H, W, C), jnp.float32)
    a = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (B, C), jnp.float32)
    s = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (B, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 4), (3, 3, C, N), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 5), (N,), jnp.float32)
    extra = None
    if mode == "temb":
        extra = jax.random.normal(jax.random.fold_in(k, 6), (B, N), jnp.float32)
    elif mode == "residual":
        extra = jax.random.normal(jax.random.fold_in(k, 7), (B, H, W, N), jnp.float32)
    assert pc.fused_supports(x.shape, w.shape, 4, mode)
    got = pc.fused_conv3x3(x, a, s, w, b, extra, mode=mode, interpret=True)
    want = pc._fused_ref(x, a, s, w, b, extra, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_fused_resnet_block_parity_and_grad_interpret():
    """The whole _resnet fused path (2 stats passes + 2 fused kernels +
    shortcut) vs the plain path: value AND input-gradient parity — the
    backward recomputes through XLA (frozen-weight grads pruned in LoRA
    steps), so both directions must match."""
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic

    cfg = unet2d.TINY
    # TINY channels are too small for the kernel gate; build a block at
    # kernel-eligible dims directly
    k = jax.random.key(1)
    B, H, W, C, N = 2, 8, 32, 64, 128

    def dense_conv(kk, kh, kw, ci, co):
        return {
            "weight": jax.random.normal(kk, (kh, kw, ci, co), jnp.float32)
            * (ci * kh * kw) ** -0.5,
            "bias": 0.1 * jax.random.normal(jax.random.fold_in(kk, 9), (co,)),
        }

    p = {
        "norm1": {"weight": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (C,)),
                  "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (C,))},
        "conv1": dense_conv(jax.random.fold_in(k, 3), 3, 3, C, N),
        "time_emb_proj": {
            "weight": jax.random.normal(jax.random.fold_in(k, 4), (16, N)) * 0.25,
            "bias": jnp.zeros((N,)),
        },
        "norm2": {"weight": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 5), (N,)),
                  "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 6), (N,))},
        "conv2": dense_conv(jax.random.fold_in(k, 7), 3, 3, N, N),
        "conv_shortcut": dense_conv(jax.random.fold_in(k, 8), 1, 1, C, N),
    }
    x = jax.random.normal(jax.random.fold_in(k, 10), (B, H, W, C), jnp.float32)
    emb = jax.random.normal(jax.random.fold_in(k, 11), (B, 16), jnp.float32)
    import dataclasses

    rcfg = dataclasses.replace(cfg, norm_num_groups=8)

    def run(xx):
        return unet2d._resnet(p, xx, emb, rcfg, None, "blk")

    plain = run(x)
    plain_g = jax.grad(lambda xx: (run(xx) ** 2).sum())(x)
    try:
        basic.set_conv_impl("fused_interpret")
        assert unet2d._fused_resnet_eligible(p, x, None, "blk")
        fused = run(x)
        fused_g = jax.grad(lambda xx: (run(xx) ** 2).sum())(x)
    finally:
        basic.set_conv_impl("xla")
        pc.set_interpret(False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fused_g), np.asarray(plain_g), atol=5e-3, rtol=1e-2)


def test_fused_eligibility_gates():
    """LoRA on a block conv or non-fused impl must fall back to the plain
    path; small shapes are rejected by fused_supports."""
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic
    from sliders_tpu.ops.basic import SliderLora

    p = {"conv1": {"weight": jnp.zeros((3, 3, 64, 128))},
         "conv2": {"weight": jnp.zeros((3, 3, 128, 128))}}
    x = jnp.zeros((1, 8, 32, 64))
    assert not unet2d._fused_resnet_eligible(p, x, None, "blk")  # impl=xla
    try:
        basic.set_conv_impl("fused_interpret")
        assert unet2d._fused_resnet_eligible(p, x, None, "blk")
        lora = SliderLora(
            weights={"blk.conv1": {"down": jnp.zeros((3, 3, 64, 2)),
                                   "up": jnp.zeros((1, 1, 2, 128)),
                                   "alpha": jnp.asarray(1.0)}},
            multiplier=jnp.asarray(1.0),
        )
        assert not unet2d._fused_resnet_eligible(p, x, lora, "blk")
        assert not pc.fused_supports((1, 8, 8, 64), (3, 3, 64, 128), 4, "none")
    finally:
        basic.set_conv_impl("xla")


@pytest.mark.parametrize("mode", ["temb", "residual"])
def test_epi_conv3x3_parity_interpret(mode):
    """Epilogue-only fused conv (variant B) vs its XLA reference."""
    k = jax.random.key(0)
    B, H, W, C, N = 2, 8, 32, 64, 128
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, C, N), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 3), (N,), jnp.float32)
    extra = (
        jax.random.normal(jax.random.fold_in(k, 4), (B, N), jnp.float32)
        if mode == "temb"
        else jax.random.normal(jax.random.fold_in(k, 5), (B, H, W, N), jnp.float32)
    )
    assert pc.epi_supports(x.shape, w.shape, 4, mode)
    got = pc.epi_conv3x3(x, w, b, extra, mode=mode, interpret=True)
    want = pc._epi_ref(x, w, b, extra, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_epi_resnet_block_parity_and_grad_interpret():
    """The per-conv epilogue routing inside _resnet (impl 'fused_ep'): value
    + input-grad parity with the plain path, including the mixed case where
    one conv takes the kernel and the other falls back."""
    import dataclasses

    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic

    k = jax.random.key(1)
    B, H, W, C, N = 2, 8, 32, 64, 128

    def dense_conv(kk, kh, kw, ci, co):
        return {
            "weight": jax.random.normal(kk, (kh, kw, ci, co), jnp.float32)
            * (ci * kh * kw) ** -0.5,
            "bias": 0.1 * jax.random.normal(jax.random.fold_in(kk, 9), (co,)),
        }

    p = {
        "norm1": {"weight": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (C,)),
                  "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (C,))},
        "conv1": dense_conv(jax.random.fold_in(k, 3), 3, 3, C, N),
        "time_emb_proj": {
            "weight": jax.random.normal(jax.random.fold_in(k, 4), (16, N)) * 0.25,
            "bias": jnp.zeros((N,)),
        },
        "norm2": {"weight": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 5), (N,)),
                  "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 6), (N,))},
        "conv2": dense_conv(jax.random.fold_in(k, 7), 3, 3, N, N),
        "conv_shortcut": dense_conv(jax.random.fold_in(k, 8), 1, 1, C, N),
    }
    x = jax.random.normal(jax.random.fold_in(k, 10), (B, H, W, C), jnp.float32)
    emb = jax.random.normal(jax.random.fold_in(k, 11), (B, 16), jnp.float32)
    rcfg = dataclasses.replace(unet2d.TINY, norm_num_groups=8)

    def run(xx):
        return unet2d._resnet(p, xx, emb, rcfg, None, "blk")

    plain = run(x)
    plain_g = jax.grad(lambda xx: (run(xx) ** 2).sum())(x)
    try:
        basic.set_conv_impl("fused_ep_interpret")
        ep = run(x)
        ep_g = jax.grad(lambda xx: (run(xx) ** 2).sum())(x)
    finally:
        basic.set_conv_impl("xla")
        pc.set_interpret(False)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(plain), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ep_g), np.asarray(plain_g), atol=5e-3, rtol=1e-2)
