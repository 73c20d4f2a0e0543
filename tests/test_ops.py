"""Op-level parity vs torch — anchors every primitive the UNet is wired from
(the layerwise-fidelity strategy of SURVEY.md §7.4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sliders_tpu.ops import basic  # noqa: E402
from sliders_tpu.ops.attention import multihead_attention, causal_mask  # noqa: E402


def test_linear_parity(rng):
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    w = rng.standard_normal((24, 16), dtype=np.float32)
    b = rng.standard_normal((24,), dtype=np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    out = basic.linear({"weight": jnp.asarray(w.T), "bias": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("stride,pad,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1)])
def test_conv2d_parity(rng, stride, pad, k):
    x = rng.standard_normal((2, 6, 8, 8), dtype=np.float32)  # NCHW for torch
    w = rng.standard_normal((4, 6, k, k), dtype=np.float32)  # OIHW
    b = rng.standard_normal((4,), dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=pad)
    out = basic.conv2d(
        {"weight": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        stride=stride,
        padding=pad,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4
    )


def test_group_norm_parity(rng):
    x = rng.standard_normal((2, 32, 4, 4), dtype=np.float32)
    w = rng.standard_normal((32,), dtype=np.float32)
    b = rng.standard_normal((32,), dtype=np.float32)
    ref = F.group_norm(torch.from_numpy(x), 8, torch.from_numpy(w), torch.from_numpy(b), eps=1e-5)
    out = basic.group_norm(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        num_groups=8,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-5
    )


def test_layer_norm_parity(rng):
    x = rng.standard_normal((2, 7, 48), dtype=np.float32)
    w = rng.standard_normal((48,), dtype=np.float32)
    b = rng.standard_normal((48,), dtype=np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (48,), torch.from_numpy(w), torch.from_numpy(b))
    out = basic.layer_norm({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_parity(rng, causal):
    B, H, Lq, Lk, d = 2, 4, 6, 9, 8
    if causal:
        Lk = Lq
    q = rng.standard_normal((B, Lq, H * d), dtype=np.float32)
    k = rng.standard_normal((B, Lk, H * d), dtype=np.float32)
    v = rng.standard_normal((B, Lk, H * d), dtype=np.float32)

    def split(t, L):
        return torch.from_numpy(t).reshape(B, L, H, d).permute(0, 2, 1, 3)

    ref = F.scaled_dot_product_attention(
        split(q, Lq), split(k, Lk), split(v, Lk), is_causal=causal
    )
    ref = ref.permute(0, 2, 1, 3).reshape(B, Lq, H * d).numpy()

    mask = causal_mask(Lq) if causal else None
    out = multihead_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, mask=mask, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gelu_variants_parity(rng):
    x = torch.from_numpy(rng.standard_normal((64,), dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(basic.gelu(jnp.asarray(x.numpy()))), F.gelu(x).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(basic.quick_gelu(jnp.asarray(x.numpy()))),
        (x * torch.sigmoid(1.702 * x)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(basic.silu(jnp.asarray(x.numpy()))), F.silu(x).numpy(), atol=1e-6
    )


def test_timestep_embedding_formula():
    # independent closed form: emb[i] = t * exp(-ln(10000) * i / half)
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    dim = 32
    out = basic.timestep_embedding(t, dim)
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    ang = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_lora_linear_branch(rng):
    """LoRA branch math == reference lora.py:108-112:
    out = base(x) + up(down(x)) * multiplier * (alpha/rank)."""
    from sliders_tpu.ops.basic import SliderLora, linear

    x = jnp.asarray(rng.standard_normal((3, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((16, 8), dtype=np.float32))
    down = jnp.asarray(rng.standard_normal((16, 4), dtype=np.float32))
    up = jnp.asarray(rng.standard_normal((4, 8), dtype=np.float32))
    lora = SliderLora(
        weights={"m": {"down": down, "up": up, "alpha": jnp.asarray(1.0)}},
        multiplier=jnp.asarray(2.5),
    )
    base = np.asarray(x) @ np.asarray(w)
    expected = base + (np.asarray(x) @ np.asarray(down)) @ np.asarray(up) * 2.5 * (1.0 / 4)
    out = linear({"weight": w}, x, lora=lora, name="m")
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    # zero multiplier == slider off == base exactly
    out0 = linear({"weight": w}, x, lora=lora.with_multiplier(0.0), name="m")
    np.testing.assert_allclose(np.asarray(out0), base, atol=1e-6)
    # name miss -> base
    out_miss = linear({"weight": w}, x, lora=lora, name="other")
    np.testing.assert_allclose(np.asarray(out_miss), base, atol=1e-6)


def test_lora_conv_branch(rng):
    """Conv LoRA: down conv has base kernel/stride/padding, up is 1x1
    (reference lora.py:85-88)."""
    from sliders_tpu.ops.basic import SliderLora, conv2d

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4), dtype=np.float32))
    down = jnp.asarray(rng.standard_normal((3, 3, 6, 2), dtype=np.float32))
    up = jnp.asarray(rng.standard_normal((1, 1, 2, 4), dtype=np.float32))
    lora = SliderLora(
        weights={"c": {"down": down, "up": up, "alpha": jnp.asarray(2.0)}},
        multiplier=jnp.asarray(-1.0),
    )
    base = conv2d({"weight": w}, x, stride=2, padding=1)
    h = conv2d({"weight": down}, x, stride=2, padding=1)
    h = conv2d({"weight": up}, h, stride=1, padding=0)
    expected = np.asarray(base) + np.asarray(h) * (-1.0) * (2.0 / 2)
    out = conv2d({"weight": w}, x, stride=2, padding=1, lora=lora, name="c")
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
