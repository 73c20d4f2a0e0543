"""LoRA network targeting, init, and checkpoint-interop tests.

Targeting counts are derived from the reference's create_modules semantics
(lora.py:164-218) applied to the SD1.5 architecture: 16 Transformer2DModels
x1 basic block -> 32 Attention parents -> 4 linears each."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.lora import network as lnet
from sliders_tpu.lora import io as lio
from sliders_tpu.models import unet2d


@pytest.fixture(scope="module")
def sd15_paramshapes():
    # structure only — eval_shape avoids materializing 859M params
    return jax.eval_shape(lambda k: unet2d.init_params(k, unet2d.SD15), jax.random.key(0))


@pytest.mark.parametrize(
    "network_type,train_method,expected",
    [
        ("lierla", "full", 128),  # 32 attn modules x 4 projections
        ("lierla", "noxattn", 64),  # attn1 only
        ("lierla", "selfattn", 64),
        ("lierla", "innoxattn", 64),
        ("lierla", "xattn", 64),  # attn2 only
        ("lierla", "xattn-strict", 48),  # attn2 minus to_out
        ("lierla", "noxattn-hspace", 4),  # mid-block attn1 only
    ],
)
def test_sd15_target_counts(sd15_paramshapes, network_type, train_method, expected):
    paths = lnet.target_module_paths(sd15_paramshapes, network_type, train_method)
    assert len(paths) == expected


def test_sd15_c3lier_adds_conv_targets(sd15_paramshapes):
    lierla = set(lnet.target_module_paths(sd15_paramshapes, "lierla", "full"))
    c3 = set(lnet.target_module_paths(sd15_paramshapes, "c3lier", "full"))
    extra = c3 - lierla
    # 22 resnets x (conv1, conv2, time_emb_proj) + 14 shortcuts + 3 down + 3 up
    assert len(extra) == 22 * 3 + 14 + 3 + 3
    assert all(
        any(s in p for s in ("conv", "time_emb_proj", "samplers")) for p in extra
    )


def test_noxattn_hspace_last(sd15_paramshapes):
    paths = lnet.target_module_paths(sd15_paramshapes, "c3lier", "noxattn-hspace-last")
    assert paths == ["mid_block.resnets.1.conv2"]


def test_sdxl_counts():
    shapes = jax.eval_shape(lambda k: unet2d.init_params(k, unet2d.SDXL), jax.random.key(0))
    # 70 basic transformer blocks (4+20+10+30+6) x 2 attns x 4 projections
    assert len(lnet.target_module_paths(shapes, "lierla", "full")) == 560
    assert len(lnet.target_module_paths(shapes, "lierla", "noxattn")) == 280


@pytest.fixture(scope="module")
def tiny_net():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    weights = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, alpha=1.0,
        train_method="full", network_type="c3lier",
    )
    return params, weights


def test_init_semantics(tiny_net):
    _, weights = tiny_net
    for module, w in weights.items():
        # up zero-init (lora.py:98), alpha constant
        assert float(jnp.abs(w["up"]).max()) == 0.0
        assert float(w["alpha"]) == 1.0
        assert float(jnp.abs(w["down"]).max()) > 0.0
        if w["down"].ndim == 2:
            d_in, r = w["down"].shape
            assert r == 4
            # kaiming-uniform(a=1) bound = sqrt(3/fan_in)
            assert float(jnp.abs(w["down"]).max()) <= np.sqrt(3.0 / d_in) + 1e-6


def test_conv_rank_clamp():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    weights = lnet.create_slider_network(
        jax.random.key(1), params, rank=128, train_method="full", network_type="c3lier"
    )
    for module, w in weights.items():
        if w["down"].ndim == 4:  # conv: clamped to min(rank, in, out)
            kh, kw, d_in, r = w["down"].shape
            d_out = w["up"].shape[-1]
            assert r == min(128, d_in, d_out)
            assert float(w["alpha"]) == 1.0
        else:
            assert w["down"].shape[-1] == 128


def test_alpha_zero_defaults_to_rank():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    weights = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, alpha=0, train_method="xattn"
    )
    assert all(float(w["alpha"]) == 4.0 for w in weights.values())


@pytest.mark.parametrize("ext", [".safetensors", ".pt"])
def test_checkpoint_roundtrip(tmp_path, tiny_net, ext):
    params, weights = tiny_net
    # make up nonzero so the roundtrip is meaningful
    weights = jax.tree.map(lambda x: x + 0.25, weights)
    f = str(tmp_path / f"slider{ext}")
    lio.save_slider(f, weights)
    loaded = lio.load_slider(f, params)
    assert set(loaded) == set(weights)
    for m in weights:
        for k in ("down", "up", "alpha"):
            np.testing.assert_allclose(
                np.asarray(loaded[m][k]), np.asarray(weights[m][k]), atol=1e-6
            )


def test_reference_key_convention(tiny_net):
    _, weights = tiny_net
    state = lio.to_reference_state_dict(weights)
    some = [k for k in state if "attn1" in k and k.endswith("lora_down.weight")][0]
    # e.g. lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q
    assert some.startswith("lora_unet_")
    assert "." not in some[: -len(".lora_down.weight")]
    # torch layouts: linear down is (rank, in)
    q = state["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight"]
    assert q.shape[0] == 4  # rank first
    # conv lora down is OIHW with O=rank, up is (out, rank, 1, 1)
    conv_keys = [k for k in state if "conv1.lora_down" in k]
    assert conv_keys
    cd = state[conv_keys[0]]
    assert cd.ndim == 4 and cd.shape[0] == 4 and cd.shape[2:] == (3, 3)
    cu = state[conv_keys[0].replace("lora_down", "lora_up")]
    assert cu.shape[2:] == (1, 1)


def test_load_reference_trained_checkpoint(tmp_path, tiny_net):
    """A checkpoint written with torch in the reference's exact format loads
    back into our pytree (the interop contract, SURVEY.md §5.4)."""
    torch = pytest.importorskip("torch")
    params, weights = tiny_net
    state = lio.to_reference_state_dict(weights)
    f = str(tmp_path / "ref_style.pt")
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, f)
    loaded = lio.load_slider(f, params)
    assert set(loaded) == set(weights)


def test_trainable_mask(tiny_net):
    _, weights = tiny_net
    mask = lnet.trainable_mask(weights)
    assert jax.tree.structure(mask) == jax.tree.structure(
        jax.tree.map(lambda _: True, weights)
    )
    m = next(iter(mask.values()))
    assert m["down"] and m["up"] and not m["alpha"]
