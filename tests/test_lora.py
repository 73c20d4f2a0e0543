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


# ---------------------------------------------------------------------------
# reference-side interop: state dicts built WITHOUT lora/io.py's writer
# ---------------------------------------------------------------------------

# literal reference key strings + torch layouts transcribed from the
# reference's LoRAModule/save_weights (lora.py:70-96,206-207,231-248) —
# deliberately NOT derived through lio.to_reference_state_dict, so this
# pins the interop contract from the OTHER side (VERDICT r4 item 7)
_REF_ENTRIES = {
    "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_q":
        ("mid_block.attentions.0.transformer_blocks.0.attn1.to_q",
         "linear", 64, 64, None),
    "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k":
        ("mid_block.attentions.0.transformer_blocks.0.attn2.to_k",
         "linear", 32, 64, None),
    "lora_unet_mid_block_resnets_0_conv1":
        ("mid_block.resnets.0.conv1", "conv", 64, 64, 3),
    "lora_unet_up_blocks_0_resnets_0_conv_shortcut":
        ("up_blocks.0.resnets.0.conv_shortcut", "conv", 128, 64, 1),
}
_REF_RANK = 2


def _hand_built_reference_state(seed=1234, dtype=None):
    """torch state dict in the reference's exact save format, hand-built:
    keys `lora_unet_<path with dots->underscores>.{lora_down.weight,
    lora_up.weight,alpha}`, linear down (rank, in) / up (out, rank),
    conv down OIHW (rank, in, k, k) / up (out, rank, 1, 1), alpha a
    scalar tensor."""
    import torch

    rng = np.random.default_rng(seed)
    dt = dtype or torch.float16
    state = {}
    for flat, (_, kind, c_in, c_out, k) in _REF_ENTRIES.items():
        if kind == "linear":
            down = rng.normal(size=(_REF_RANK, c_in), scale=0.2)
            up = rng.normal(size=(c_out, _REF_RANK), scale=0.2)
        else:
            down = rng.normal(size=(_REF_RANK, c_in, k, k), scale=0.2)
            up = rng.normal(size=(c_out, _REF_RANK, 1, 1), scale=0.2)
        state[f"{flat}.lora_down.weight"] = torch.from_numpy(
            down.astype(np.float32)).to(dt)
        state[f"{flat}.lora_up.weight"] = torch.from_numpy(
            up.astype(np.float32)).to(dt)
        state[f"{flat}.alpha"] = torch.tensor(1.0, dtype=dt)
    return state


def _assert_loaded_matches_hand_built(loaded, state):
    import torch

    assert set(loaded) == {p for p, *_ in _REF_ENTRIES.values()} | set()
    for flat, (path, kind, *_rest) in _REF_ENTRIES.items():
        w = loaded[path]
        down_t = state[f"{flat}.lora_down.weight"].float().numpy()
        up_t = state[f"{flat}.lora_up.weight"].float().numpy()
        if kind == "linear":
            np.testing.assert_array_equal(np.asarray(w["down"]), down_t.T)
            np.testing.assert_array_equal(np.asarray(w["up"]), up_t.T)
        else:
            np.testing.assert_array_equal(
                np.asarray(w["down"]), down_t.transpose(2, 3, 1, 0))
            np.testing.assert_array_equal(
                np.asarray(w["up"]), up_t.transpose(2, 3, 1, 0))
        assert float(w["alpha"]) == 1.0


def test_hand_built_reference_checkpoint_loads_and_samples(tmp_path):
    """A .pt hand-built in the reference's save format (no lora/io.py
    writer involved) loads into the right modules with the right layouts
    and actually steers sampling."""
    torch = pytest.importorskip("torch")
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.pipelines import text2image as t2i

    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    state = _hand_built_reference_state()
    f = str(tmp_path / "hand_built.pt")
    torch.save(state, f)
    loaded = lio.load_slider(f, params)
    _assert_loaded_matches_hand_built(loaded, state)

    # the adapter steers sampling (scale 1 != scale 0 latents), and loading
    # the safetensors flavor of the same state gives identical weights
    sampler = make_sampler(make_schedule(), "ddim", 3)
    fn = t2i.make_sampling_fn(unet2d.TINY, sampler, compute_dtype=jnp.float32)
    cond = jax.random.normal(jax.random.key(1), (1, 7, 32))
    uncond = jnp.zeros_like(cond)
    lats = t2i.initial_latents(jax.random.key(2), 1, 64, 64,
                               sampler.init_noise_sigma)
    outs = {}
    for s in (0.0, 1.0):
        outs[s] = np.asarray(fn(
            params, lats, cond, uncond, loaded, jnp.asarray(s),
            jnp.asarray(1000.0), jnp.asarray(7.5), jax.random.key(3),
        ))
    assert np.abs(outs[0.0] - outs[1.0]).max() > 0

    from safetensors.numpy import save_file

    st_f = str(tmp_path / "hand_built.safetensors")
    save_file({k: v.float().numpy() for k, v in state.items()}, st_f)
    loaded_st = lio.load_slider(st_f, params)
    for m in loaded:
        for k in ("down", "up", "alpha"):
            np.testing.assert_array_equal(
                np.asarray(loaded[m][k]), np.asarray(loaded_st[m][k]))


def test_committed_reference_fixture_loads():
    """The committed fixture (tests/fixtures/reference_slider_tiny.pt,
    generated once by _hand_built_reference_state(seed=1234)) keeps loading
    byte-exactly — guards the loader against drift even if the hand-builder
    above is ever edited."""
    import os

    torch = pytest.importorskip("torch")
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_slider_tiny.pt")
    assert os.path.exists(fix), "run tests/gen_reference_fixture.py"
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    loaded = lio.load_slider(fix, params)
    _assert_loaded_matches_hand_built(loaded, _hand_built_reference_state())
