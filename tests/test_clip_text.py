"""CLIP text encoder parity vs transformers (torch, CPU, random weights).

This is the layerwise-fidelity gate SURVEY.md §7.4 calls for: identical
numerics to the reference's text encoding path
(train_util.encode_prompts / text_encode_xl)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sliders_tpu.models import clip_text  # noqa: E402
from sliders_tpu.models.convert import convert_state_dict, to_torch_layout  # noqa: E402


def _make_torch_model(with_projection: bool):
    cfg = transformers.CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=16,
        projection_dim=24,
        # anything but 2 so transformers uses the first-eos pooling branch
        eos_token_id=99,
        bos_token_id=98,
        pad_token_id=99,
        hidden_act="quick_gelu",
    )
    cls = (
        transformers.CLIPTextModelWithProjection
        if with_projection
        else transformers.CLIPTextModel
    )
    torch.manual_seed(0)
    return cls(cfg).eval()


def _ids(batch=2, length=16):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(batch, length))
    ids[:, 0] = 98
    ids[0, 7:] = 99  # eos + padding
    ids[1, 12:] = 99
    return ids.astype(np.int64)


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_parity_vs_transformers(with_projection):
    model = _make_torch_model(with_projection)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(state)

    ids = _ids()
    with torch.no_grad():
        ref = model(torch.from_numpy(ids), output_hidden_states=True)

    cfg = clip_text.TINY
    out = clip_text.apply(params, jnp.asarray(ids), cfg)

    if with_projection:
        ref_last = ref.last_hidden_state.numpy()
    else:
        ref_last = ref.last_hidden_state.numpy()
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref_last, atol=2e-5
    )
    # penultimate hidden state — the SDXL contract (train_util.py:101)
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]),
        ref.hidden_states[-2].numpy(),
        atol=2e-5,
    )
    if with_projection:
        np.testing.assert_allclose(
            np.asarray(out["text_embeds"]), ref.text_embeds.numpy(), atol=2e-5
        )
    else:
        np.testing.assert_allclose(
            np.asarray(out["pooler_output"]), ref.pooler_output.numpy(), atol=2e-5
        )


def test_clip_skip_truncation():
    """num_layers override == loading the model with fewer hidden layers
    (reference clip_skip, model_util.py:48,62): running our 2-layer model
    with num_layers=1 must equal a torch model truncated to 1 layer."""
    model = _make_torch_model(False)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    # build a 1-layer torch model with the same first-layer weights
    cfg1 = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, eos_token_id=99, bos_token_id=98,
        pad_token_id=99, hidden_act="quick_gelu",
    )
    model1 = transformers.CLIPTextModel(cfg1).eval()
    sd1 = {k: torch.from_numpy(v) for k, v in state.items() if "layers.1." not in k}
    model1.load_state_dict(sd1)

    ids = _ids()
    with torch.no_grad():
        ref = model1(torch.from_numpy(ids))
    params = convert_state_dict(state)
    out = clip_text.apply(params, jnp.asarray(ids), clip_text.TINY, num_layers=1)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref.last_hidden_state.numpy(), atol=2e-5
    )


def test_convert_roundtrip():
    model = _make_torch_model(True)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    back = to_torch_layout(convert_state_dict(state))
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_init_params_shapes_match_converted():
    model = _make_torch_model(True)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    converted = convert_state_dict(state)
    ours = clip_text.init_params(jax.random.key(0), clip_text.TINY)

    from sliders_tpu.utils import pytree

    flat_c = pytree.flatten(converted)
    flat_o = pytree.flatten(ours)
    # transformers also stores position_ids buffers in some versions; ignore
    flat_c = {k: v for k, v in flat_c.items() if not k.endswith("position_ids")}
    assert set(flat_c) == set(flat_o)
    for k in flat_c:
        assert flat_c[k].shape == flat_o[k].shape, k
