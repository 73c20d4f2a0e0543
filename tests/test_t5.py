"""T5 encoder parity vs transformers (tiny config, random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from sliders_tpu.models import t5  # noqa: E402
from sliders_tpu.models.convert import convert_state_dict  # noqa: E402

pytestmark = pytest.mark.slow


def test_t5_encoder_parity():
    cfg = transformers.T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(state)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    out = t5.apply(params, jnp.asarray(ids), t5.TINY, attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_t5_relative_bucket_properties():
    from sliders_tpu.models.t5 import _relative_position_bucket

    rp = np.arange(-10, 11)
    b = _relative_position_bucket(rp)
    assert b.min() >= 0 and b.max() < 32
    assert b[10] == 0  # zero distance -> bucket 0
    # future positions land in the upper half
    assert (b[11:] >= 16).all()
