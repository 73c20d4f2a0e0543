"""ptp attention-control equivalent: per-call-site attention probability
taps + reference-layout store + word-index aggregation
(ptp_utils.py:173-240,243-295)."""

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.models import unet2d
from sliders_tpu.pipelines import attention_control as ac


def test_attention_maps_extraction_and_aggregation():
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    fn = ac.make_attention_maps_fn(cfg)

    B, HW = 2, 16
    x = jax.random.normal(jax.random.key(1), (B, HW, HW, cfg.in_channels), jnp.float32)
    ehs = jax.random.normal(jax.random.key(2), (B, 7, cfg.cross_attention_dim), jnp.float32)
    eps, raw = fn(params, x, jnp.asarray([1.0, 2.0]), ehs)

    assert eps.shape == (B, HW, HW, cfg.out_channels)
    # TINY: down0 has 1 attention (attn1+attn2), mid 1, up1 has 2 -> 4 sites x2
    attn1 = [k for k in raw if k.endswith("attn1")]
    attn2 = [k for k in raw if k.endswith("attn2")]
    assert len(attn1) == len(attn2) == 4
    # probs are (B, H, Lq, Lkv) and rows sum to 1
    some_cross = raw[attn2[0]]
    assert some_cross.shape[0] == B and some_cross.shape[3] == 7
    np.testing.assert_allclose(np.asarray(some_cross).sum(-1), 1.0, atol=1e-5)

    store = ac.group_store(raw)
    assert len(store["down_cross"]) == 1 and len(store["mid_cross"]) == 1
    assert len(store["up_cross"]) == 2 and len(store["up_self"]) == 2

    # reference aggregation: maps whose query length == res**2
    agg = ac.aggregate_attention(store, res=16, from_where=("down", "up"), is_cross=True)
    assert agg.shape == (16, 16, 7)
    agg_self = ac.aggregate_attention(store, res=8, from_where=("mid",), is_cross=False)
    assert agg_self.shape == (8, 8, 64)

    # the per-call-site maps also gate on the filter
    fn2 = ac.make_attention_maps_fn(cfg, attn_filter=lambda n: n.endswith("attn2"))
    _, raw2 = fn2(params, x, jnp.asarray([1.0, 2.0]), ehs)
    assert all(k.endswith("attn2") for k in raw2) and len(raw2) == 4


def test_word_attention_maps(tmp_path):
    from helpers import make_tokenizer_files
    from sliders_tpu.text.tokenizer import ClipTokenizer

    make_tokenizer_files(str(tmp_path))
    tok = ClipTokenizer.from_pretrained(str(tmp_path))
    ids = tok.tokenize("old person")
    L = len(ids) + 2
    agg = np.random.default_rng(0).random((8, 8, L)).astype(np.float32)
    maps = ac.word_attention_maps(tok, "old person", agg)
    assert len(maps) == L
    keys = list(maps)
    assert keys[0].startswith("0:<|startoftext|>")
    assert any("old" in k for k in keys)
    for m in maps.values():
        assert m.shape == (8, 8)
        assert 0.0 <= m.min() and m.max() <= 1.0


def test_tap_does_not_leak_outside_context():
    from sliders_tpu.ops import attention as A

    q = jax.random.normal(jax.random.key(0), (1, 8, 16), jnp.float32)
    with A.AttentionTap() as tap:
        A.multihead_attention(q, q, q, 2, name="x.attn1")
        A.multihead_attention(q, q, q, 2)  # unnamed: never tapped
    assert set(tap.store) == {"x.attn1"}
    assert A._ACTIVE_TAP is None
    # no tap active -> nothing stored, plain output path
    out = A.multihead_attention(q, q, q, 2, name="x.attn1")
    assert out.shape == q.shape
