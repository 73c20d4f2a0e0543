"""Prompt objective + attribute expansion + CLIP BPE tokenizer tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from sliders_tpu.prompts import PromptSettings, load_prompts_from_yaml, slider_target
from sliders_tpu.prompts.settings import slider_loss
from sliders_tpu.text.tokenizer import ClipTokenizer


def test_prompt_defaulting():
    s = PromptSettings(target="old person")
    assert s.positive == "old person"
    assert s.unconditional == ""
    assert s.neutral == ""
    assert s.action == "erase" and s.guidance_scale == 1.0
    s2 = PromptSettings(target="a", positive="b", neutral="c", unconditional="d")
    assert (s2.positive, s2.neutral, s2.unconditional) == ("b", "c", "d")


def test_attribute_expansion(tmp_path):
    f = tmp_path / "prompts.yaml"
    f.write_text(
        "- target: person\n  positive: old person\n  action: enhance\n"
        "  guidance_scale: 4\n- target: sky\n"
    )
    plain = load_prompts_from_yaml(str(f))
    assert len(plain) == 2
    expanded = load_prompts_from_yaml(str(f), ["male", "female"])
    assert len(expanded) == 4
    assert expanded[0].target == "male person"
    assert expanded[0].positive == "male old person"
    assert expanded[0].neutral == "male "  # attribute prepended to default
    assert expanded[3].target == "female sky"
    assert expanded[3].positive == "female sky"  # default inherited then expanded


def test_slider_objective_algebra():
    pos = jnp.asarray([2.0]); unc = jnp.asarray([0.5]); neu = jnp.asarray([1.0])
    # erase: neutral - g (pos - uncond); enhance: +
    np.testing.assert_allclose(slider_target("erase", pos, unc, neu, 4.0), [-5.0])
    np.testing.assert_allclose(slider_target("enhance", pos, unc, neu, 4.0), [7.0])
    # loss at the exact target is zero
    assert float(slider_loss("enhance", jnp.asarray([7.0]), pos, unc, neu, 4.0)) == 0.0
    with pytest.raises(ValueError):
        slider_target("boost", pos, unc, neu, 1.0)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789!,.")
    vocab = {}
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    merges = [
        ("p", "h"), ("ph", "o"), ("pho", "to</w>"),
        ("o", "l"), ("ol", "d</w>"),
        ("c", "a"), ("ca", "t</w>"),
        ("t", "o</w>"),
    ]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    return str(d)


def test_tokenizer_matches_transformers(vocab_dir):
    transformers = pytest.importorskip("transformers")
    ours = ClipTokenizer.from_pretrained(vocab_dir)
    ours.model_max_length = 16
    theirs = transformers.CLIPTokenizer(
        vocab_file=f"{vocab_dir}/vocab.json",
        merges_file=f"{vocab_dir}/merges.txt",
        model_max_length=16,
    )
    for text in ["photo of an old cat", "OLD   photo!", "cat, cat, cat.", ""]:
        ref = theirs(
            [text], padding="max_length", max_length=16, truncation=True,
            return_tensors="np",
        ).input_ids
        out = ours([text])
        np.testing.assert_array_equal(out, ref.astype(np.int32))


def test_tokenizer_pad_token_override(vocab_dir):
    # SDXL tokenizer_2 pads with id 0 (model_util.py:150)
    tok = ClipTokenizer.from_pretrained(vocab_dir, pad_token_id=0)
    tok.model_max_length = 8
    ids = tok(["cat"])
    assert ids[0, 0] == tok.bos_token_id
    assert ids[0, 2] == tok.eos_token_id
    assert (ids[0, 3:] == 0).all()


def test_tokenizer_truncation(vocab_dir):
    tok = ClipTokenizer.from_pretrained(vocab_dir)
    tok.model_max_length = 6
    ids = tok(["cat cat cat cat cat cat cat cat"])
    assert ids.shape == (1, 6)
    assert ids[0, -1] == tok.eos_token_id
