"""Eval-harness fidelity: reference checkpoint-layout inference
(generate_images_sd1.py:78-91), custom-diffusion full load
(generate_images_customdiffusion.py:749-785), XL textual-inversion
injection (generate_images_textinversion_xl.py:9-27), UCE ingestion from
torch UNet state_dicts (generate_images-uce.py:193-215), and per-iteration
dynamic_crops (train_lora_xl.py:198-203)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_tiny_snapshot
from sliders_tpu.cli.generate_images import (
    DEFAULT_SCALES,
    HSPACE_SCALES,
    infer_params_from_name,
)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# checkpoint-layout hyperparam inference
# ---------------------------------------------------------------------------

def test_infer_params_reference_directory_layout():
    # reference layout: models/<run_name>/<ckpt>.pt, fragments in parent dir
    p = infer_params_from_name("models/ageslider_noxattn/age_last.pt")
    assert p["train_method"] == "noxattn"
    assert p["scales"] == DEFAULT_SCALES
    assert p["network_type"] == "c3lier"

    p = infer_params_from_name("models/age_noxattn-hspace/ckpt_1000steps.pt")
    assert p["train_method"] == "noxattn-hspace"
    assert p["scales"] == HSPACE_SCALES

    p = infer_params_from_name("models/age_noxattn-hspace-last/ckpt.pt")
    assert p["train_method"] == "noxattn-hspace-last"
    assert p["scales"] == HSPACE_SCALES

    # reference composition default: no fragments in dir -> xattn / lierla
    p = infer_params_from_name("models/age_rank8_alpha2.0_xattn/ckpt.pt")
    assert p["train_method"] == "xattn"
    assert p["network_type"] == "lierla"
    assert p["rank"] == 8 and p["alpha"] == 2.0


def test_infer_params_own_basename_convention():
    # our save convention: fragments in the FILE name, _last suffix is the
    # final-checkpoint marker and must NOT trigger hspace-last widening
    p = infer_params_from_name("out/smile_alpha1.0_rank2_noxattn_last.safetensors")
    assert p["train_method"] == "noxattn"
    assert p["scales"] == DEFAULT_SCALES
    assert p["rank"] == 2 and p["alpha"] == 1.0

    p = infer_params_from_name("out/s_alpha4.0_rank16_noxattn-hspace-last_500steps.safetensors")
    assert p["train_method"] == "noxattn-hspace-last"
    assert p["scales"] == HSPACE_SCALES
    assert p["rank"] == 16 and p["alpha"] == 4.0


# ---------------------------------------------------------------------------
# tokenizer added tokens
# ---------------------------------------------------------------------------

def test_tokenizer_add_tokens(tmp_path):
    from helpers import make_tokenizer_files
    from sliders_tpu.text.tokenizer import ClipTokenizer

    make_tokenizer_files(str(tmp_path))
    tok = ClipTokenizer.from_pretrained(str(tmp_path))
    base_len = len(tok)
    assert tok.add_tokens("<sks>") == 1
    assert tok.add_tokens("<sks>") == 0  # already present
    tid = tok.convert_tokens_to_ids("<sks>")
    assert tid == base_len
    assert len(tok) == base_len + 1
    ids = tok.tokenize("old <sks> person")
    assert tid in ids
    # surrounding words still tokenize normally
    assert len(ids) > 1
    batch = tok(["old <sks>"])
    assert (batch == tid).any()


def test_tokenizer_added_token_prefix_no_shadowing(tmp_path):
    """Longest-match added-token splitting (HF contract): '<sks>' must not
    shadow '<sks>b' even when registered first."""
    from helpers import make_tokenizer_files
    from sliders_tpu.text.tokenizer import ClipTokenizer

    make_tokenizer_files(str(tmp_path))
    tok = ClipTokenizer.from_pretrained(str(tmp_path))
    assert tok.add_tokens("<sks>") == 1
    assert tok.add_tokens("<sks>b") == 1
    short = tok.convert_tokens_to_ids("<sks>")
    long = tok.convert_tokens_to_ids("<sks>b")
    ids = tok.tokenize("a <sks>b photo")
    assert long in ids and short not in ids
    ids2 = tok.tokenize("a <sks> photo")
    assert short in ids2 and long not in ids2
    # multi-piece strings collapse to a single unk-style id, never a list
    assert isinstance(tok.convert_tokens_to_ids("old person photo"), int)


# ---------------------------------------------------------------------------
# custom diffusion: modifier token + attn2 deltas in one loadable flow
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def xl_snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("snap") / "sdxl_tiny"
    return make_tiny_snapshot(str(root), xl=True)


def test_custom_diffusion_full_load(xl_snapshot, tmp_path):
    import torch

    from sliders_tpu.evals.baselines import load_custom_diffusion
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines.encoding import encode_prompts_xl
    from sliders_tpu.utils import pytree

    m = loader.load_sdxl(xl_snapshot, dtype=jnp.float32)
    toks = [te.tokenizer for te in m.text_encoders]
    tes = [te.params for te in m.text_encoders]

    # synthesize a delta checkpoint: one modifier token + attn2 K/V deltas
    flat = pytree.flatten(m.unet_params)
    kv = [k for k in flat if ("attn2.to_k" in k or "attn2.to_v" in k) and k.endswith(".weight")]
    assert kv, "tiny XL UNet has no attn2 K/V?"
    d1 = np.asarray(
        pytree.flatten(tes[0])["text_model.embeddings.token_embedding.weight"]
    ).shape[1]
    d2 = np.asarray(
        pytree.flatten(tes[1])["text_model.embeddings.token_embedding.weight"]
    ).shape[1]
    delta = {
        "unet": {k: torch.from_numpy(np.asarray(flat[k]).T.copy() * 2.0) for k in kv},
        "modifier_token": {
            "<sks>": [torch.full((d1,), 0.25), torch.full((d2,), 0.5)]
        },
    }
    ckpt = tmp_path / "cd_delta.pt"
    torch.save(delta, ckpt)

    unet_params, new_tes = load_custom_diffusion(str(ckpt), m.unet_params, toks, tes)

    # K/V doubled, everything else untouched
    new_flat = pytree.flatten(unet_params)
    np.testing.assert_allclose(np.asarray(new_flat[kv[0]]), 2.0 * np.asarray(flat[kv[0]]), rtol=1e-6)
    other = next(k for k in flat if k not in kv)
    np.testing.assert_array_equal(np.asarray(new_flat[other]), np.asarray(flat[other]))

    # both tokenizers know the token; both embedding matrices grew and carry
    # the learned rows
    for i, (tok, te) in enumerate(zip(toks, new_tes)):
        tid = tok.convert_tokens_to_ids("<sks>")
        emb = pytree.flatten(te)["text_model.embeddings.token_embedding.weight"]
        assert emb.shape[0] == len(tok)
        np.testing.assert_allclose(
            np.asarray(emb[tid]), 0.25 if i == 0 else 0.5, rtol=1e-6
        )

    # the token is usable end-to-end through the XL encoder stack
    cfgs = [te.config for te in m.text_encoders]
    embeds, pooled = encode_prompts_xl(toks, new_tes, cfgs, ["old person <sks>"])
    assert np.isfinite(np.asarray(embeds)).all()

    # duplicate load must fail exactly like the reference (add_tokens == 0)
    with pytest.raises(ValueError, match="already contains"):
        load_custom_diffusion(str(ckpt), m.unet_params, toks, new_tes)


def test_custom_diffusion_full_text_encoder(xl_snapshot, tmp_path):
    """Full text_encoder/text_encoder_2 state dicts in the delta checkpoint
    replace BOTH encoders wholesale (the reference's load_state_dict path,
    generate_images_customdiffusion.py:750-752), composing with modifier
    tokens, and flow through the CLI end-to-end."""
    import torch

    from sliders_tpu.evals.baselines import load_custom_diffusion
    from sliders_tpu.models import loader
    from sliders_tpu.models.convert import to_torch_layout
    from sliders_tpu.utils import pytree

    m = loader.load_sdxl(xl_snapshot, dtype=jnp.float32)
    toks = [te.tokenizer for te in m.text_encoders]
    tes = [te.params for te in m.text_encoders]

    def torch_state(tree, scale):
        return {
            k: torch.from_numpy(np.asarray(v).copy() * scale)
            for k, v in to_torch_layout(tree).items()
        }

    d1 = np.asarray(
        pytree.flatten(tes[0])["text_model.embeddings.token_embedding.weight"]
    ).shape[1]
    d2 = np.asarray(
        pytree.flatten(tes[1])["text_model.embeddings.token_embedding.weight"]
    ).shape[1]
    delta = {
        "text_encoder": torch_state(tes[0], 1.5),
        "text_encoder_2": torch_state(tes[1], 0.5),
        "modifier_token": {
            "<sks>": [torch.full((d1,), 0.25), torch.full((d2,), 0.5)]
        },
    }
    ckpt = tmp_path / "cd_full_te.pt"
    torch.save(delta, ckpt)

    _, new_tes = load_custom_diffusion(str(ckpt), m.unet_params, toks, tes)
    for i, (te_old, te_new, scale) in enumerate(
        zip(tes, new_tes, (1.5, 0.5))
    ):
        old_flat = pytree.flatten(te_old)
        new_flat = pytree.flatten(te_new)
        k = next(k for k in old_flat if k.endswith("q_proj.weight"))
        np.testing.assert_allclose(
            np.asarray(new_flat[k]), scale * np.asarray(old_flat[k]), rtol=1e-6,
            err_msg=f"encoder {i} not replaced by the checkpoint state",
        )
        # modifier token applied ON TOP of the swapped encoder
        tid = toks[i].convert_tokens_to_ids("<sks>")
        emb = new_flat["text_model.embeddings.token_embedding.weight"]
        np.testing.assert_allclose(
            np.asarray(emb[tid]), 0.25 if i == 0 else 0.5, rtol=1e-6
        )

    # strictness: a state dict missing params raises like torch's strict load
    bad = dict(delta)
    bad["text_encoder"] = {
        k: v for j, (k, v) in enumerate(delta["text_encoder"].items()) if j > 0
    }
    bad_ckpt = tmp_path / "cd_bad.pt"
    torch.save(bad, bad_ckpt)
    with pytest.raises(KeyError, match="missing"):
        load_custom_diffusion(
            str(bad_ckpt), m.unet_params,
            [te.tokenizer for te in loader.load_sdxl(xl_snapshot, dtype=jnp.float32).text_encoders],
            tes,
        )

    # CLI end-to-end with the full-TE checkpoint
    import pandas as pd

    from sliders_tpu.cli.generate_images_custom_diffusion import (
        build_parser,
        main,
    )

    csv = tmp_path / "prompts.csv"
    pd.DataFrame(
        {"case_number": [0], "prompt": ["photo"], "evaluation_seed": [3]}
    ).to_csv(csv, index=False)
    out = tmp_path / "out"
    args = build_parser().parse_args(
        [
            "--model_name", str(ckpt),
            "--token", "<sks>",
            "--base", xl_snapshot,
            "--prompts_path", str(csv),
            "--save_path", str(out),
            "--ddim_steps", "2",
            "--image_size", "64",
            "--num_samples", "1",
            "--precision", "float32",
        ]
    )
    main(args)
    run = next(out.iterdir())
    assert any(p.suffix == ".png" for p in run.iterdir())


def test_custom_diffusion_compressed_deltas(xl_snapshot, tmp_path):
    import torch

    from sliders_tpu.evals.baselines import apply_custom_diffusion
    from sliders_tpu.models import loader
    from sliders_tpu.utils import pytree

    m = loader.load_sdxl(xl_snapshot, dtype=jnp.float32)
    flat = pytree.flatten(m.unet_params)
    k = next(k for k in flat if "attn2.to_k" in k and k.endswith(".weight"))
    out_f, in_f = np.asarray(flat[k]).T.shape
    u = np.random.default_rng(0).normal(size=(out_f, 2)).astype(np.float32)
    v = np.random.default_rng(1).normal(size=(2, in_f)).astype(np.float32)
    state = {k: {"u": torch.from_numpy(u), "v": torch.from_numpy(v)}}
    new = apply_custom_diffusion(m.unet_params, state, compress=True)
    got = np.asarray(pytree.flatten(new)[k])
    want = np.asarray(flat[k]) + (u @ v).T
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# XL textual inversion: both encoders
# ---------------------------------------------------------------------------

def test_inject_learned_token_xl(xl_snapshot):
    from sliders_tpu.evals.baselines import inject_learned_token_xl
    from sliders_tpu.models import loader
    from sliders_tpu.utils import pytree

    m = loader.load_sdxl(xl_snapshot, dtype=jnp.float32)
    toks = [te.tokenizer for te in m.text_encoders]
    tes = [te.params for te in m.text_encoders]
    d1 = pytree.flatten(tes[0])["text_model.embeddings.token_embedding.weight"].shape[1]
    d2 = pytree.flatten(tes[1])["text_model.embeddings.token_embedding.weight"].shape[1]
    emb_dict = {"emb": np.full((d1,), 0.125, np.float32), "emb2": np.full((d2,), 0.375, np.float32)}

    new = inject_learned_token_xl(tes, toks, emb_dict, token="old")
    for i, (tok, te) in enumerate(zip(toks, new)):
        (tid,) = tok.tokenize("old")
        emb = pytree.flatten(te)["text_model.embeddings.token_embedding.weight"]
        np.testing.assert_allclose(np.asarray(emb[tid]), 0.125 if i == 0 else 0.375)

    with pytest.raises(ValueError, match="single token"):
        inject_learned_token_xl(tes, toks, emb_dict, token="old person")


# ---------------------------------------------------------------------------
# UCE ingestion from torch UNet state_dicts
# ---------------------------------------------------------------------------

def test_uce_ingestion_roundtrip(tmp_path):
    import torch

    from sliders_tpu.evals.baselines import interpolate_params, load_uce_unet
    from sliders_tpu.models import convert, unet2d
    from sliders_tpu.utils import pytree

    cfg = unet2d.TINY
    old = unet2d.init_params(jax.random.key(0), cfg)
    edited_np = {
        k: np.asarray(v) + 0.5 for k, v in convert.to_torch_layout(old).items()
    }
    ckpt = tmp_path / "uce_unet.pt"
    torch.save({k: torch.from_numpy(v) for k, v in edited_np.items()}, ckpt)

    edited = load_uce_unet(str(ckpt), old)
    of, ef = pytree.flatten(old), pytree.flatten(edited)
    assert set(of) == set(ef)
    # conversion applied: a 2-D linear weight comes back transposed+shifted
    k2 = next(k for k in of if k.endswith("to_q.weight"))
    np.testing.assert_allclose(np.asarray(ef[k2]), np.asarray(of[k2]) + 0.5, rtol=1e-6)

    half = interpolate_params(old, edited, 0.5)
    np.testing.assert_allclose(
        np.asarray(pytree.flatten(half)[k2]), np.asarray(of[k2]) + 0.25, rtol=1e-5
    )

    # truncated checkpoints are rejected
    bad = dict(edited_np)
    bad.pop(sorted(bad)[0])
    torch.save({k: torch.from_numpy(v) for k, v in bad.items()}, tmp_path / "bad.pt")
    with pytest.raises(KeyError, match="missing"):
        load_uce_unet(str(tmp_path / "bad.pt"), old)


# ---------------------------------------------------------------------------
# dynamic_crops: per-iteration resampling inside the jitted XL step
# ---------------------------------------------------------------------------

def test_dynamic_crops_wiring():
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.prompts.settings import PromptSettings
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.driver import PromptEmbedsCache, build_pairs
    from sliders_tpu.training.text_slider import (
        SliderTrainState,
        make_text_slider_step,
    )

    cfg = unet2d.TINY_XL

    class FakeCache:
        def __getitem__(self, prompt):
            k = jax.random.key(abs(hash(prompt)) % (2**31))
            k1, k2 = jax.random.split(k)
            return (
                jax.random.normal(k1, (7, cfg.cross_attention_dim)),
                jax.random.normal(k2, (16,)),
            )

    s = PromptSettings(target="old person", positive="very old", dynamic_crops=True, resolution=64)
    pairs = build_pairs([s], FakeCache(), is_xl=True)
    assert "dynamic_crops" in pairs and float(pairs["dynamic_crops"][0]) == 1.0
    assert pairs["time_ids"].shape == (1, 6)

    params = unet2d.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=2, train_method="noxattn")
    opt = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 1e-3, 10),
        trainable_mask=lnet.trainable_mask(lora),
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=4)
    step = make_text_slider_step(
        cfg, schedule, sampler, opt, max_denoising_steps=4, resolution=64,
        batch_size=1, compute_dtype=jnp.float32, remat=False, is_xl=True,
        donate=False,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, opt)
    state, metrics = step(state, params, pairs)
    assert np.isfinite(float(metrics["loss"]))

    # flag off -> static ids path still works through the same program
    s2 = PromptSettings(target="old person", positive="very old", dynamic_crops=False, resolution=64)
    pairs2 = build_pairs([s2], FakeCache(), is_xl=True)
    assert float(pairs2["dynamic_crops"][0]) == 0.0
    state2 = SliderTrainState.create(jax.random.key(3), lora, opt)
    state2, metrics2 = step(state2, params, pairs2)
    assert np.isfinite(float(metrics2["loss"]))
