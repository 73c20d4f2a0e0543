"""Runnable baseline CLIs over the reference CSV contract
(case_number,prompt,evaluation_seed) — UCE (generate_images-uce.py:193-274)
and textual inversion (generate_images_textinversion.py:20-36,
generate_images_textinversion_xl.py:9-27). VERDICT r2 item 4."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sd_snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("snap") / "sd_tiny"
    return make_tiny_snapshot(str(root))


@pytest.fixture(scope="module")
def xl_snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("snapxl") / "sdxl_tiny"
    return make_tiny_snapshot(str(root), xl=True)


@pytest.fixture()
def prompts_csv(tmp_path):
    p = tmp_path / "prompts.csv"
    p.write_text(
        "case_number,prompt,evaluation_seed\n"
        "0,photo of a person,42\n"
        "7,an old car,7\n"
    )
    return str(p)


@pytest.fixture()
def short_prompts_csv(tmp_path):
    # the tiny tokenizer is char-level with max_positions=16: prompts must
    # stay short enough that the " with {token}" suffix isn't truncated
    p = tmp_path / "short_prompts.csv"
    p.write_text("case_number,prompt,evaluation_seed\n0,car,42\n7,sun,7\n")
    return str(p)


def test_uce_cli_e2e(sd_snapshot, prompts_csv, tmp_path):
    import torch

    from sliders_tpu.cli.generate_images_uce import build_parser, main
    from sliders_tpu.models import convert, loader

    m = loader.load_sd(sd_snapshot, dtype=jnp.float32)
    edited = {
        k: torch.from_numpy(np.asarray(v).copy() + 0.05)
        for k, v in convert.to_torch_layout(m.unet_params).items()
    }
    ckpt = tmp_path / "uce_age.pt"
    torch.save(edited, ckpt)

    save = tmp_path / "out"
    args = build_parser().parse_args(
        [
            "--model_name", str(ckpt), "--prompts_path", prompts_csv,
            "--base", sd_snapshot, "--save_path", str(save),
            "--image_size", "64", "--ddim_steps", "3", "--num_samples", "2",
            "--scales=-1,0,0.5", "--start_noise", "800",
            "--precision", "float32", "--till_case", "5",
        ]
    )
    main(args)

    run_dir = save / "uce_age"
    # reference folder layout: one dir per scale ('0.5' -> 'half') + all/
    for sub in ("-1", "0", "half", "all"):
        assert (run_dir / sub / "0_0.png").exists(), sub
        assert (run_dir / sub / "0_1.png").exists(), sub
    # till_case honored: case 7 skipped
    assert not (run_dir / "0" / "7_0.png").exists()

    from PIL import Image

    neg = np.asarray(Image.open(run_dir / "-1" / "0_0.png"))
    zero = np.asarray(Image.open(run_dir / "0" / "0_0.png"))
    h, w, c = neg.shape  # tiny VAE upsamples less than the real x8
    assert c == 3 and h == w
    # the weight-interpolated segment must actually change the output
    assert np.abs(neg.astype(np.int32) - zero.astype(np.int32)).max() > 0
    strip = np.asarray(Image.open(run_dir / "all" / "0_0.png"))
    assert strip.shape == (h, w * 3, 3)


def test_text_inversion_cli_e2e_sd(sd_snapshot, short_prompts_csv, tmp_path):
    import torch

    from sliders_tpu.cli.generate_images_text_inversion import build_parser, main
    from sliders_tpu.models import loader

    m = loader.load_sd(sd_snapshot, dtype=jnp.float32)
    width = m.text_encoders[0].params[
        "text_model"]["embeddings"]["token_embedding"]["weight"].shape[1]
    emb = tmp_path / "learned_embeds.pt"
    torch.save({"<sks-style>": torch.randn(width)}, emb)

    save = tmp_path / "ti_out"
    args = build_parser().parse_args(
        [
            "--model_name", sd_snapshot, "--prompts_path", short_prompts_csv,
            "--token", "<sks-style>", "--embedding_file", str(emb),
            "--save_path", str(save), "--image_size", "64",
            "--ddim_steps", "3", "--num_samples", "2",
            "--precision", "float32",
        ]
    )
    main(args)
    out = save / "learned_embeds"
    assert (out / "0_0.png").exists() and (out / "0_1.png").exists()
    assert (out / "7_0.png").exists()

    # the injected token must change the conditioning (vs the base model)
    from PIL import Image

    base_args = build_parser().parse_args(
        [
            "--model_name", sd_snapshot, "--prompts_path", short_prompts_csv,
            "--token", "dog",  # plain word, no injection
            "--save_path", str(tmp_path / "ti_base"), "--image_size", "64",
            "--ddim_steps", "3", "--num_samples", "1",
            "--precision", "float32", "--till_case", "5",
        ]
    )
    main(base_args)
    a = np.asarray(Image.open(out / "0_0.png"))
    b = np.asarray(Image.open(tmp_path / "ti_base" / os.path.basename(sd_snapshot) / "0_0.png"))
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0


def test_text_inversion_cli_e2e_xl(xl_snapshot, short_prompts_csv, tmp_path):
    import torch

    from sliders_tpu.cli.generate_images_text_inversion import build_parser, main
    from sliders_tpu.models import loader

    m = loader.load_sdxl(xl_snapshot, dtype=jnp.float32)
    widths = [
        te.params["text_model"]["embeddings"]["token_embedding"]["weight"].shape[1]
        for te in m.text_encoders
    ]
    emb = tmp_path / "eyesize_textual_inversion.pt"
    torch.save({"emb": torch.randn(widths[0]), "emb2": torch.randn(widths[1])}, emb)

    save = tmp_path / "ti_xl_out"
    args = build_parser().parse_args(
        [
            "--model_name", xl_snapshot, "--prompts_path", short_prompts_csv,
            "--token", "sks", "--embedding_file", str(emb), "--xl",
            "--suffix", " with {token} eyes",
            "--save_path", str(save), "--image_size", "64",
            "--ddim_steps", "2", "--num_samples", "1",
            "--precision", "float32", "--till_case", "5",
        ]
    )
    main(args)
    assert (save / "eyesize_textual_inversion" / "0_0.png").exists()
