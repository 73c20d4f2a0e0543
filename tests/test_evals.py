"""Eval harness tests: CLIP full-model parity vs transformers, LPIPS
properties, and the CSV scoring contract."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.evals import lpips as jlpips
from sliders_tpu.models import clip_text, clip_vision


def test_clip_model_parity_vs_transformers(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    t_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=16, eos_token_id=99,
        bos_token_id=98, pad_token_id=99, hidden_act="quick_gelu",
    )
    v_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=16, patch_size=8, hidden_act="quick_gelu",
    )
    cfg = transformers.CLIPConfig.from_text_vision_configs(t_cfg, v_cfg, projection_dim=24)
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()

    from sliders_tpu.models.convert import convert_state_dict

    params = convert_state_dict({k: v.numpy() for k, v in model.state_dict().items()})

    ids = rng.integers(1, 90, size=(3, 16)).astype(np.int64)
    ids[:, 0] = 98
    ids[:, 10:] = 99
    pixels = rng.standard_normal((2, 16, 16, 3), dtype=np.float32)

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )

    ours_v = clip_vision.ClipVisionConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        image_size=16, patch_size=8,
    )
    ours_t = clip_text.ClipTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_positions=16, eos_token_id=99, projection_dim=24,
    )
    logits = clip_vision.clip_logits_per_image(
        params, jnp.asarray(pixels), jnp.asarray(ids), ours_v, ours_t
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref.logits_per_image.numpy(), atol=2e-4
    )


def test_lpips_properties(rng):
    params = jlpips.init_params(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32).clip(-1, 1))
    y = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32).clip(-1, 1))
    # identity -> 0
    np.testing.assert_allclose(np.asarray(jlpips.lpips_distance(params, x, x)), 0.0, atol=1e-6)
    # symmetry
    np.testing.assert_allclose(
        np.asarray(jlpips.lpips_distance(params, x, y)),
        np.asarray(jlpips.lpips_distance(params, y, x)),
        rtol=1e-5,
    )
    # positive for different inputs
    assert (np.asarray(jlpips.lpips_distance(params, x, y)) > 0).all()


def test_lpips_alexnet_feature_shapes():
    params = jlpips.init_params(jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3))
    feats = jlpips.alexnet_features(params, x)
    assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]


def test_scoring_csv_contract(tmp_path, rng):
    """Synthetic sweep folders + random CLIP/LPIPS weights -> the scorers
    emit the reference CSV shapes (one column per scale)."""
    import pandas as pd
    from PIL import Image

    from sliders_tpu.evals.scoring import clip_scores, lpips_scores

    run = tmp_path / "run"
    for scale in ("-1", "0", "1"):
        os.makedirs(run / scale)
        for case in (0, 1):
            arr = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(run / scale / f"{case}_0.png")
    os.makedirs(run / "all")  # must be ignored
    csv = tmp_path / "prompts.csv"
    pd.DataFrame(
        {"case_number": [0, 1], "prompt": ["a", "b"], "evaluation_seed": [1, 2]}
    ).to_csv(csv, index=False)

    v_cfg = clip_vision.TINY_VISION
    t_cfg = clip_text.TINY
    params = clip_vision.init_params(jax.random.key(0), v_cfg, t_cfg)

    class FakeTok:
        def __call__(self, prompts):
            ids = np.full((len(prompts), 16), 99, np.int32)
            ids[:, 0] = 98
            return ids

    df = clip_scores(str(run), "old person", str(csv), params, v_cfg, t_cfg, FakeTok())
    assert {"clip_-1", "clip_0", "clip_1"} <= set(df.columns)
    assert os.path.exists(run / "clip_scores.csv")
    assert df["clip_1"].notna().all()

    lp = jlpips.init_params(jax.random.key(1))
    df2 = lpips_scores(str(run), "0", str(csv), lp)
    assert {"lpips_-1", "lpips_1"} <= set(df2.columns)
    assert "lpips_0" not in df2.columns  # true folder excluded
    assert os.path.exists(run / "lpips_score.csv")
    assert (df2["lpips_1"] >= 0).all()


def test_infer_params_from_name():
    from sliders_tpu.cli.generate_images import infer_params_from_name

    p = infer_params_from_name("age_slider_alpha1.0_rank4_noxattn_last.safetensors")
    assert p["train_method"] == "noxattn"
    assert p["rank"] == 4 and p["alpha"] == 1.0
    # reference: network_type is c3lier for everything except plain xattn
    # (generate_images_sd1.py:92-94)
    assert p["network_type"] == "c3lier"
    p2 = infer_params_from_name("x_alpha8.0_rank16_noxattn-hspace_500steps.pt")
    assert p2["train_method"] == "noxattn-hspace"
    assert p2["rank"] == 16 and p2["alpha"] == 8.0
    assert p2["network_type"] == "c3lier"
    # fragment matching is token-based: an incidental substring in the
    # checkpoint filename ('ballast' contains 'last', 'fullface' contains
    # 'full') must NOT override a reference-layout parent dir's method
    p3 = infer_params_from_name("models/age_noxattn/ballast.pt")
    assert p3["train_method"] == "noxattn"
    assert p3["scales"] == [-2.0, -1.0, 0.0, 1.0, 2.0]
    p4 = infer_params_from_name("models/age_noxattn/fullface.pt")
    assert p4["train_method"] == "noxattn"


def test_lpips_torch_mirror_parity(tmp_path):
    """Same-weights numerical anchor for evals/lpips.py (VERDICT r3 item 5):
    synthesize real-architecture torch checkpoints (torchvision alexnet
    state_dict + lpips package lin weights), load them through
    load_torch_weights, and compare against an independent plain-torch
    recomputation of the Zhang-et-al algorithm (torch_mirrors.t_lpips_*)."""
    import torch

    import torch_mirrors as tm

    g = torch.Generator().manual_seed(0)
    alex = {}
    conv_shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
                   (256, 256, 3)]
    for idx, (o, i, k) in zip((0, 3, 6, 8, 10), conv_shapes):
        alex[f"features.{idx}.weight"] = (
            torch.randn(o, i, k, k, generator=g) * (i * k * k) ** -0.5
        )
        alex[f"features.{idx}.bias"] = torch.randn(o, generator=g) * 0.01
    lins = {
        f"lin{j}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) * 0.1
        for j, c in enumerate((64, 192, 384, 256, 256))
    }
    torch.save(alex, tmp_path / "alexnet.pth")
    torch.save(lins, tmp_path / "lpips_alex.pth")

    params = jlpips.load_torch_weights(
        str(tmp_path / "alexnet.pth"), str(tmp_path / "lpips_alex.pth")
    )
    x = jax.random.uniform(jax.random.key(1), (3, 64, 64, 3), minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.key(2), (3, 64, 64, 3), minval=-1, maxval=1)
    ours = np.asarray(jlpips.lpips_distance(params, x, y))

    def nchw(a):
        return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())

    with torch.no_grad():
        theirs = tm.t_lpips_distance(alex, lins, nchw(x), nchw(y)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)

    # distance to self stays exactly zero through the real weight path
    np.testing.assert_allclose(
        np.asarray(jlpips.lpips_distance(params, x, x)), 0.0, atol=1e-7
    )
