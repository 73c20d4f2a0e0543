"""Direct compatibility: the reference repo's own config/prompt YAMLs and
eval CSVs load through our systems unchanged (skipped when the reference
checkout isn't mounted)."""

import os

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_reference_text_config_loads():
    from sliders_tpu.core.config import load_config_from_yaml

    cfg = load_config_from_yaml(f"{REF}/trainscripts/textsliders/data/config.yaml")
    assert cfg.network.rank == 4
    assert cfg.network.training_method == "noxattn"
    assert cfg.train.noise_scheduler == "ddim"
    assert cfg.train.iterations == 1000
    assert cfg.train.max_denoising_steps == 50

    cfg_xl = load_config_from_yaml(f"{REF}/trainscripts/textsliders/data/config-xl.yaml")
    assert cfg_xl.train.precision in ("bfloat16", "bf16")


def test_reference_prompt_yamls_load():
    from sliders_tpu.prompts import load_prompts_from_yaml

    ps = load_prompts_from_yaml(f"{REF}/trainscripts/textsliders/data/prompts.yaml")
    assert len(ps) >= 1
    assert all(p.target for p in ps)

    # attribute expansion on the reference file
    expanded = load_prompts_from_yaml(
        f"{REF}/trainscripts/textsliders/data/prompts.yaml", ["male", "female"]
    )
    assert len(expanded) == 2 * len(ps)
    assert expanded[0].target.startswith("male ")


def test_reference_gpt_yamls_load():
    import glob

    from sliders_tpu.prompts import load_prompts_from_yaml

    files = glob.glob(f"{REF}/trainscripts/textsliders/data/prompts-*_GPT.yaml")
    assert files
    for f in files:
        ps = load_prompts_from_yaml(f)
        assert len(ps) >= 1
        # the GPT files carry 'guidance: 4' -> mapped to guidance_scale
        assert ps[0].guidance_scale == 4.0


def test_reference_image_slider_prompts_load():
    from sliders_tpu.prompts import load_prompts_from_yaml

    ps = load_prompts_from_yaml(f"{REF}/trainscripts/imagesliders/data/prompts.yaml")
    assert len(ps) >= 1


def test_reference_eval_csvs_load():
    import pandas as pd

    df = pd.read_csv(f"{REF}/prompts/prompts-person.csv")
    assert {"case_number", "prompt", "evaluation_seed"} <= set(df.columns)
    assert len(df) >= 100


def test_shipped_data_yaml_examples_load():
    """Our own shipped data/ examples (incl. the six ported GPT prompt sets
    and prompts-xl.yaml) load and expand like the reference's."""
    import glob

    from sliders_tpu.prompts import load_prompts_from_yaml

    repo_data = os.path.join(os.path.dirname(__file__), "..", "data")
    gpt = sorted(glob.glob(os.path.join(repo_data, "prompts-*_GPT.yaml")))
    assert len(gpt) == 6, gpt
    for f in gpt:
        ps = load_prompts_from_yaml(f)
        assert len(ps) >= 1
        assert all(p.action == "enhance" for p in ps)
        assert ps[0].guidance_scale == 4.0  # 'guidance:' alias honored
        # person sets bake out the 2x5 demographic preservation grid
        if "person" in ps[0].target:
            assert len(ps) == 10
            assert len({p.target for p in ps}) == 10

    xl = load_prompts_from_yaml(os.path.join(repo_data, "prompts-xl.yaml"))
    assert len(xl) == 1 and xl[0].action == "enhance"
    expanded = load_prompts_from_yaml(
        os.path.join(repo_data, "prompts-xl.yaml"), ["male", "female"]
    )
    assert len(expanded) == 2 and expanded[0].target == "male person"
