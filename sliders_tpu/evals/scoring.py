"""Scale-sweep quality scoring (the reference eval harness, SURVEY.md §2.4).

Directory contract (generate_images_sd1.py:113-121 + clip_score.py:33-75 +
lpip_score.py:47-76): a run folder contains one subfolder per slider scale
('-2', '-1', '0', '1', '2', 'half' for 0.5, plus 'all' for grids) with
images named `{case_number}_{i}.png`; scorers read the prompt CSV
(case_number, prompt, evaluation_seed) and write `clip_scores.csv` /
`lpips_score.csv` with one column per scale.
"""

from __future__ import annotations

import os
import re

import numpy as np


def sorted_nicely(items):
    convert = lambda t: int(t) if t.isdigit() else t
    return sorted(items, key=lambda k: [convert(c) for c in re.split(r"([0-9]+)", k)])


def _scale_folders(path: str, exclude=()):
    names = [
        m
        for m in os.listdir(path)
        if "all" not in m and ".csv" not in m and m not in exclude
        and os.path.isdir(os.path.join(path, m))
    ]
    return sorted(names)


def clip_scores(
    im_path: str,
    prompt: str,
    prompts_csv: str,
    clip_params: dict,
    vision_cfg,
    text_cfg,
    tokenizer,
    batch_size: int = 16,
) -> "pandas.DataFrame":
    """Per-case mean CLIP logits_per_image against `prompt` for every scale
    folder; writes {im_path}/clip_scores.csv like clip_score.py:24-72."""
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from sliders_tpu.models.clip_vision import clip_logits_per_image, preprocess_images

    ids = jnp.asarray(tokenizer([prompt.strip()]))

    @jax.jit
    def score(pixels):
        return clip_logits_per_image(clip_params, pixels, ids, vision_cfg, text_cfg)[:, 0]

    df = pd.read_csv(prompts_csv)
    for folder in _scale_folders(im_path):
        col = f"clip_{folder.replace('half', '0.5')}"
        df[col] = np.nan
        folder_path = os.path.join(im_path, folder)
        cases_in_df = set(df["case_number"])
        # collect then score in fixed-size batches (one compiled program)
        names, cases = [], []
        for name in sorted_nicely(os.listdir(folder_path)):
            try:
                case = int(name.split("_")[0].replace(".png", ""))
            except ValueError:
                continue
            if case in cases_in_df:
                names.append(name)
                cases.append(case)
        per_case: dict[int, list[float]] = {}
        for start in range(0, len(names), batch_size):
            chunk = names[start : start + batch_size]
            imgs = np.stack(
                [
                    np.asarray(Image.open(os.path.join(folder_path, n)).convert("RGB"))
                    for n in chunk
                ]
            )
            pixels = preprocess_images(jnp.asarray(imgs), vision_cfg.image_size)
            pad = batch_size - len(chunk)
            if pad:
                pixels = jnp.concatenate([pixels, jnp.tile(pixels[-1:], (pad, 1, 1, 1))])
            vals = np.asarray(score(pixels))[: len(chunk)]
            for case, v in zip(cases[start : start + batch_size], vals):
                per_case.setdefault(case, []).append(float(v))
        for case, vals in per_case.items():
            df.loc[df["case_number"] == case, col] = np.mean(vals)
        print(f"Mean CLIP score [{folder}]: {df[col].mean()}")
    df.to_csv(os.path.join(im_path, "clip_scores.csv"), index=False)
    return df


def lpips_scores(
    im_path: str,
    true_folder: str,
    prompts_csv: str,
    lpips_params: dict,
) -> "pandas.DataFrame":
    """LPIPS (64px) of each scale folder vs the `true_folder` (scale 0),
    per case; writes {im_path}/lpips_score.csv like lpip_score.py:47-76."""
    import jax
    import pandas as pd

    from sliders_tpu.evals.lpips import load_image_64, lpips_distance

    dist = jax.jit(lambda a, b: lpips_distance(lpips_params, a, b))

    df = pd.read_csv(prompts_csv)
    original_path = os.path.join(im_path, true_folder)
    for folder in _scale_folders(im_path, exclude=(true_folder,)):
        col = f"lpips_{folder.replace('half', '0.5')}"
        df[col] = 0.0
        edited = os.path.join(im_path, folder)
        files = [f for f in os.listdir(edited) if f.endswith(".png")]
        for index, row in df.iterrows():
            case = row.case_number
            vals = []
            for f in files:
                if not f.startswith(f"{case}_"):
                    continue
                orig_file = os.path.join(original_path, f)
                if not os.path.exists(orig_file):
                    continue
                a = load_image_64(orig_file)
                b = load_image_64(os.path.join(edited, f))
                vals.append(float(dist(a, b)[0]))
            df.loc[index, col] = np.mean(vals) if vals else np.nan
    df.to_csv(os.path.join(im_path, "lpips_score.csv"), index=False)
    return df
