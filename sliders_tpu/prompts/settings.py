"""Prompt-pair objective layer.

Mirrors the reference `prompt_util.py`: the four prompts (target / positive /
unconditional / neutral) with defaulting (prompt_util.py:56-68), the
erase/enhance slider objective (prompt_util.py:108-148), and the
disentanglement-attribute Cartesian expansion (prompt_util.py:151-174).

The loss itself is a pure function over eps-space predictions so it can sit
inside the jitted train step.
"""

from __future__ import annotations

import copy
from typing import List, Literal, Optional

import jax.numpy as jnp
import yaml
from pydantic import BaseModel, model_validator

ACTION_TYPES = Literal["erase", "enhance"]


class PromptSettings(BaseModel):
    """One slider definition (YAML entry)."""

    target: str
    positive: Optional[str] = None  # defaults to target
    unconditional: str = ""
    neutral: Optional[str] = None  # defaults to unconditional
    action: ACTION_TYPES = "erase"
    guidance_scale: float = 1.0
    resolution: int = 512
    dynamic_resolution: bool = False
    batch_size: int = 1
    dynamic_crops: bool = False  # only used for XL

    @model_validator(mode="before")
    @classmethod
    def fill_prompts(cls, values):
        if "target" not in values:
            raise ValueError("target must be specified")
        if "positive" not in values or values["positive"] is None:
            values["positive"] = values["target"]
        if "unconditional" not in values:
            values["unconditional"] = ""
        if "neutral" not in values or values["neutral"] is None:
            values["neutral"] = values["unconditional"]
        # the GPT-helper YAMLs write 'guidance' instead of 'guidance_scale'
        # (GPT_prompt_helper.ipynb cell 3; data/prompts-*_GPT.yaml) — honor it
        if "guidance_scale" not in values and "guidance" in values:
            values["guidance_scale"] = values["guidance"]
        return values


def load_prompts_from_yaml(path, attributes: List[str] = []) -> list[PromptSettings]:
    """Load slider prompt definitions; with disentanglement attributes, each
    entry is expanded into one copy per attribute with the attribute
    prepended to all four prompts (prompt_util.py:157-166)."""
    with open(path, "r") as f:
        prompts = yaml.safe_load(f)
    if len(prompts) == 0:
        raise ValueError("prompts file is empty")
    if len(attributes) != 0:
        expanded = []
        for entry in prompts:
            # expansion operates on filled values so defaults inherit the
            # attribute too (matches reference behavior, which expands the
            # raw dict only after PromptSettings defaulting via train call)
            filled = PromptSettings(**entry).model_dump()
            for att in attributes:
                c = copy.deepcopy(filled)
                for k in ("target", "positive", "neutral", "unconditional"):
                    c[k] = f"{att} {c[k]}"
                expanded.append(c)
    else:
        expanded = copy.deepcopy(prompts)
    return [PromptSettings(**p) for p in expanded]


def slider_target(
    action: str,
    positive: jnp.ndarray,
    unconditional: jnp.ndarray,
    neutral: jnp.ndarray,
    guidance_scale: float,
) -> jnp.ndarray:
    """The eps-space regression target of the slider objective:
    erase   -> neutral - g * (positive - unconditional)   (prompt_util.py:108-120)
    enhance -> neutral + g * (positive - unconditional)   (prompt_util.py:123-135)
    """
    direction = guidance_scale * (positive - unconditional)
    if action == "erase":
        return neutral - direction
    if action == "enhance":
        return neutral + direction
    raise ValueError("action must be erase or enhance")


def slider_loss(
    action: str,
    target_pred: jnp.ndarray,
    positive: jnp.ndarray,
    unconditional: jnp.ndarray,
    neutral: jnp.ndarray,
    guidance_scale: float,
) -> jnp.ndarray:
    """MSE between the (LoRA-on) target prediction and the slider target."""
    goal = slider_target(action, positive, unconditional, neutral, guidance_scale)
    diff = target_pred.astype(jnp.float32) - goal.astype(jnp.float32)
    return jnp.mean(diff * diff)
