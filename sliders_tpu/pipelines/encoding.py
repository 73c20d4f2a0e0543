"""Prompt encoding pipelines (SD1/2 single encoder, SDXL dual encoder).

Contracts from the reference:
  - SD1/2: last hidden state of CLIP, tokens padded to 77
    (train_util.encode_prompts, train_util.py:60-88);
  - SDXL: concat of BOTH encoders' penultimate hidden states on the feature
    dim + pooled projection from encoder 2 (train_util.text_encode_xl /
    encode_prompts_xl, train_util.py:92-133).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.models import clip_text


def encode_prompts(
    tokenizer,
    te_params: dict,
    te_cfg: clip_text.ClipTextConfig,
    prompts: list[str],
    num_layers: Optional[int] = None,
) -> jax.Array:
    """(B, 77, D) last hidden state."""
    ids = jnp.asarray(tokenizer(prompts))
    out = clip_text.apply(te_params, ids, te_cfg, num_layers=num_layers)
    return out["last_hidden_state"]


def encode_prompts_xl(
    tokenizers,
    te_params_list,
    te_cfgs,
    prompts: list[str],
) -> tuple[jax.Array, jax.Array]:
    """Returns (text_embeds (B, 77, D1+D2), pooled_embeds (B, 1280))."""
    embeds = []
    pooled = None
    for tok, params, cfg in zip(tokenizers, te_params_list, te_cfgs):
        ids = jnp.asarray(tok(prompts))
        out = clip_text.apply(params, ids, cfg)
        embeds.append(out["hidden_states"][-2])  # penultimate, always
        pooled = out.get("text_embeds", out["pooler_output"])  # encoder 2 wins
    return jnp.concatenate(embeds, axis=-1), pooled
