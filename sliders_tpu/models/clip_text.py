"""CLIP text encoders (CLIP-L/14 for SD1/SDXL enc-1, OpenCLIP bigG for SDXL
enc-2, CLIP-H-era 23-layer for SD2) as pure JAX functions.

Replaces the reference's transformers `CLIPTextModel` /
`CLIPTextModelWithProjection` (model_util.py:44-65,154-167). Output contract
matches `train_util.encode_prompts` (last hidden state, train_util.py:73-88)
and `text_encode_xl` (penultimate hidden state + pooled projection,
train_util.py:92-107).

Param tree mirrors the transformers state_dict
(text_model.embeddings / encoder.layers.N / final_layer_norm [+
text_projection]) with linear weights stored (in, out).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sliders_tpu.ops.attention import causal_mask, multihead_attention
from sliders_tpu.ops.basic import ACTIVATIONS, layer_norm, linear


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection
    layer_norm_eps: float = 1e-5


# the three encoders the reference loads (model_util.py:29-74,132-176)
CLIP_L = ClipTextConfig()  # SD1 / SDXL text_encoder
CLIP_SD2 = ClipTextConfig(
    hidden_size=1024, num_layers=23, num_heads=16, intermediate_size=4096,
    hidden_act="gelu",
)  # SD2.x text_encoder loaded with num_hidden_layers=23 (model_util.py:48)
CLIP_BIG_G = ClipTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)  # SDXL text_encoder_2

TINY = ClipTextConfig(
    vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_positions=16, eos_token_id=99, projection_dim=24,
)


def _encoder_layer(p: dict, x: jax.Array, cfg: ClipTextConfig, mask: jax.Array) -> jax.Array:
    residual = x
    h = layer_norm(p["layer_norm1"], x, cfg.layer_norm_eps)
    attn = p["self_attn"]
    q = linear(attn["q_proj"], h)
    k = linear(attn["k_proj"], h)
    v = linear(attn["v_proj"], h)
    h = multihead_attention(q, k, v, cfg.num_heads, mask=mask)
    h = linear(attn["out_proj"], h)
    x = residual + h

    residual = x
    h = layer_norm(p["layer_norm2"], x, cfg.layer_norm_eps)
    h = linear(p["mlp"]["fc1"], h)
    h = ACTIVATIONS[cfg.hidden_act](h)
    h = linear(p["mlp"]["fc2"], h)
    return residual + h


def apply(
    params: dict,
    input_ids: jax.Array,
    cfg: ClipTextConfig,
    *,
    num_layers: Optional[int] = None,
    dtype=jnp.float32,
) -> dict:
    """Run the text encoder.

    Returns {'last_hidden_state', 'hidden_states' (tuple, embeddings + each
    layer), 'pooler_output', 'text_embeds' (if projection)}.

    `num_layers` truncates the stack — the clip_skip mechanism the reference
    uses by instantiating the model with fewer layers (model_util.py:48,62);
    final_layer_norm still applies on top of the truncated stack.
    """
    tm = params["text_model"]
    emb = tm["embeddings"]
    B, L = input_ids.shape
    x = emb["token_embedding"]["weight"][input_ids].astype(dtype)
    x = x + emb["position_embedding"]["weight"][:L].astype(dtype)

    mask = causal_mask(L)
    n = num_layers if num_layers is not None else cfg.num_layers
    hidden_states = [x]
    for i in range(n):
        x = _encoder_layer(tm["encoder"]["layers"][str(i)], x, cfg, mask)
        hidden_states.append(x)

    last = layer_norm(tm["final_layer_norm"], x, cfg.layer_norm_eps)

    # pooled = hidden state at the EOS position (transformers CLIP semantics:
    # first occurrence of eos_token_id)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = last[jnp.arange(B), eos_pos]

    out = {
        "last_hidden_state": last,
        "hidden_states": tuple(hidden_states),
        "pooler_output": pooled,
    }
    if cfg.projection_dim is not None and "text_projection" in params:
        out["text_embeds"] = linear(params["text_projection"], pooled)
    return out


def init_params(key: jax.Array, cfg: ClipTextConfig, dtype=jnp.float32) -> dict:
    """Random init (for tests/benchmarks; real weights come from convert.py)."""
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))

    def dense(kin, kout, bias=True):
        p = {"weight": jax.random.normal(next(keys), (kin, kout), dtype) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((kout,), dtype)
        return p

    def ln(d):
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    d, m = cfg.hidden_size, cfg.intermediate_size
    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "layer_norm1": ln(d),
            "layer_norm2": ln(d),
            "self_attn": {
                "q_proj": dense(d, d),
                "k_proj": dense(d, d),
                "v_proj": dense(d, d),
                "out_proj": dense(d, d),
            },
            "mlp": {"fc1": dense(d, m), "fc2": dense(m, d)},
        }
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {
                    "weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02
                },
                "position_embedding": {
                    "weight": jax.random.normal(next(keys), (cfg.max_positions, d), dtype) * 0.02
                },
            },
            "encoder": {"layers": layers},
            "final_layer_norm": ln(d),
        }
    }
    if cfg.projection_dim is not None:
        params["text_projection"] = dense(d, cfg.projection_dim, bias=False)
    return params
