"""T5 encoder (T5-v1.1 / FLUX text-encoder-2) as pure JAX.

Replaces the transformers `T5EncoderModel` the FLUX pipeline encodes prompts
with (custom_flux_pipeline.py:201-287 uses its last hidden state, 512
tokens). Param tree mirrors the transformers state_dict
(encoder.block.N.layer.{0,1}..., shared embedding, relative position bias on
block 0), linear weights stored (in, out).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.ops.attention import multihead_attention
from sliders_tpu.ops.basic import linear


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6


T5_XXL = T5Config()
TINY = T5Config(
    vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
)


def rms_norm(p: dict, x: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x = (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(p["weight"].dtype)
    return x * p["weight"]


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional bucketing (host numpy — static per sequence length)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def position_bias(params: dict, cfg: T5Config, length: int) -> jax.Array:
    """(1, heads, L, L) additive bias from block-0's relative embedding."""
    ctx = np.arange(length)[:, None]
    mem = np.arange(length)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    table = params["encoder"]["block"]["0"]["layer"]["0"]["SelfAttention"][
        "relative_attention_bias"
    ]["weight"]  # (num_buckets, heads)
    bias = table[jnp.asarray(buckets)]  # (L, L, heads)
    return jnp.transpose(bias, (2, 0, 1))[None]


def apply(params: dict, input_ids: jax.Array, cfg: T5Config, attention_mask=None) -> jax.Array:
    """Returns the encoder last hidden state (B, L, d_model)."""
    enc = params["encoder"]
    x = params["shared"]["weight"][input_ids]
    L = input_ids.shape[1]
    bias = position_bias(params, cfg, L)
    if attention_mask is not None:
        neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias + neg
    inner = cfg.num_heads * cfg.d_kv
    for i in range(cfg.num_layers):
        blk = enc["block"][str(i)]["layer"]
        # self attention (T5 scales by 1 — fold 1/sqrt(d) out by pre-scaling q)
        a = blk["0"]
        h = rms_norm(a["layer_norm"], x, cfg.layer_norm_eps)
        sa = a["SelfAttention"]
        q = linear(sa["q"], h) * jnp.sqrt(jnp.asarray(cfg.d_kv, jnp.float32)).astype(h.dtype)
        k = linear(sa["k"], h)
        v = linear(sa["v"], h)
        att = multihead_attention(q, k, v, cfg.num_heads, mask=bias)
        x = x + linear(sa["o"], att)
        # gated-gelu mlp
        m = blk["1"]
        h = rms_norm(m["layer_norm"], x, cfg.layer_norm_eps)
        ff = m["DenseReluDense"]
        h = jax.nn.gelu(linear(ff["wi_0"], h), approximate=True) * linear(ff["wi_1"], h)
        x = x + linear(ff["wo"], h)
    return rms_norm(enc["final_layer_norm"], x, cfg.layer_norm_eps)


def init_params(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    c = [0]

    def nk():
        c[0] += 1
        return jax.random.fold_in(key, c[0])

    def dense(i, o):
        return {"weight": jax.random.normal(nk(), (i, o), dtype) * (i**-0.5)}

    def rn(d):
        return {"weight": jnp.ones((d,), dtype)}

    inner = cfg.num_heads * cfg.d_kv
    blocks = {}
    for i in range(cfg.num_layers):
        sa = {
            "q": dense(cfg.d_model, inner),
            "k": dense(cfg.d_model, inner),
            "v": dense(cfg.d_model, inner),
            "o": dense(inner, cfg.d_model),
        }
        if i == 0:
            sa["relative_attention_bias"] = {
                "weight": jax.random.normal(
                    nk(), (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
                )
                * 0.02
            }
        blocks[str(i)] = {
            "layer": {
                "0": {"SelfAttention": sa, "layer_norm": rn(cfg.d_model)},
                "1": {
                    "DenseReluDense": {
                        "wi_0": dense(cfg.d_model, cfg.d_ff),
                        "wi_1": dense(cfg.d_model, cfg.d_ff),
                        "wo": dense(cfg.d_ff, cfg.d_model),
                    },
                    "layer_norm": rn(cfg.d_model),
                },
            }
        }
    return {
        "shared": {"weight": jax.random.normal(nk(), (cfg.vocab_size, cfg.d_model), dtype) * 0.02},
        "encoder": {"block": blocks, "final_layer_norm": rn(cfg.d_model)},
    }
