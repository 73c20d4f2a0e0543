"""Self-recording numerical goldens for real-weight validation.

The reference has no tests; its de-facto acceptance is behavior under real
SD weights (trainscripts/textsliders/model_util.py:104-129 loads them). In
this build, the first run on real weights RECORDS the model's eps
prediction on fixed probe inputs; every later run (new conversion code,
refactors, dtype changes) compares against the recording — so conversion
or model regressions on real checkpoints fail loudly.

Shared by tests/test_real_weights.py and cli/validate_real_weights.py (the
real-weight runbook), and dry-run-exercised on synthetic snapshots by
tests/test_real_weights.py so the code path is proven BEFORE real weights
ever appear.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp


def fixed_unet_probe(cfg, spatial: int = 64, tokens: int = 77):
    """Deterministic probe inputs for an eps golden (fixed keys, f32)."""
    x = jax.random.normal(
        jax.random.key(11), (1, spatial, spatial, cfg.in_channels), jnp.float32
    )
    ehs = jax.random.normal(
        jax.random.key(12), (1, tokens, cfg.cross_attention_dim), jnp.float32
    )
    return x, jnp.asarray([500.0]), ehs


def record_or_compare_eps_golden(
    models, golden_path: str, *, atol: float = 1e-3, spatial: int = 64
) -> str:
    """Run the UNet on the fixed probe; record `golden_path` if absent
    (returns 'recorded'), else compare (returns 'matched' or raises).

    Non-finite predictions always raise — a golden of NaNs would 'match'
    forever."""
    from sliders_tpu.models import unet2d

    cfg = models.unet_config
    x, t, ehs = fixed_unet_probe(cfg, spatial=spatial)
    added = None
    if cfg.addition_embed_type == "text_time":
        pooled_dim = (
            cfg.projection_class_embeddings_input_dim
            - 6 * cfg.addition_time_embed_dim
        )
        added = {
            "text_embeds": jax.random.normal(
                jax.random.key(13), (1, pooled_dim), jnp.float32
            ),
            "time_ids": jnp.asarray(
                [[spatial * 8, spatial * 8, 0, 0, spatial * 8, spatial * 8]],
                jnp.float32,
            ),
        }
    eps = np.asarray(
        unet2d.apply(models.unet_params, cfg, x, t, ehs, added_cond=added)
    )
    if not np.isfinite(eps).all():
        raise AssertionError("UNet eps prediction contains non-finite values")
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path) or ".", exist_ok=True)
        np.savez(golden_path, eps=eps)
        return "recorded"
    want = np.load(golden_path)["eps"]
    np.testing.assert_allclose(eps, want, atol=atol)
    return "matched"
