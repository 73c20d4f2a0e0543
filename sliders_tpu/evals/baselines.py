"""Baseline methods the reference eval harness compares sliders against
(SURVEY.md §2.4).

- UCE (unified concept editing): full-model weight-delta interpolation
  `old + scale * (edited - old)` per slider scale, swapped in mid-sampling
  at the start_noise boundary (eval-scripts/generate_images-uce.py:106-111,
  193-215). With our two-segment sampler this is just: segment 1 runs the
  base params, segment 2 runs the interpolated params.

- Textual inversion: a learned token embedding injected into the prompt
  (eval-scripts/generate_images_textinversion.py:20-36): we splice the
  learned vector(s) into the token-embedding matrix under a placeholder id.
  The XL variant writes the {'emb','emb2'} pair into BOTH encoders
  (eval-scripts/generate_images_textinversion_xl.py:9-27).

- Custom diffusion: a delta checkpoint holding fine-tuned attn2 projections
  (K/V for 'crossattn_kv', all of attn2 for 'crossattn', optionally
  low-rank-compressed as additive u@v) plus modifier-token embeddings for
  both encoders, added as NEW tokens to both tokenizers
  (eval-scripts/generate_images_customdiffusion.py:688-785 load_model).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sliders_tpu.diffusion.schedulers import Sampler
from sliders_tpu.models import unet2d
from sliders_tpu.utils import pytree


def interpolate_params(old: dict, edited: dict, scale) -> dict:
    """UCE per-scale model: old + scale * (edited - old), leafwise."""
    return jax.tree.map(
        lambda a, b: (
            a.astype(jnp.float32) + scale * (b.astype(jnp.float32) - a.astype(jnp.float32))
        ).astype(a.dtype),
        old,
        edited,
    )


def make_uce_sampling_fn(
    unet_cfg: unet2d.UNetConfig,
    sampler: Sampler,
    *,
    guidance_scale_default: float = 7.5,
    compute_dtype=jnp.bfloat16,
):
    """fn(old_params, edited_params, latents, cond, uncond, scale,
    start_noise, guidance_scale, key) — base weights while t > start_noise,
    the scale-interpolated weights after (the reference's state_dict swap)."""
    from sliders_tpu.diffusion.guidance import cfg_combine

    n = sampler.num_steps
    needs_step_key = sampler.kind in ("ddpm", "euler_a")

    def fn(old_params, edited_params, latents, cond, uncond, scale, start_noise,
           guidance_scale, key):
        ehs = jnp.concatenate([uncond, cond]).astype(compute_dtype)
        interp = interpolate_params(old_params, edited_params, scale)

        def make_body(p):
            def body(i, carry):
                x, s_state = carry
                x2 = sampler.scale_model_input(jnp.concatenate([x, x]), i).astype(compute_dtype)
                eps = unet2d.apply(p, unet_cfg, x2, sampler.timesteps[i], ehs)
                eps = cfg_combine(eps, guidance_scale)
                k = jax.random.fold_in(key, i) if needs_step_key else None
                x, s_state = sampler.step(i, eps, x, s_state, key=k)
                return (x.astype(compute_dtype), s_state)
            return body

        active = sampler.timesteps <= start_noise
        boundary = jnp.where(jnp.any(active), jnp.argmax(active), n)
        carry = (latents.astype(compute_dtype), sampler.init_state(latents))
        carry = jax.lax.fori_loop(0, boundary, make_body(old_params), carry)
        carry = jax.lax.fori_loop(boundary, n, make_body(interp), carry)
        return carry[0]

    return jax.jit(fn)


def load_uce_unet(checkpoint_path: str, old_params: dict) -> dict:
    """Ingest a UCE-edited torch UNet state_dict (.pt) into our param tree.

    The reference consumes full diffusers-UNet state_dicts saved by the UCE
    editing code and interpolates them against the original weights
    (eval-scripts/generate_images-uce.py:193-215). We torch.load the file,
    run the standard layout conversion (models/convert.py), and validate the
    tree matches `old_params` leafwise."""
    import torch

    from sliders_tpu.models.convert import convert_state_dict

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    edited = convert_state_dict(
        {k: v.float().numpy() for k, v in state.items()}
    )
    old_flat = pytree.flatten(old_params)
    new_flat = pytree.flatten(edited)
    missing = set(old_flat) - set(new_flat)
    if missing:
        raise KeyError(f"UCE checkpoint is missing {len(missing)} UNet params, e.g. {sorted(missing)[:3]}")
    out = {
        k: jnp.asarray(new_flat[k], old_flat[k].dtype) for k in old_flat
    }
    return pytree.unflatten(out)


def apply_custom_diffusion(unet_params: dict, state: dict, compress: bool = False) -> dict:
    """Custom-diffusion baseline UNet deltas
    (eval-scripts/generate_images_customdiffusion.py:781-785): fine-tuned
    attn2 projections loaded over the base UNet — K/V for the
    'crossattn_kv' freeze mode, all attn2 params for 'crossattn'. With
    `compress`, to_k/to_v entries are {'u','v'} low-rank factors applied
    ADDITIVELY: param += u @ v (torch layout).

    `state`: flat dict of torch-layout weights keyed like
    'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight'
    (any 'unet.' prefix is stripped)."""
    flat = pytree.flatten(unet_params)
    out = dict(flat)
    n = 0
    for k, w in state.items():
        k = k.removeprefix("unet.")
        if "attn2" not in k:
            continue
        if k not in out:
            raise KeyError(f"custom-diffusion weight {k} not in UNet")
        cur = out[k]
        if compress and isinstance(w, dict):  # {'u','v'} additive low-rank
            delta = np.asarray(w["u"]) @ np.asarray(w["v"])
            out[k] = cur + jnp.asarray(delta.T, cur.dtype)
        elif k.endswith(".weight") and np.asarray(w).ndim == 2:
            out[k] = jnp.asarray(np.asarray(w).T, cur.dtype)  # (out,in)->(in,out)
        else:
            out[k] = jnp.asarray(np.asarray(w), cur.dtype)  # biases / norms
        n += 1
    if n == 0:
        raise ValueError("no attn2 weights found in the checkpoint")
    return pytree.unflatten(out)


def apply_full_text_encoder(te_params: dict, state: dict) -> dict:
    """Replace a text encoder's params with a checkpoint's full state dict —
    the reference's `self.text_encoder.load_state_dict(st['text_encoder'])`
    (generate_images_customdiffusion.py:750-752). Torch-layout weights
    convert through models/convert.py; the token-embedding matrix may be
    LARGER than the base encoder's (saved after add_tokens) — the whole
    resized matrix is taken. Missing params raise (strict load, like
    torch's); non-param buffers (position_ids) are ignored."""
    from sliders_tpu.models.convert import convert_state_dict

    edited = pytree.flatten(
        convert_state_dict(
            {
                k: np.asarray(v.float() if hasattr(v, "float") else v)
                for k, v in state.items()
                if not k.endswith("position_ids")  # buffer, not a param
            }
        )
    )
    old = pytree.flatten(te_params)
    missing = set(old) - set(edited)
    if missing:
        raise KeyError(
            f"text-encoder state dict is missing {len(missing)} params, "
            f"e.g. {sorted(missing)[:3]}"
        )
    unknown = set(edited) - set(old)
    if unknown:
        raise KeyError(
            f"text-encoder state dict has {len(unknown)} unknown params, "
            f"e.g. {sorted(unknown)[:3]}"
        )
    out = {}
    for k in old:
        new = edited[k]
        if (
            k.endswith("token_embedding.weight")
            and new.shape[0] >= old[k].shape[0]
            and new.shape[1] == old[k].shape[1]
        ):
            pass  # resized-vocab matrix: take the larger one whole
        elif tuple(new.shape) != tuple(old[k].shape):
            raise ValueError(
                f"text-encoder param {k} shape {new.shape} != {old[k].shape}"
            )
        out[k] = jnp.asarray(new, old[k].dtype)
    return pytree.unflatten(out)


def resize_token_embeddings(te_params: dict, new_size: int) -> dict:
    """Grow the token-embedding matrix to `new_size` rows (new rows zero) —
    the JAX equivalent of text_encoder.resize_token_embeddings after
    tokenizer.add_tokens (generate_images_customdiffusion.py:769-772)."""
    flat = dict(pytree.flatten(te_params))
    key = "text_model.embeddings.token_embedding.weight"
    emb = flat[key]
    if new_size < emb.shape[0]:
        raise ValueError(f"cannot shrink embeddings {emb.shape[0]} -> {new_size}")
    if new_size > emb.shape[0]:
        pad = jnp.zeros((new_size - emb.shape[0], emb.shape[1]), emb.dtype)
        flat[key] = jnp.concatenate([emb, pad], axis=0)
    return pytree.unflatten(flat)


def load_custom_diffusion(
    checkpoint_path: str,
    unet_params: dict,
    tokenizers: list,
    te_params_list: list[dict],
    compress: bool = False,
) -> tuple[dict, list[dict]]:
    """Full custom-diffusion checkpoint load: the runnable composition of
    attn2 deltas + modifier tokens the reference's `load_model` performs
    (generate_images_customdiffusion.py:749-785).

    The delta dict (torch.save format) holds:
      'unet': {param_name: tensor | {'u','v'}} attn2 deltas;
      'modifier_token': {token: [emb_for_encoder1, emb_for_encoder2, ...]};
      optionally 'text_encoder'/'text_encoder_2' full state dicts, applied
      as whole-encoder replacements BEFORE the modifier-token handling
      (the reference's load order, :750-752).

    Mutates the tokenizers (add_tokens) and returns
    (new_unet_params, new_te_params_list)."""
    import torch

    st = torch.load(checkpoint_path, map_location="cpu", weights_only=True)

    te_params_list = list(te_params_list)
    if "text_encoder" in st:
        te_params_list[0] = apply_full_text_encoder(
            te_params_list[0], st["text_encoder"]
        )
        if "text_encoder_2" in st:
            if len(te_params_list) < 2:
                raise ValueError(
                    "checkpoint carries text_encoder_2 but the pipeline has "
                    "one text encoder (XL checkpoint on an SD1 base?)"
                )
            te_params_list[1] = apply_full_text_encoder(
                te_params_list[1], st["text_encoder_2"]
            )
    for token, embs in st.get("modifier_token", {}).items():
        for i, tok in enumerate(tokenizers):
            if tok.add_tokens(token) == 0:
                raise ValueError(f"tokenizer already contains {token!r}")
            tid = tok.convert_tokens_to_ids(token)
            te_params_list[i] = resize_token_embeddings(te_params_list[i], len(tok))
            te_params_list[i] = inject_learned_token(
                te_params_list[i], jnp.asarray(np.asarray(embs[i].float())), [tid]
            )

    unet_state = {k: (v if isinstance(v, dict) else v.float().numpy())
                  for k, v in st.get("unet", {}).items()}
    if unet_state:
        unet_params = apply_custom_diffusion(unet_params, unet_state, compress=compress)
    return unet_params, te_params_list


def inject_learned_token_xl(
    te_params_list: list[dict],
    tokenizers: list,
    emb_dict: dict,
    token: str = "my",
) -> list[dict]:
    """XL textual-inversion baseline: write the learned {'emb','emb2'} pair
    into BOTH encoders' embedding rows for `token`
    (eval-scripts/generate_images_textinversion_xl.py:9-27 set_XLembedding).
    `token` must already be a single token in both tokenizers."""
    out = []
    for i, (tok, te_params) in enumerate(zip(tokenizers, te_params_list)):
        ids = tok.tokenize(token)
        if len(ids) != 1:
            raise ValueError(f"token {token!r} is not a single token in tokenizer {i}")
        emb = jnp.asarray(np.asarray(emb_dict["emb" if i == 0 else "emb2"]))
        out.append(inject_learned_token(te_params, emb, [int(ids[0])]))
    return out


def inject_learned_token(
    te_params: dict, learned_embeddings: jnp.ndarray, token_ids: list[int]
) -> dict:
    """Textual-inversion baseline: write learned vectors into the token
    embedding rows `token_ids` (the reference loads a <token> embedding and
    adds it to the tokenizer/prompt)."""
    flat = pytree.flatten(te_params)
    key = "text_model.embeddings.token_embedding.weight"
    emb = flat[key]
    if learned_embeddings.ndim == 1:
        learned_embeddings = learned_embeddings[None]
    emb = emb.at[jnp.asarray(token_ids)].set(learned_embeddings.astype(emb.dtype))
    flat = dict(flat)
    flat[key] = emb
    return pytree.unflatten(flat)
