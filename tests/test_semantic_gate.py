"""Semantic acceptance gates (VERDICT r2 item 2).

1. "The slider actually slides": train a tiny image slider on synthetic
   paired images whose only difference is a computable attribute
   (brightness), then assert the decoded samples are MONOTONE in the slider
   scale over [-2, 2] — and that a wrong-sign LoRA update reverses the
   ordering (i.e. would fail this gate). This is the hermetic stand-in for
   the reference's CLIP-score-vs-scale acceptance curve
   (eval-scripts/clip_score.py:53-69).

2. The FULL eval pipeline end-to-end at the CLI level:
   cli/generate_images -> cli/clip_score -> cli/lpips_score, producing the
   reference's clip_scores.csv / lpips_score.csv on tiny models
   (lpip_score.py:53-76 protocol: every scale folder scored against the
   scale-0 folder).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_tiny_clip_snapshot, make_tiny_snapshot

pytestmark = pytest.mark.slow


def _brightness_sweep(fn, unet_params, vae_params, vae_cfg, lora_weights, emb,
                      uncond, lats, scales):
    from sliders_tpu.pipelines import text2image as t2i

    vals = []
    for s in scales:
        out = fn(
            unet_params, lats, emb, uncond, lora_weights,
            jnp.asarray(float(s)), jnp.asarray(1000.0), jnp.asarray(1.0),
            jax.random.key(5),
        )
        img = t2i.decode_images(vae_params, vae_cfg, out)
        vals.append(float(np.asarray(img, np.float32).mean()))
    return vals


# The pretrained "base model" for the gate (a tiny VAE that actually
# autoencodes + a tiny UNet that denoises the neutral-brightness
# distribution) is a FIXTURE, not part of the behavior under test — the
# reference's regime is exactly "a real pretrained base model, plus a slider
# trained on top". Pretraining it takes ~800 jitted steps (~30 min on a
# 1-core host), so the result is committed as an npz and regenerated
# automatically (same probe-tuned recipe, deterministic seeds) whenever the
# file is missing or the model structure changed. Delete the npz to force
# regeneration.
_BASE_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "semantic_gate_base.npz"
)


def _pretrain_base(cfg, vae_cfg, schedule, emb):
    """Probe-tuned base-model pretrain (see inline comments); returns
    (vae_params, unet_params)."""
    import optax

    from sliders_tpu.models import unet2d, vae

    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    vae_params = vae.init_params(jax.random.key(1), vae_cfg)

    # Pre-train the tiny VAE as an actual autoencoder on the synthetic image
    # distribution: at random init decode() is NOT an inverse of encode(), so
    # "decoded mean brightness" would be an arbitrary function of the latent
    # direction the LoRA learns. The reference operates on a *real* VAE where
    # the round trip holds; ~200 MSE steps restores that property for the gate.
    ae_opt = optax.adam(2e-3)

    @jax.jit
    def ae_step(vp, ost, imgs):
        def loss_fn(vp):
            mean, _ = vae.encode(vp, vae_cfg, imgs)
            rec = vae.decode(vp, vae_cfg, mean)
            return jnp.mean((rec - imgs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(vp)
        updates, ost = ae_opt.update(grads, ost)
        return optax.apply_updates(vp, updates), ost, loss

    ae_rng = np.random.default_rng(7)
    ost = ae_opt.init(vae_params)
    ae_l0 = ae_l = None
    for i in range(200):
        base = ae_rng.normal(0.0, 0.25, (8, 64, 64, 3)).astype(np.float32)
        shift = ae_rng.uniform(-0.5, 0.5, (8, 1, 1, 1)).astype(np.float32)
        vae_params, ost, l = ae_step(vae_params, ost, jnp.asarray(np.clip(base + shift, -1, 1)))
        if i == 0:
            ae_l0 = float(l)
        ae_l = float(l)
    assert ae_l < 0.25 * ae_l0, f"VAE autoencoder pretrain did not converge: {ae_l0} -> {ae_l}"

    # Pre-train the tiny UNet as a denoiser of the NEUTRAL-brightness
    # distribution only. Two reasons (probe-validated, round 3): (a) samples
    # from a random UNet are far off the VAE's data manifold, so their decode
    # is arbitrary; (b) if the base model already explains the FULL
    # brightness range, the paired supervision is uninformative and the
    # slider learns a tiny, sign-confused direction (V-shaped sweep). The
    # reference's real regime is exactly this: a pretrained base model, and
    # a slider pushing OFF its modal manifold.
    den_opt = optax.adam(1e-3)

    @jax.jit
    def den_step(up, ost, imgs, key):
        k_post, k_t, k_noise = jax.random.split(key, 3)
        mean, logvar = vae.encode(vae_params, vae_cfg, imgs)
        lat = vae.normalize_latents(vae_cfg, vae.sample_latents(mean, logvar, k_post))
        t = jax.random.randint(k_t, (), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_noise, lat.shape, lat.dtype)
        noisy = schedule.add_noise(lat, noise, jnp.broadcast_to(t, (lat.shape[0],)))
        ehs = jnp.broadcast_to(emb, (lat.shape[0],) + emb.shape)

        def loss_fn(up):
            eps = unet2d.apply(up, cfg, noisy, t, ehs)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(up)
        updates, ost = den_opt.update(grads, ost)
        return optax.apply_updates(up, updates), ost, loss

    ost = den_opt.init(unet_params)
    for i in range(600):
        base = ae_rng.normal(0.0, 0.25, (8, 64, 64, 3)).astype(np.float32)
        nshift = ae_rng.normal(0.0, 0.05, (8, 1, 1, 1)).astype(np.float32)
        unet_params, ost, den_l = den_step(
            unet_params, ost, jnp.asarray(np.clip(base + nshift, -1, 1)),
            jax.random.key(1000 + i),
        )
    assert float(den_l) < 0.5, f"denoiser pretrain did not converge: {float(den_l)}"
    return vae_params, unet_params


def _fixture_still_denoises(u, v, cfg, vae_cfg, schedule, emb) -> None:
    """Behavioral staleness check (VERDICT r3 weak 7): the fixture must
    still DENOISE under the current model code — a semantics change in
    unet2d/vae would keep passing the shape check while silently
    invalidating the probe-tuned recipe. Pretrained loss here is ~0.03-0.3;
    a random-init model scores ~1.3."""
    from sliders_tpu.models import unet2d, vae

    rng = np.random.default_rng(123)
    imgs = jnp.asarray(
        np.clip(rng.normal(0.0, 0.25, (4, 64, 64, 3)), -1, 1), jnp.float32
    )
    mean, _ = vae.encode(v, vae_cfg, imgs)
    lat = vae.normalize_latents(vae_cfg, mean)
    noise = jax.random.normal(jax.random.key(42), lat.shape, lat.dtype)
    t = jnp.full((lat.shape[0],), 500)
    noisy = schedule.add_noise(lat, noise, t)
    ehs = jnp.broadcast_to(emb, (lat.shape[0],) + emb.shape)
    eps = unet2d.apply(u, cfg, noisy, t[0], ehs)
    mse = float(jnp.mean((eps - noise) ** 2))
    if mse > 0.6:
        raise ValueError(f"fixture no longer denoises (eps MSE {mse:.3f})")


def _load_or_pretrain_base(cfg, vae_cfg, schedule, emb):
    from sliders_tpu.models import unet2d, vae

    # structure donors: fresh inits give the treedefs + expected shapes
    ref_u = unet2d.init_params(jax.random.key(0), cfg)
    ref_v = vae.init_params(jax.random.key(1), vae_cfg)
    if os.path.exists(_BASE_FIXTURE):
        try:
            z = np.load(_BASE_FIXTURE)
            lu = [jnp.asarray(z[f"u{i}"]) for i in range(int(z["n_u"]))]
            lv = [jnp.asarray(z[f"v{i}"]) for i in range(int(z["n_v"]))]
            u = jax.tree.unflatten(jax.tree.structure(ref_u), lu)
            v = jax.tree.unflatten(jax.tree.structure(ref_v), lv)
            for got, want in zip(lu + lv, jax.tree.leaves(ref_u) + jax.tree.leaves(ref_v)):
                if (got.shape, got.dtype) != (want.shape, want.dtype):
                    raise ValueError(
                        f"shape/dtype drift: fixture {got.shape}/{got.dtype} "
                        f"vs model {want.shape}/{want.dtype}"
                    )
            _fixture_still_denoises(u, v, cfg, vae_cfg, schedule, emb)
            return v, u
        except Exception as e:  # stale fixture (model structure changed)
            print(f"semantic-gate fixture stale ({e!r}); regenerating")
    vae_params, unet_params = _pretrain_base(cfg, vae_cfg, schedule, emb)
    os.makedirs(os.path.dirname(_BASE_FIXTURE), exist_ok=True)
    lu = [np.asarray(x) for x in jax.tree.leaves(unet_params)]
    lv = [np.asarray(x) for x in jax.tree.leaves(vae_params)]
    np.savez_compressed(
        _BASE_FIXTURE,
        n_u=len(lu), n_v=len(lv),
        **{f"u{i}": x for i, x in enumerate(lu)},
        **{f"v{i}": x for i, x in enumerate(lv)},
    )
    return vae_params, unet_params


def test_image_slider_slides_monotone():
    """Brightness slider: +scale must brighten, -scale must darken, strictly
    monotone across [-2,-1,0,1,2]; negating the learned LoRA direction (a
    wrong-sign update) must reverse the ordering and fail the same gate.

    The pretrained base model comes from the committed fixture (see
    _load_or_pretrain_base above); the slider TRAINING and both acceptance
    gates always run live."""
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d, vae
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.image_slider import make_image_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState

    cfg = unet2d.TINY
    vae_cfg = vae.TINY
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=5)
    emb = jax.random.normal(jax.random.key(4), (7, cfg.cross_attention_dim))
    vae_params, unet_params = _load_or_pretrain_base(cfg, vae_cfg, schedule, emb)

    lora = lnet.create_slider_network(
        jax.random.key(2), unet_params, rank=4, train_method="noxattn",
        init_a=5**0.5,
    )
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 1e-2, 2000),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_image_slider_step(
        cfg, vae_cfg, schedule, sampler, optimizer,
        max_denoising_steps=5, compute_dtype=jnp.float32, remat=False,
        donate=False,
    )
    state = SliderTrainState.create(jax.random.key(3), lora, optimizer)

    # reference image-slider protocol: ALL prompts empty, guidance 1
    # (imagesliders/data/prompts.yaml — "let the model figure out the edit"),
    # so positive == neutral == unconditional; the slider direction lives
    # entirely in the LoRA multiplier, and inference conditioning matches
    # training at every sign of the scale.
    emb_pos = emb_neu = emb_unc = emb

    # reference multi-folder protocol (train_lora-scale.py:211-213): each iter
    # picks s=abs(choice(scales)) and pairs folders at -s/+s; here the paired
    # "folders" are synthetic brightness offsets proportional to s, so the LoRA
    # sees the attribute at BOTH |s|=1 and |s|=2 and learns a linear direction
    # (training only at s=1 left the -2 extrapolation non-monotone). 200 steps
    # of 4-pair batches at lr 1e-2 sit in the middle of the probe-measured
    # stable window (monotone at 100-300 steps; overtraining past ~400 blows
    # up the -2 extrapolation).
    rng = np.random.default_rng(0)
    losses = []
    for i in range(200):
        s = float(rng.choice((1.0, 2.0)))
        base = rng.normal(0.0, 0.25, (4, 64, 64, 3)).astype(np.float32)
        batch = {
            "images_high": jnp.asarray(np.clip(base + 0.3 * s, -1, 1)),
            "images_low": jnp.asarray(np.clip(base - 0.3 * s, -1, 1)),
            "scale": jnp.asarray(s),
            "positive": emb_pos,
            "neutral": emb_neu,
            "unconditional": emb_unc,
        }
        state, metrics = step(state, unet_params, vae_params, batch)
        losses.append(float(metrics["loss"]))
    # No loss-decrease assertion here: the per-step loss clusters by the
    # sampled denoise timestep (probe-measured bands ~0.13 vs ~0.59), so
    # short-window means compare timestep mixes, not training progress — a
    # 30-step window check flaked exactly this way. The REAL acceptance
    # gates follow: the decoded sweep must be monotone in scale, and the
    # wrong-sign network must fail the identical check.

    # sample at the training latent resolution (the tiny VAE downsamples 2x:
    # 64px images -> 32x32 latents; initial_latents divides by 8)
    fn = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    lats = t2i.initial_latents(jax.random.key(6), 8, 256, 256, sampler.init_noise_sigma)
    emb = jnp.tile(emb_pos[None], (8, 1, 1))
    unc = jnp.tile(emb_unc[None], (8, 1, 1))
    scales = (-2.0, -1.0, 0.0, 1.0, 2.0)
    vals = _brightness_sweep(
        fn, unet_params, vae_params, vae_cfg, state.lora, emb, unc, lats, scales
    )
    diffs = np.diff(vals)
    assert (diffs > 0).all(), f"brightness not monotone in scale: {vals}"

    # wrong-sign gate: negate the learned up-projections (== a wrong-sign
    # LoRA update); the identical acceptance check must now FAIL
    neg_lora = {
        name: {**entry, "up": -entry["up"]} for name, entry in state.lora.items()
    }
    neg_vals = _brightness_sweep(
        fn, unet_params, vae_params, vae_cfg, neg_lora, emb, unc, lats, scales
    )
    neg_diffs = np.diff(neg_vals)
    assert not (neg_diffs > 0).all(), f"wrong-sign slider passed the gate: {neg_vals}"
    assert (neg_diffs < 0).all(), f"wrong-sign slider should darken with scale: {neg_vals}"


def test_full_eval_pipeline_cli_e2e(tmp_path):
    """generate_images -> clip_score -> lpips_score, all at the CLI level,
    on tiny hermetic snapshots — the reference's acceptance protocol
    (generate then score per scale) with its exact artifact layout."""
    import pandas as pd
    import torch

    from sliders_tpu.cli import clip_score as clip_cli
    from sliders_tpu.cli import generate_images as gen_cli
    from sliders_tpu.cli import lpips_score as lpips_cli
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader

    snapshot = make_tiny_snapshot(str(tmp_path / "sd_tiny"))
    clip_snap = make_tiny_clip_snapshot(str(tmp_path / "clip_tiny"))

    # a slider checkpoint (random weights suffice: the pipeline contract is
    # layout + CSV production; semantics are gated by the monotone test).
    # create_slider_network zero-inits the UP projections (reference
    # convention, lora.py:97-98), which makes a fresh network a no-op at
    # every scale — randomize them so the scale folders actually differ
    # (LPIPS > 0 is asserted below).
    m = loader.load_sd(snapshot, dtype=jnp.float32)
    lora = lnet.create_slider_network(
        jax.random.key(0), m.unet_params, rank=2, train_method="noxattn"
    )
    lora = {
        name: {
            **e,
            "up": 0.2 * jax.random.normal(jax.random.key(i), e["up"].shape, e["up"].dtype),
        }
        for i, (name, e) in enumerate(lora.items())
    }
    ckpt = tmp_path / "bright_alpha1.0_rank2_noxattn_last.safetensors"
    lora_io.save_slider(str(ckpt), lora)

    csv = tmp_path / "prompts.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n0,a car,42\n3,sun,3\n")

    out = tmp_path / "images"
    gen_args = gen_cli.build_parser().parse_args(
        [
            "--model_name", str(ckpt), "--prompts_path", str(csv),
            "--base", snapshot, "--save_path", str(out),
            "--image_size", "64", "--ddim_steps", "3", "--num_samples", "2",
            "--scales=-1,0,1", "--precision", "float32",
        ]
    )
    gen_cli.main(gen_args)
    run_dir = out / os.path.basename(str(ckpt)).replace(".safetensors", "")
    assert (run_dir / "-1" / "0_0.png").exists()

    # CLIP score CLI: per-scale columns written to clip_scores.csv
    clip_args = clip_cli.build_parser().parse_args(
        [
            "--im_path", str(run_dir), "--prompt", "a car",
            "--prompts_path", str(csv), "--clip_model", clip_snap,
        ]
    )
    clip_cli.main(clip_args)
    cdf = pd.read_csv(run_dir / "clip_scores.csv")
    assert {"clip_-1", "clip_0", "clip_1"} <= set(cdf.columns)
    assert cdf["clip_0"].notna().all()

    # LPIPS CLI over synthesized torch checkpoints (real architecture)
    alex = {}
    conv_shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    for idx, (o, i, k) in zip((0, 3, 6, 8, 10), conv_shapes):
        alex[f"features.{idx}.weight"] = torch.randn(o, i, k, k) * (i * k * k) ** -0.5
        alex[f"features.{idx}.bias"] = torch.zeros(o)
    lins = {
        f"lin{j}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
        for j, c in enumerate((64, 192, 384, 256, 256))
    }
    torch.save(alex, tmp_path / "alexnet.pth")
    torch.save(lins, tmp_path / "lpips_alex.pth")
    lp_args = lpips_cli.build_parser().parse_args(
        [
            "--im_path", str(run_dir), "--prompts_path", str(csv),
            "--true", "0",
            "--alexnet_weights", str(tmp_path / "alexnet.pth"),
            "--lpips_weights", str(tmp_path / "lpips_alex.pth"),
        ]
    )
    lpips_cli.main(lp_args)
    ldf = pd.read_csv(run_dir / "lpips_score.csv")
    assert {"lpips_-1", "lpips_1"} <= set(ldf.columns)
    # scale folders differ from scale 0 -> strictly positive distances
    assert (ldf["lpips_-1"].dropna() > 0).all()
    assert (ldf["lpips_1"].dropna() > 0).all()


# ---------------------------------------------------------------------------
# TEXT-slider semantic gate (VERDICT r3 item 3): the flagship self-supervised
# objective (prompt_util.py:108-135), end-to-end through the real CLI, on a
# tiny TEXT-CONDITIONED base model.
# ---------------------------------------------------------------------------

_TEXT_BASE_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "semantic_gate_text_base.npz"
)
_TEXT_PROMPTS = {"neutral": "a photo", "bright": "bright photo", "dark": "dark photo"}


def _encode_prompt(models, prompt):
    from sliders_tpu.pipelines.encoding import encode_prompts

    te = models.text_encoders[0]
    return encode_prompts(
        te.tokenizer, te.params, te.config, [prompt], num_layers=te.clip_skip_layers
    )[0]


def _pretrain_text_base(models, schedule):
    """Text-conditioned base pretrain (probe-tuned, experiments/
    textgate_probe.py): the frozen random tiny-CLIP provides distinct
    embeddings for 'a photo' / 'bright photo' / 'dark photo'; the UNet is
    trained so each conditioning denoises a correspondingly
    brightness-shifted image distribution; the VAE is a real autoencoder.
    Probe evidence (2026-08-18): the text-slider objective on this base is
    monotone for every (lr in 3e-3..1e-2, iters in 50..400) at guidance 1."""
    import optax

    from sliders_tpu.models import unet2d, vae

    cfg, vae_cfg = models.unet_config, models.vae_config
    unet_params, vae_params = models.unet_params, models.vae_params
    embs = {k: _encode_prompt(models, p) for k, p in _TEXT_PROMPTS.items()}

    ae_opt = optax.adam(2e-3)

    @jax.jit
    def ae_step(vp, ost, imgs):
        def loss_fn(vp):
            mean, _ = vae.encode(vp, vae_cfg, imgs)
            return jnp.mean((vae.decode(vp, vae_cfg, mean) - imgs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(vp)
        updates, ost = ae_opt.update(grads, ost)
        return optax.apply_updates(vp, updates), ost, loss

    rng = np.random.default_rng(7)
    ost = ae_opt.init(vae_params)
    l0 = l = None
    for i in range(200):
        base = rng.normal(0.0, 0.25, (8, 64, 64, 3)).astype(np.float32)
        shift = rng.uniform(-0.5, 0.5, (8, 1, 1, 1)).astype(np.float32)
        vae_params, ost, lv = ae_step(
            vae_params, ost, jnp.asarray(np.clip(base + shift, -1, 1))
        )
        l0, l = (float(lv) if i == 0 else l0), float(lv)
    assert l < 0.25 * l0, f"VAE pretrain did not converge: {l0} -> {l}"

    den_opt = optax.adam(1e-3)
    emb_stack = jnp.stack([embs["neutral"], embs["bright"], embs["dark"]])
    shift_means = jnp.asarray([0.0, 0.4, -0.4], jnp.float32)

    @jax.jit
    def den_step(up, ost, base, cls, key):
        k_post, k_t, k_noise, k_jit = jax.random.split(key, 4)
        shift = shift_means[cls][:, None, None, None] + 0.05 * jax.random.normal(
            k_jit, (base.shape[0], 1, 1, 1)
        )
        imgs = jnp.clip(base + shift, -1, 1)
        mean, logvar = vae.encode(vae_params, vae_cfg, imgs)
        lat = vae.normalize_latents(vae_cfg, vae.sample_latents(mean, logvar, k_post))
        t = jax.random.randint(k_t, (), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_noise, lat.shape, lat.dtype)
        noisy = schedule.add_noise(lat, noise, jnp.broadcast_to(t, (lat.shape[0],)))

        def loss_fn(up):
            eps = unet2d.apply(up, cfg, noisy, t, emb_stack[cls])
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(up)
        updates, ost = den_opt.update(grads, ost)
        return optax.apply_updates(up, updates), ost, loss

    ost = den_opt.init(unet_params)
    for i in range(800):
        base = rng.normal(0.0, 0.25, (8, 64, 64, 3)).astype(np.float32)
        cls = jnp.asarray(rng.integers(0, 3, (8,)))
        unet_params, ost, dl = den_step(
            unet_params, ost, jnp.asarray(base), cls, jax.random.key(1000 + i)
        )
    assert float(dl) < 0.5, f"denoiser pretrain did not converge: {float(dl)}"
    return vae_params, unet_params


def _load_or_pretrain_text_base(models, schedule):
    if os.path.exists(_TEXT_BASE_FIXTURE):
        try:
            z = np.load(_TEXT_BASE_FIXTURE)
            lu = [jnp.asarray(z[f"u{i}"]) for i in range(int(z["n_u"]))]
            lv = [jnp.asarray(z[f"v{i}"]) for i in range(int(z["n_v"]))]
            u = jax.tree.unflatten(jax.tree.structure(models.unet_params), lu)
            v = jax.tree.unflatten(jax.tree.structure(models.vae_params), lv)
            for got, want in zip(
                lu + lv,
                jax.tree.leaves(models.unet_params) + jax.tree.leaves(models.vae_params),
            ):
                if (got.shape, got.dtype) != (want.shape, want.dtype):
                    raise ValueError(f"fixture drift: {got.shape} vs {want.shape}")
            _fixture_still_denoises(
                u, v, models.unet_config, models.vae_config, schedule,
                _encode_prompt(models, _TEXT_PROMPTS["neutral"]),
            )
            return v, u
        except Exception as e:
            print(f"text-gate fixture stale ({e!r}); regenerating (~40 min)")
    vae_params, unet_params = _pretrain_text_base(models, schedule)
    os.makedirs(os.path.dirname(_TEXT_BASE_FIXTURE), exist_ok=True)
    lu = [np.asarray(x) for x in jax.tree.leaves(unet_params)]
    lv = [np.asarray(x) for x in jax.tree.leaves(vae_params)]
    np.savez_compressed(
        _TEXT_BASE_FIXTURE, n_u=len(lu), n_v=len(lv),
        **{f"u{i}": x for i, x in enumerate(lu)},
        **{f"v{i}": x for i, x in enumerate(lv)},
    )
    return vae_params, unet_params


def test_text_slider_slides_monotone_via_cli(tmp_path):
    """Train a brightness TEXT slider with the real CLI (cli/
    train_text_slider — config YAML, prompts YAML, checkpoint save) on the
    pretrained text-conditioned base, then gate: decoded mean brightness of
    'a photo' samples must be strictly monotone in the slider scale over
    [-2..2], and a wrong-sign LoRA must fail the identical check. This is
    the hermetic analogue of the reference's CLIP-score-vs-scale curve for
    its flagship protocol (train_lora.py + eval-scripts/clip_score.py)."""
    import yaml

    from helpers import write_safetensors
    from sliders_tpu.cli import train_text_slider as cli
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i

    snap = make_tiny_snapshot(str(tmp_path / "sd_tiny"))
    models = loader.load_sd(snap, dtype=jnp.float32, load_vae=True)
    schedule = make_schedule()
    vae_params, unet_params = _load_or_pretrain_text_base(models, schedule)
    # write the pretrained base back into the snapshot: the CLI must see
    # exactly the real-checkpoint path (load -> convert -> train)
    write_safetensors(
        os.path.join(snap, "unet", "diffusion_pytorch_model.safetensors"), unet_params
    )
    write_safetensors(
        os.path.join(snap, "vae", "diffusion_pytorch_model.safetensors"), vae_params
    )

    prompts = [{
        "target": _TEXT_PROMPTS["neutral"],
        "positive": _TEXT_PROMPTS["bright"],
        "unconditional": _TEXT_PROMPTS["dark"],
        "neutral": _TEXT_PROMPTS["neutral"],
        "action": "enhance",
        "guidance_scale": 1.0,  # probe-measured stable window
        "resolution": 256,  # latent 32x32 == the VAE's 64px image manifold
        "batch_size": 1,
    }]
    (tmp_path / "prompts.yaml").write_text(yaml.safe_dump(prompts))
    config = {
        "prompts_file": str(tmp_path / "prompts.yaml"),
        "pretrained_model": {"name_or_path": snap},
        "network": {"type": "lierla", "rank": 4, "alpha": 1.0,
                    "training_method": "noxattn"},
        "train": {"precision": "float32", "noise_scheduler": "ddim",
                  "iterations": 150, "lr": 0.01, "optimizer": "adamw",
                  "lr_scheduler": "constant", "max_denoising_steps": 5},
        "save": {"name": "bright", "path": str(tmp_path / "out"),
                 "per_steps": 1000, "precision": "float32"},
        "tpu": {"remat": False},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(config))
    cli.main(cli.build_parser().parse_args(
        ["--config_file", str(tmp_path / "config.yaml")]
    ))

    run_dir = os.path.join(str(tmp_path / "out"), "bright_alpha1.0_rank4_noxattn")
    ckpt = os.path.join(run_dir, "bright_alpha1.0_rank4_noxattn_last.safetensors")
    assert os.path.exists(ckpt)
    models = loader.load_sd(snap, dtype=jnp.float32, load_vae=True)
    lora = lora_io.load_slider(ckpt, models.unet_params)

    sampler = make_sampler(schedule, "ddim", num_steps=5)
    fn = t2i.make_sampling_fn(models.unet_config, sampler, compute_dtype=jnp.float32)
    emb = _encode_prompt(models, _TEXT_PROMPTS["neutral"])
    cond = jnp.tile(emb[None], (8, 1, 1))
    lats = t2i.initial_latents(jax.random.key(6), 8, 256, 256, sampler.init_noise_sigma)

    def brightness_sweep(weights):
        vals = []
        for s in (-2.0, -1.0, 0.0, 1.0, 2.0):
            out = fn(
                models.unet_params, lats, cond, cond, weights,
                jnp.asarray(float(s)), jnp.asarray(1000.0), jnp.asarray(1.0),
                jax.random.key(5),
            )
            img = t2i.decode_images(models.vae_params, models.vae_config, out)
            vals.append(float(np.asarray(img, np.float32).mean()))
        return vals

    vals = brightness_sweep(lora)
    assert (np.diff(vals) > 0).all(), f"text slider not monotone: {vals}"
    # the slider must actually move the attribute, not squeak past the gate
    assert vals[-1] - vals[0] > 10.0, f"text slider too weak: {vals}"

    neg = {m: {**e, "up": -e["up"]} for m, e in lora.items()}
    neg_vals = brightness_sweep(neg)
    assert not (np.diff(neg_vals) > 0).all(), f"wrong-sign passed: {neg_vals}"
    assert (np.diff(neg_vals) < 0).all(), f"wrong-sign should darken: {neg_vals}"
