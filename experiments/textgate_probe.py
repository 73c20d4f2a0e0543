"""Pretrain + probe for the hermetic TEXT-slider semantic gate (round 4).

Produces tests/fixtures/semantic_gate_text_base.npz: a tiny TEXT-CONDITIONED
base model (frozen random tiny-CLIP from the deterministic test snapshot;
UNet pretrained so that conditioning on "bright photo" / "dark photo" /
"a photo" denoises toward brightness-shifted image distributions; VAE
pretrained as a real autoencoder on the same synthetic distribution — the
reference regime is a REAL pretrained base + a slider on top, cf.
trainscripts/textsliders/train_lora.py:60-75 loading SD1.x).

Then probes the flagship self-supervised text-slider objective
(prompt_util.py:108-135) end-to-end: train a slider with
target="a photo", positive="bright photo", unconditional="dark photo",
neutral="a photo", action=enhance, and sweep decoded mean brightness over
scales — printing one JSON line per (guidance, lr, iters) config so the
committed test (tests/test_semantic_gate.py) can pin a setting from the
measured stable window.

Run:  env PYTHONPATH=/root/repo:/root/repo/tests JAX_PLATFORMS=cpu \
        python experiments/textgate_probe.py [--skip-pretrain]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "semantic_gate_text_base.npz",
)
SNAP = "/tmp/textgate_snap"

PROMPTS = {
    "neutral": "a photo",
    "bright": "bright photo",
    "dark": "dark photo",
}
SHIFTS = {"neutral": 0.0, "bright": 0.4, "dark": -0.4}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def encode(models, prompt):
    from sliders_tpu.pipelines.encoding import encode_prompts

    te = models.text_encoders[0]
    return encode_prompts(
        te.tokenizer, te.params, te.config, [prompt],
        num_layers=te.clip_skip_layers,
    )[0]


def pretrain(models, schedule):
    """VAE autoencoder + text-conditioned UNet denoiser pretrain (recipe
    family as tests/test_semantic_gate.py _pretrain_base, plus the text
    conditioning classes)."""
    import optax

    from sliders_tpu.models import unet2d, vae

    cfg, vae_cfg = models.unet_config, models.vae_config
    unet_params = models.unet_params
    vae_params = models.vae_params

    embs = {k: encode(models, p) for k, p in PROMPTS.items()}

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

    rng = np.random.default_rng(7)
    ost = ae_opt.init(vae_params)
    l0 = l = None
    for i in range(200):
        base = rng.normal(0.0, 0.25, (8, 64, 64, 3)).astype(np.float32)
        shift = rng.uniform(-0.5, 0.5, (8, 1, 1, 1)).astype(np.float32)
        vae_params, ost, lv = ae_step(
            vae_params, ost, jnp.asarray(np.clip(base + shift, -1, 1))
        )
        if i == 0:
            l0 = float(lv)
        l = float(lv)
        if i % 50 == 0:
            log(f"vae step {i}: loss {l:.4f}")
    assert l < 0.25 * l0, f"VAE pretrain did not converge: {l0} -> {l}"

    den_opt = optax.adam(1e-3)
    emb_stack = jnp.stack([embs["neutral"], embs["bright"], embs["dark"]])
    shift_means = jnp.asarray(
        [SHIFTS["neutral"], SHIFTS["bright"], SHIFTS["dark"]], jnp.float32
    )

    @jax.jit
    def den_step(up, ost, base, cls, key):
        k_post, k_t, k_noise, k_jit = jax.random.split(key, 4)
        shift = shift_means[cls][:, None, None, None] + 0.05 * jax.random.normal(
            k_jit, (base.shape[0], 1, 1, 1)
        )
        imgs = jnp.clip(base + shift, -1, 1)
        mean, logvar = vae.encode(vae_params, vae_cfg, imgs)
        lat = vae.normalize_latents(
            vae_cfg, vae.sample_latents(mean, logvar, k_post)
        )
        t = jax.random.randint(k_t, (), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_noise, lat.shape, lat.dtype)
        noisy = schedule.add_noise(
            lat, noise, jnp.broadcast_to(t, (lat.shape[0],))
        )
        ehs = emb_stack[cls]

        def loss_fn(up):
            eps = unet2d.apply(up, cfg, noisy, t, ehs)
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
        if i % 100 == 0:
            log(f"unet step {i}: loss {float(dl):.4f}")
    assert float(dl) < 0.5, f"denoiser pretrain did not converge: {float(dl)}"
    return vae_params, unet_params


def save_fixture(vae_params, unet_params):
    lu = [np.asarray(x) for x in jax.tree.leaves(unet_params)]
    lv = [np.asarray(x) for x in jax.tree.leaves(vae_params)]
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(
        FIXTURE, n_u=len(lu), n_v=len(lv),
        **{f"u{i}": x for i, x in enumerate(lu)},
        **{f"v{i}": x for i, x in enumerate(lv)},
    )
    log(f"fixture saved: {FIXTURE} ({os.path.getsize(FIXTURE)//1024} KiB)")


def load_fixture(models):
    z = np.load(FIXTURE)
    lu = [jnp.asarray(z[f"u{i}"]) for i in range(int(z["n_u"]))]
    lv = [jnp.asarray(z[f"v{i}"]) for i in range(int(z["n_v"]))]
    u = jax.tree.unflatten(jax.tree.structure(models.unet_params), lu)
    v = jax.tree.unflatten(jax.tree.structure(models.vae_params), lv)
    return v, u


def sweep(models, sampler, lora_weights, scales=(-2.0, -1.0, 0.0, 1.0, 2.0)):
    from sliders_tpu.pipelines import text2image as t2i

    emb = encode(models, PROMPTS["neutral"])
    cond = jnp.tile(emb[None], (8, 1, 1))
    fn = t2i.make_sampling_fn(
        models.unet_config, sampler, compute_dtype=jnp.float32
    )
    lats = t2i.initial_latents(
        jax.random.key(6), 8, 256, 256, sampler.init_noise_sigma
    )
    vals = []
    for s in scales:
        out = fn(
            models.unet_params, lats, cond, cond, lora_weights,
            jnp.asarray(float(s)), jnp.asarray(1000.0), jnp.asarray(1.0),
            jax.random.key(5),
        )
        img = t2i.decode_images(models.vae_params, models.vae_config, out)
        vals.append(float(np.asarray(img, np.float32).mean()))
    return vals


def probe(models, schedule):
    """Train text sliders at a grid of settings via the library step (the
    same math the CLI drives) and print per-checkpoint sweeps."""
    from sliders_tpu.diffusion import make_sampler
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.driver import PromptEmbedsCache, build_pairs
    from sliders_tpu.training.text_slider import (
        SliderTrainState, make_text_slider_step,
    )
    from sliders_tpu.prompts import PromptSettings

    sampler = make_sampler(schedule, "ddim", num_steps=5)
    cache = PromptEmbedsCache(models)

    for guidance in (1.0, 4.0):
        settings = [PromptSettings(
            target=PROMPTS["neutral"], positive=PROMPTS["bright"],
            unconditional=PROMPTS["dark"], neutral=PROMPTS["neutral"],
            action="enhance", guidance_scale=guidance, resolution=256,
        )]
        pairs = build_pairs(settings, cache, is_xl=False)
        for lr in (1e-2, 3e-3):
            lora = lnet.create_slider_network(
                jax.random.key(2), models.unet_params, rank=4,
                train_method="noxattn",
            )
            optimizer = opt_factory.make_optimizer(
                "adamw", opt_factory.make_lr_schedule("constant", lr, 2000),
                trainable_mask=lnet.trainable_mask(lora),
            )
            step = make_text_slider_step(
                models.unet_config, schedule, sampler, optimizer,
                max_denoising_steps=5, resolution=256, batch_size=1,
                compute_dtype=jnp.float32, remat=False, donate=False,
            )
            state = SliderTrainState.create(jax.random.key(3), lora, optimizer)
            done = 0
            for ckpt in (50, 100, 200, 400):
                while done < ckpt:
                    state, metrics = step(state, models.unet_params, pairs)
                    done += 1
                vals = sweep(models, sampler, state.lora)
                mono = bool((np.diff(vals) > 0).all())
                print(json.dumps({
                    "guidance": guidance, "lr": lr, "iters": ckpt,
                    "sweep": [round(v, 3) for v in vals],
                    "monotone_up": mono,
                    "loss": float(np.asarray(metrics["loss"])),
                }), flush=True)


def main():
    from helpers import make_tiny_snapshot

    from sliders_tpu.diffusion import make_schedule
    from sliders_tpu.models import loader

    make_tiny_snapshot(SNAP)
    models = loader.load_sd(SNAP, dtype=jnp.float32, load_vae=True)
    schedule = make_schedule()

    if "--skip-pretrain" in sys.argv and os.path.exists(FIXTURE):
        v, u = load_fixture(models)
    else:
        t0 = time.time()
        v, u = pretrain(models, schedule)
        log(f"pretrain done in {time.time()-t0:.0f}s")
        save_fixture(v, u)
    models.unet_params = u
    models.vae_params = v

    from sliders_tpu.diffusion import make_sampler

    base = sweep(models, make_sampler(schedule, "ddim", num_steps=5), None)
    log(f"base-model sweep (no lora, should be ~flat): {base}")

    probe(models, schedule)


if __name__ == "__main__":
    main()
