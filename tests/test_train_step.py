"""Jitted text-slider train step tests on the tiny UNet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import unet2d
from sliders_tpu.training import optimizers as opt_factory
from sliders_tpu.training.text_slider import (
    SliderTrainState,
    make_text_slider_step,
    stack_prompt_pairs,
)

pytestmark = pytest.mark.slow


def _make_pairs(key, n_pairs=2, L=7, D=32, gs=4.0):
    ks = jax.random.split(key, 4 * n_pairs)
    pairs = []
    for i in range(n_pairs):
        pairs.append(
            {
                "target": jax.random.normal(ks[4 * i], (L, D)),
                "positive": jax.random.normal(ks[4 * i + 1], (L, D)),
                "neutral": jax.random.normal(ks[4 * i + 2], (L, D)),
                "unconditional": jax.random.normal(ks[4 * i + 3], (L, D)),
                "guidance_signed": jnp.asarray(gs),
            }
        )
    return stack_prompt_pairs(pairs)


@pytest.fixture(scope="module")
def setup():
    cfg = unet2d.TINY
    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    lr_sched = opt_factory.make_lr_schedule("constant", 2e-4, 100)
    lora = lnet.create_slider_network(
        jax.random.key(1), unet_params, rank=4, alpha=1.0, train_method="noxattn"
    )
    optimizer = opt_factory.make_optimizer(
        "adamw", lr_sched, trainable_mask=lnet.trainable_mask(lora)
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=10, resolution=128, batch_size=2,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    return cfg, unet_params, optimizer, step, state


def test_step_runs_and_updates_lora(setup):
    cfg, unet_params, optimizer, step, state = setup
    pairs = _make_pairs(jax.random.key(3))
    new_state, metrics = step(state, unet_params, pairs)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    assert 1 <= int(metrics["t_to"]) < 10
    # down/up moved, alpha untouched
    moved = 0
    for m, w in new_state.lora.items():
        if float(jnp.abs(w["up"] - state.lora[m]["up"]).max()) > 0:
            moved += 1
        assert float(w["alpha"]) == 1.0
    assert moved > 0


def test_step_deterministic(setup):
    cfg, unet_params, optimizer, step, state = setup
    pairs = _make_pairs(jax.random.key(3))
    _, m1 = step(state, unet_params, pairs)
    _, m2 = step(state, unet_params, pairs)
    assert float(m1["loss"]) == float(m2["loss"])
    assert int(m1["pair"]) == int(m2["pair"])


def test_initial_loss_zero_when_target_is_neutral_and_g_zero(setup):
    """With up=0 init the slider-on and slider-off nets are identical, so a
    pair with target==neutral and guidance 0 must give exactly zero loss —
    pins both the LoRA zero-init contract and the loss algebra."""
    cfg, unet_params, optimizer, step, state = setup
    e = jax.random.normal(jax.random.key(9), (7, 32))
    pairs = stack_prompt_pairs(
        [
            {
                "target": e,
                "positive": jax.random.normal(jax.random.key(10), (7, 32)),
                "neutral": e,
                "unconditional": jax.random.normal(jax.random.key(11), (7, 32)),
                "guidance_signed": jnp.asarray(0.0),
            }
        ]
    )
    _, metrics = step(state, unet_params, pairs)
    assert float(metrics["loss"]) < 1e-10


def test_overfit_single_scenario_reduces_loss(setup):
    """Overfit one fixed scenario (same pair / t_to / latents every step, by
    pinning the RNG-folding step counter): the slider objective must be
    optimizable and the loss must drop substantially."""
    cfg, unet_params, _, _, state = setup
    lora = state.lora
    optimizer = opt_factory.make_optimizer(
        "adamw",
        opt_factory.make_lr_schedule("constant", 1e-2, 100),
        trainable_mask=lnet.trainable_mask(lora),
    )
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=10, resolution=128, batch_size=2,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    pairs = _make_pairs(jax.random.key(3), n_pairs=1, gs=1.0)
    losses = []
    zero = jnp.asarray(0, jnp.int32)
    for _ in range(50):
        state, metrics = step(state.replace(step=zero), unet_params, pairs)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_lr_schedule_semantics():
    lr = 2e-4
    cos = opt_factory.make_lr_schedule("cosine", lr, 100)
    assert float(cos(0)) == pytest.approx(lr)
    assert float(cos(100)) == pytest.approx(lr / 100)
    assert float(cos(50)) == pytest.approx((lr + lr / 100) / 2)
    step_s = opt_factory.make_lr_schedule("step", lr, 1000)
    assert float(step_s(0)) == lr
    assert float(step_s(10)) == pytest.approx(lr * 0.999)
    lin = opt_factory.make_lr_schedule("linear", lr, 1000)
    assert float(lin(0)) == pytest.approx(lr * 0.5)
    assert float(lin(10)) == pytest.approx(lr)
    rest = opt_factory.make_lr_schedule("cosine_with_restarts", lr, 100)
    assert float(rest(0)) == pytest.approx(lr)
    # restart at T0=10: lr returns to max
    assert float(rest(10)) == pytest.approx(lr)
    with pytest.raises(ValueError):
        opt_factory.make_lr_schedule("bogus", lr, 10)


def test_optimizer_args_parsing():
    kw = opt_factory.parse_optimizer_args("weight_decay=0.01 betas=(0.9,0.99)")
    assert kw == {"weight_decay": 0.01, "betas": (0.9, 0.99)}


def test_denoise_merged_matches_branch(setup):
    """`denoise_merged=True` (pre-merging the slider into the UNet weights
    for the partial-denoise loop, lora/merge.py) must be numerically
    equivalent to the branch-LoRA path — it is a perf knob, not a semantic
    one (BASELINE.md round-2 A/B). Start from a trained-ish state so the
    merge is non-trivial."""
    cfg, unet_params, optimizer, step, state = setup
    pairs = _make_pairs(jax.random.key(3), n_pairs=1)
    # take one branch step to move the LoRA off zero-init
    state1, _ = step(state, unet_params, pairs)

    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    merged_step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=10, resolution=128, batch_size=2,
        compute_dtype=jnp.float32, remat=False, donate=False,
        denoise_merged=True,
    )
    _, m_branch = step(state1, unet_params, pairs)
    _, m_merged = merged_step(state1, unet_params, pairs)
    assert int(m_branch["t_to"]) == int(m_merged["t_to"])
    np.testing.assert_allclose(
        float(m_merged["loss"]), float(m_branch["loss"]), rtol=1e-4, atol=1e-7
    )


def test_chunked_step_matches_sequential(setup):
    """`chunk=N` (N scanned iterations per dispatch) must be bit-equivalent
    to N sequential single-step calls: RNG folds in the per-step counter
    either way. Guards the dispatch-amortization path (tpu.steps_per_call)."""
    cfg, unet_params, optimizer, step, state = setup
    pairs = _make_pairs(jax.random.key(3))

    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    chunk_step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=10, resolution=128, batch_size=2,
        compute_dtype=jnp.float32, remat=False, donate=False,
        chunk=3,
    )
    s_seq = state
    seq_losses = []
    for _ in range(3):
        s_seq, m = step(s_seq, unet_params, pairs)
        seq_losses.append(float(m["loss"]))
    s_chunk, ms = chunk_step(state, unet_params, pairs)
    assert ms["loss"].shape == (3,)
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses, rtol=1e-6)
    assert int(s_chunk.step) == int(s_seq.step) == 3
    for mname in s_seq.lora:
        # scan vs sequential reassociates the f32 backward slightly
        np.testing.assert_allclose(
            np.asarray(s_chunk.lora[mname]["up"]),
            np.asarray(s_seq.lora[mname]["up"]),
            rtol=1e-4, atol=1e-8,
        )


def test_fused_tail_matches_unfused(setup):
    """`fused_tail=True` (frozen batch-3 + target grad pass as ONE batch-4
    UNet call with per-sample multipliers [0,0,0,1] and a row-sliced vjp
    cotangent) must reproduce the unfused loss AND LoRA update — it is a
    perf A/B knob, not a semantic one (VERDICT r2 item 1)."""
    cfg, unet_params, optimizer, step, state = setup
    pairs = _make_pairs(jax.random.key(3), n_pairs=1)
    state1, _ = step(state, unet_params, pairs)

    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    fused_step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=10, resolution=128, batch_size=2,
        compute_dtype=jnp.float32, remat=False, donate=False,
        fused_tail=True,
    )
    s_ref, m_ref = step(state1, unet_params, pairs)
    s_fused, m_fused = fused_step(state1, unet_params, pairs)
    assert int(m_ref["t_to"]) == int(m_fused["t_to"])
    np.testing.assert_allclose(
        float(m_fused["loss"]), float(m_ref["loss"]), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        float(m_fused["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-4, atol=1e-8
    )
    a = jax.tree.leaves(s_ref.lora)
    b = jax.tree.leaves(s_fused.lora)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)
