"""Pipeline-parallel (pp) parity: flux_apply_pp == sequential flux.apply.

The pp engine (parallel/pipeline.py) is the capacity axis the reference
cannot have (single-GPU only, SURVEY.md §2): full FLUX-dev params exceed
one v5e chip's HBM, so the block stacks shard BY LAYER over pp. These
tests pin, on the 8-virtual-device CPU mesh:
  - forward parity vs the sequential apply (pp=4, 2 microbatches);
  - LoRA slider parity (stacked relative-name LoRA == dict-name LoRA);
  - gradient parity through the pipeline (scan + ppermute transpose);
  - layer-sharded param placement (flux_pp_params puts 1/pp of each
    stack per device).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.lora import network as lnet
from sliders_tpu.models import flux
from sliders_tpu.ops.basic import SliderLora
from sliders_tpu.parallel import mesh as pmesh
from sliders_tpu.parallel import pipeline as pl

CFG = flux.FluxConfig(
    in_channels=16,
    num_layers=4,
    num_single_layers=4,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=32,
    pooled_projection_dim=24,
    axes_dims_rope=(4, 6, 6),
)


def _inputs(batch=4, h=8, w=8, l_txt=5):
    ks = jax.random.split(jax.random.key(7), 4)
    lat = jax.random.normal(ks[0], (batch, (h // 2) * (w // 2), CFG.in_channels))
    t = jnp.linspace(0.2, 0.9, batch)
    pooled = jax.random.normal(ks[1], (batch, CFG.pooled_projection_dim))
    ehs = jax.random.normal(ks[2], (batch, l_txt, CFG.joint_attention_dim))
    g = jnp.full((batch,), 1.5)
    return lat, t, pooled, ehs, jnp.asarray(flux.text_ids(l_txt)), jnp.asarray(
        flux.image_ids(h, w)
    ), g


@pytest.fixture(scope="module")
def params():
    return flux.init_params(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def mesh():
    return pmesh.make_mesh(dp=2, tp=1, pp=4)


def test_forward_parity(params, mesh):
    lat, t, pooled, ehs, tids, iids, g = _inputs()
    ref = flux.apply(params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g)
    out = jax.jit(
        lambda p, lat, t, pooled, ehs, g: pl.flux_apply_pp(
            p, CFG, lat, t, pooled, ehs, tids, iids, mesh,
            guidance=g, num_microbatches=2,
        )
    )(params, lat, t, pooled, ehs, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_forward_parity_single_microbatch(params, mesh):
    # M=1 (the batch-1 inference case): pure sequential hand-off, all bubble
    lat, t, pooled, ehs, tids, iids, g = _inputs(batch=2)
    ref = flux.apply(params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g)
    out = pl.flux_apply_pp(
        params, CFG, lat, t, pooled, ehs, tids, iids, mesh,
        guidance=g, num_microbatches=1,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_lora_parity(params, mesh):
    lat, t, pooled, ehs, tids, iids, g = _inputs()
    weights = lnet.create_slider_network(
        jax.random.key(3), params, rank=2, train_method="xattn"
    )
    # zero-init up would make LoRA a no-op; randomize so the branch matters
    weights = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(11), a.shape) * 0.1
        if a.ndim == 2 else a,
        weights,
    )
    lora = SliderLora(weights=weights, multiplier=jnp.asarray(0.7))
    ref = flux.apply(
        params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g, lora=lora
    )
    base = flux.apply(params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g)
    assert float(jnp.abs(ref - base).max()) > 1e-4  # LoRA actually engaged
    out = pl.flux_apply_pp(
        params, CFG, lat, t, pooled, ehs, tids, iids, mesh,
        guidance=g, lora=lora, num_microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_lora_grad_parity(params, mesh):
    lat, t, pooled, ehs, tids, iids, g = _inputs(batch=2)
    weights = lnet.create_slider_network(
        jax.random.key(3), params, rank=2, train_method="xattn"
    )
    weights = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(11), a.shape) * 0.1
        if a.ndim == 2 else a,
        weights,
    )
    cot = jax.random.normal(jax.random.key(5), (2, 16, CFG.in_channels))

    def loss_ref(w):
        lora = SliderLora(weights=w, multiplier=jnp.asarray(0.7))
        out = flux.apply(
            params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g, lora=lora
        )
        return jnp.sum(out * cot)

    def loss_pp(w):
        lora = SliderLora(weights=w, multiplier=jnp.asarray(0.7))
        out = pl.flux_apply_pp(
            params, CFG, lat, t, pooled, ehs, tids, iids, mesh,
            guidance=g, lora=lora, num_microbatches=2,
        )
        return jnp.sum(out * cot)

    g_ref = jax.grad(loss_ref)(weights)
    g_pp = jax.jit(jax.grad(loss_pp))(weights)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert max(float(jnp.abs(a).max()) for a in flat_ref) > 1e-6
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_pp_params_are_layer_sharded(params, mesh):
    pp_params = pl.flux_pp_params(mesh, params, CFG)
    leaf = pp_params["transformer_blocks"]["attn"]["to_q"]["weight"]
    assert leaf.shape[0] == CFG.num_layers
    # each device holds exactly n_layers/pp of the stack
    shard_rows = {
        int(s.data.shape[0]) for s in leaf.addressable_shards
    }
    assert shard_rows == {CFG.num_layers // 4}
    # and the pp forward consumes the sharded tree unchanged
    lat, t, pooled, ehs, tids, iids, g = _inputs(batch=2)
    ref = flux.apply(params, CFG, lat, t, pooled, ehs, tids, iids, guidance=g)
    out = pl.flux_apply_pp(
        pp_params, CFG, lat, t, pooled, ehs, tids, iids, mesh,
        guidance=g, num_microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_flux_sampler_pp_parity(params, mesh):
    """The user-reachable path: make_flux_sampling_fn(mesh=...) matches the
    single-device sampler, including the start-noise gate (skip_till) that
    the pp path implements as a branch-free LoRA multiplier instead of the
    merged-weight swap."""
    from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
    from sliders_tpu.pipelines import flux_t2i

    weights = lnet.create_slider_network(
        jax.random.key(3), params, rank=2, train_method="xattn"
    )
    weights = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(11), a.shape) * 0.1
        if a.ndim == 2 else a,
        weights,
    )
    sampler = make_flowmatch_sampler(num_steps=3, mu=0.5)
    ks = jax.random.split(jax.random.key(9), 3)
    lat = flux_t2i.initial_packed_latents(ks[0], 2, 64, 64, latent_channels=4)
    pooled = jax.random.normal(ks[1], (2, CFG.pooled_projection_dim))
    t5e = jax.random.normal(ks[2], (2, 5, CFG.joint_attention_dim))
    args = (lat, pooled, t5e, weights, jnp.asarray(0.8), 0, jnp.asarray(1.5))

    ref_fn = flux_t2i.make_flux_sampling_fn(
        CFG, sampler, latent_hw=8, compute_dtype=jnp.float32
    )
    pp_fn = flux_t2i.make_flux_sampling_fn(
        CFG, sampler, latent_hw=8, compute_dtype=jnp.float32,
        mesh=mesh, num_microbatches=2,
    )
    ref = ref_fn(params, *args)
    out = pp_fn(pl.flux_pp_params(mesh, params, CFG), *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.slow
def test_flux_train_step_pp_parity(params):
    """FULL FLUX slider train step over a (dp=4, pp=2) mesh == the
    unsharded step: same fold-in RNG -> identical sampled pair/t_to/noise,
    so loss AND the LoRA update must agree. This is the capacity-axis
    training story (full FLUX-dev doesn't fit one chip's HBM)."""
    from sliders_tpu.diffusion.schedulers import make_flowmatch_sampler
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.flux_slider import make_flux_slider_step
    from sliders_tpu.training.text_slider import SliderTrainState, stack_prompt_pairs

    cfg = flux.TINY  # 2 double + 2 single blocks -> pp=2 stages of 1 block
    ppmesh = pmesh.make_mesh(dp=4, tp=1, pp=2)
    fparams = flux.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(
        jax.random.key(1), fparams, rank=2, train_method="xattn"
    )
    opt = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 2e-4, 10),
        trainable_mask=lnet.trainable_mask(lora),
    )
    sampler = make_flowmatch_sampler(num_steps=4, mu=0.5)
    kf = jax.random.split(jax.random.key(9), 8)
    pair = {}
    for i, role in enumerate(("target", "positive", "neutral", "unconditional")):
        pair[f"{role}_t5"] = jax.random.normal(kf[2 * i], (5, cfg.joint_attention_dim))
        pair[f"{role}_pooled"] = jax.random.normal(kf[2 * i + 1], (cfg.pooled_projection_dim,))
    pair["guidance_signed"] = jnp.asarray(1.0)
    pairs = stack_prompt_pairs([pair])

    kwargs = dict(
        resolution=64, batch_size=4, compute_dtype=jnp.float32,
        remat=False, donate=False,
    )
    pp_step = make_flux_slider_step(cfg, sampler, opt, mesh=ppmesh, **kwargs)
    ref_step = make_flux_slider_step(cfg, sampler, opt, mesh=None, **kwargs)
    state = SliderTrainState.create(jax.random.key(2), lora, opt)
    ref_state = SliderTrainState.create(jax.random.key(2), lora, opt)
    pp_params = pl.flux_pp_params(ppmesh, fparams, cfg)
    new_pp, m_pp = pp_step(state, pp_params, pairs)
    new_ref, m_ref = ref_step(ref_state, fparams, pairs)
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(new_pp.lora), jax.tree.leaves(new_ref.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_identity_padding_parity(mesh):
    """Non-divisible layer counts (FLUX-dev's 19 double blocks are prime):
    stacks are padded with all-zero blocks, which adaLN-zero gating makes
    exact identities — pp output must still match the sequential apply,
    with LoRA engaged."""
    cfg = flux.FluxConfig(
        in_channels=16, num_layers=3, num_single_layers=5,
        attention_head_dim=16, num_attention_heads=2,
        joint_attention_dim=32, pooled_projection_dim=24,
        axes_dims_rope=(4, 6, 6),
    )
    p = flux.init_params(jax.random.key(0), cfg)
    weights = lnet.create_slider_network(
        jax.random.key(3), p, rank=2, train_method="xattn"
    )
    weights = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(11), a.shape) * 0.1
        if a.ndim == 2 else a,
        weights,
    )
    lora = SliderLora(weights=weights, multiplier=jnp.asarray(0.7))
    ks = jax.random.split(jax.random.key(7), 4)
    lat = jax.random.normal(ks[0], (4, 16, cfg.in_channels))
    t = jnp.linspace(0.2, 0.9, 4)
    pooled = jax.random.normal(ks[1], (4, cfg.pooled_projection_dim))
    ehs = jax.random.normal(ks[2], (4, 5, cfg.joint_attention_dim))
    g = jnp.full((4,), 1.5)
    tids = jnp.asarray(flux.text_ids(5))
    iids = jnp.asarray(flux.image_ids(8, 8))
    ref = flux.apply(p, cfg, lat, t, pooled, ehs, tids, iids, guidance=g, lora=lora)
    out = pl.flux_apply_pp(
        pl.flux_pp_params(mesh, p, cfg), cfg, lat, t, pooled, ehs, tids,
        iids, mesh, guidance=g, lora=lora, num_microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # padded stack is what's resident: 3 -> 4 and 5 -> 8 over pp=4
    pp_params = pl.flux_pp_params(mesh, p, cfg)
    assert jax.tree.leaves(pp_params["transformer_blocks"])[0].shape[0] == 4
    assert jax.tree.leaves(pp_params["single_transformer_blocks"])[0].shape[0] == 8


def test_nonuniform_lora_rejected(params, mesh):
    weights = lnet.create_slider_network(
        jax.random.key(3), params, rank=2, train_method="xattn"
    )
    weights = dict(weights)
    weights.pop("transformer_blocks.1.attn.to_q")
    with pytest.raises(ValueError, match="uniform"):
        pl.stack_layer_lora(weights, "transformer_blocks", CFG.num_layers)
