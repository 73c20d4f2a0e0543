"""Multichip sharding tests on the 8-device virtual CPU mesh.

The reference has no multi-device story (SURVEY.md §2: no torch.distributed
anywhere); this is the TPU-native scaling layer (§5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow


def test_mesh_construction():
    m = pmesh.make_mesh(dp=-1, tp=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "tp")
    with pytest.raises(ValueError):
        pmesh.make_mesh(dp=-1, tp=3)


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert pmesh.param_spec("a.attn1.to_q.weight", True) == P(None, "tp")
    assert pmesh.param_spec("a.attn2.to_out.0.weight", True) == P("tp", None)
    assert pmesh.param_spec("b.ff.net.0.proj.weight", True) == P(None, "tp")
    assert pmesh.param_spec("b.ff.net.2.weight", True) == P("tp", None)
    assert pmesh.param_spec("conv_in.weight", True) == P()
    assert pmesh.param_spec("a.attn1.to_q.weight", False) == P()


def test_tp_sharded_unet_matches_replicated():
    """Tensor-parallel UNet forward == replicated forward (numerics)."""
    from sliders_tpu.models import unet2d

    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 4))
    ehs = jax.random.normal(jax.random.key(2), (4, 7, cfg.cross_attention_dim))
    t = jnp.array([10.0, 500.0, 100.0, 900.0])
    base = unet2d.apply(params, cfg, x, t, ehs)

    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pmesh.shard_params(mesh, params, tp_enabled=True)
    xs = pmesh.shard_batch(mesh, x)
    out = jax.jit(lambda p, x, t, e: unet2d.apply(p, cfg, x, t, e))(sharded, xs, t, ehs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-4)


def test_param_spec_rules_flux():
    from jax.sharding import PartitionSpec as P

    base = "transformer_blocks.3.attn"
    assert pmesh.param_spec(f"{base}.add_q_proj.weight", True) == P(None, "tp")
    assert pmesh.param_spec(f"{base}.add_v_proj.bias", True) == P("tp")
    assert pmesh.param_spec(f"{base}.to_add_out.weight", True) == P("tp", None)
    assert pmesh.param_spec(
        "transformer_blocks.0.ff_context.net.0.proj.weight", True
    ) == P(None, "tp")
    assert pmesh.param_spec(
        "transformer_blocks.0.ff_context.net.2.weight", True
    ) == P("tp", None)
    s = "single_transformer_blocks.17"
    assert pmesh.param_spec(f"{s}.proj_mlp.weight", True) == P(None, "tp")
    assert pmesh.param_spec(f"{s}.proj_out.weight", True) == P("tp", None)
    # the model-level final projection must stay replicated
    assert pmesh.param_spec("proj_out.weight", True) == P()
    assert pmesh.param_spec("proj_out.bias", True) == P()


def test_tp_sharded_flux_matches_replicated():
    """Tensor-parallel FLUX MMDiT forward == replicated forward."""
    from sliders_tpu.models import flux

    cfg = flux.TINY
    params = flux.init_params(jax.random.key(0), cfg)
    B, L_img, L_txt = 2, 16, 5
    img = jax.random.normal(jax.random.key(1), (B, L_img, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (B, L_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (B, cfg.pooled_projection_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.ones((B,))
    img_ids = jnp.asarray(flux.image_ids(8, 8))  # (16, 3)
    txt_ids = jnp.asarray(flux.text_ids(L_txt))

    def fwd(p):
        return flux.apply(p, cfg, img, t, pooled, txt, txt_ids, img_ids, guidance=g)

    base = fwd(params)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pmesh.shard_params(mesh, params, tp_enabled=True)
    out = jax.jit(fwd)(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-4)


def _tiny_text_slider_fixtures(mesh, batch_size):
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.training import optimizers as opt_factory
    from sliders_tpu.training.text_slider import (
        SliderTrainState,
        make_text_slider_step,
        stack_prompt_pairs,
    )

    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=5)
    lora = lnet.create_slider_network(jax.random.key(1), params, rank=4, train_method="noxattn")
    optimizer = opt_factory.make_optimizer(
        "adamw", opt_factory.make_lr_schedule("constant", 2e-4, 10),
        trainable_mask=lnet.trainable_mask(lora),
    )
    step = make_text_slider_step(
        cfg, schedule, sampler, optimizer,
        max_denoising_steps=5, resolution=64, batch_size=batch_size,
        compute_dtype=jnp.float32, remat=False, mesh=mesh, donate=False,
    )
    ks = jax.random.split(jax.random.key(3), 4)
    pair = {
        "target": jax.random.normal(ks[0], (7, cfg.cross_attention_dim)),
        "positive": jax.random.normal(ks[1], (7, cfg.cross_attention_dim)),
        "neutral": jax.random.normal(ks[2], (7, cfg.cross_attention_dim)),
        "unconditional": jax.random.normal(ks[3], (7, cfg.cross_attention_dim)),
        "guidance_signed": jnp.asarray(4.0),
    }
    state = SliderTrainState.create(jax.random.key(2), lora, optimizer)
    return params, step, state, stack_prompt_pairs([pair])


def _assert_tree_allclose(a, b, atol, msg):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol, err_msg=msg)


def test_dp_train_step_matches_single_device():
    """Same total batch: the 8-way dp-sharded text-slider train step must
    produce the same loss and LoRA update as the unsharded step (the grad
    psum over dp is XLA's job; this pins its numerics). VERDICT r2 item 3a."""
    batch = 8
    params, step1, state1, pairs = _tiny_text_slider_fixtures(None, batch)
    _, step8, state8, _ = _tiny_text_slider_fixtures(pmesh.make_mesh(dp=8, tp=1), batch)

    new1, m1 = step1(state1, params, pairs)
    new8, m8 = step8(state8, params, pairs)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_allclose(new8.lora, new1.lora, 1e-6, "dp LoRA update != single-device")
    _assert_tree_allclose(
        new8.opt_state, new1.opt_state, 1e-5, "dp opt state != single-device"
    )


def test_fanout_dp_batch1_matches_single_device():
    """Reference-protocol batch_size=1: plain batch-dp cannot use a mesh,
    but the train step's internal fan-outs (CFG-doubled denoise rows, the
    batched frozen positive/neutral/unconditional pass) are row-sharded
    over dp (text_slider.constrain_batch). On a (dp=2, tp=4) mesh this is
    the v5e-8 layout for the batch-1 north-star run; numerics must match
    the unsharded step exactly."""
    params, step1, state1, pairs = _tiny_text_slider_fixtures(None, 1)
    mesh = pmesh.make_mesh(dp=2, tp=4)
    _, stepf, statef, _ = _tiny_text_slider_fixtures(mesh, 1)
    sharded = pmesh.shard_params(mesh, params, tp_enabled=True)

    new1, m1 = step1(state1, params, pairs)
    newf, mf = stepf(statef, sharded, pairs)
    np.testing.assert_allclose(float(mf["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_allclose(newf.lora, new1.lora, 1e-6, "fanout-dp LoRA update != single-device")


def test_tp_train_step_matches_replicated():
    """tp=2 sharded UNet params through the FULL train step (fwd+bwd+update)
    == replicated params. VERDICT r2 item 3b."""
    batch = 4
    params, step, state, pairs = _tiny_text_slider_fixtures(
        pmesh.make_mesh(dp=4, tp=2), batch
    )
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pmesh.shard_params(mesh, params, tp_enabled=True)

    new_r, m_r = step(state, params, pairs)
    new_s, m_s = step(state, sharded, pairs)
    np.testing.assert_allclose(float(m_s["loss"]), float(m_r["loss"]), rtol=1e-5)
    _assert_tree_allclose(new_s.lora, new_r.lora, 1e-6, "tp LoRA update != replicated")


def test_maybe_initialize_distributed_single_process():
    assert pmesh.maybe_initialize_distributed() == 1


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_lowers_without_materializing():
    """Trace/lower the flagship SD1.5 forward with abstract params (the
    driver materializes them on the real chip)."""
    from sliders_tpu.models import unet2d

    cfg = unet2d.SD15
    pshapes = jax.eval_shape(
        lambda k: unet2d.init_params(k, cfg, jnp.bfloat16), jax.random.key(0)
    )
    lat = jax.ShapeDtypeStruct((2, 64, 64, 4), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((2,), jnp.float32)
    ehs = jax.ShapeDtypeStruct((2, 77, 768), jnp.bfloat16)
    jax.jit(lambda p, x, t, e: unet2d.apply(p, cfg, x, t, e)).lower(pshapes, lat, t, ehs)


def test_dp_sampling_sweep_matches_single_device():
    """The eval sweep sampler with a dp mesh (make_sampling_fn(mesh=...))
    must match the single-device sweep row for row — the multi-chip path
    for the 500-prompt eval harness (SURVEY.md §7.1 'scale sweeps batched
    across the mesh')."""
    from sliders_tpu.diffusion import make_sampler, make_schedule
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import unet2d
    from sliders_tpu.pipelines import text2image as t2i

    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(0), cfg)
    lora = lnet.create_slider_network(
        jax.random.key(1), params, rank=2, train_method="noxattn"
    )
    lora = {m: {**e, "up": e["up"] + 0.2} for m, e in lora.items()}
    sampler = make_sampler(make_schedule(), "ddim", num_steps=3)

    lats = t2i.initial_latents(
        jax.random.key(5), 1, 64, 64, sampler.init_noise_sigma
    )
    lats = jnp.tile(lats, (8, 1, 1, 1))
    cond = jnp.tile(
        jax.random.normal(jax.random.key(6), (1, 7, cfg.cross_attention_dim)), (8, 1, 1)
    )
    uncond = jnp.tile(
        jax.random.normal(jax.random.key(7), (1, 7, cfg.cross_attention_dim)), (8, 1, 1)
    )
    scales = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0, 0.5, -0.5, 3.0])
    sn = jnp.asarray(1000.0)
    g = jnp.asarray(7.5)
    key = jax.random.key(9)

    fn1 = t2i.make_sampling_fn(cfg, sampler, compute_dtype=jnp.float32)
    out1 = fn1(params, lats, cond, uncond, lora, scales, sn, g, key, None)

    fn8 = t2i.make_sampling_fn(
        cfg, sampler, compute_dtype=jnp.float32, mesh=pmesh.make_mesh(dp=8)
    )
    out8 = fn8(params, lats, cond, uncond, lora, scales, sn, g, key, None)

    assert out8.sharding.spec == jax.sharding.PartitionSpec("dp")
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1), atol=1e-4)
    # rows really differ across scales (the sweep is live, not degenerate)
    assert np.abs(np.asarray(out1)[0] - np.asarray(out1)[4]).max() > 1e-4
