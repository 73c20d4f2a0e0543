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
