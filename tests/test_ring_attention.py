"""Ring attention (sequence-parallel over ICI) parity on the virtual mesh.

The reference has no distribution and its attention tops out at 4096 tokens
(SURVEY.md §5.7); ops.ring_attention is the TPU-native scaling path past
that ceiling. These tests pin that the ring's online-softmax merge equals
full-softmax attention (forward AND gradients) on the 8-virtual-device CPU
mesh, for self-attention shapes shaped like the models' (d=40 SD, d=128
FLUX)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.ops import ring_attention as ra
from sliders_tpu.ops.attention import xla_attention
from sliders_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow


def _rand_qkv(key, shape):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, shape),
        jax.random.normal(kk, shape),
        jax.random.normal(kv, shape),
    )


def test_make_mesh_sp_axis():
    m = pmesh.make_mesh(dp=2, tp=1, sp=4)
    assert m.axis_names == ("dp", "tp", "sp")
    assert m.devices.shape == (2, 1, 4)
    # default stays 2-axis (back-compat for every existing P('dp'/'tp') spec)
    assert pmesh.make_mesh(dp=4, tp=2).axis_names == ("dp", "tp")
    with pytest.raises(ValueError):
        pmesh.make_mesh(dp=2, tp=2, sp=4)  # 16 > 8 devices


@pytest.mark.parametrize(
    "shape", [(2, 4, 256, 40), (1, 8, 128, 128)], ids=["sd_d40", "flux_d128"]
)
def test_ring_forward_matches_full_softmax(shape):
    mesh = pmesh.make_mesh(dp=1, tp=1, sp=8)
    q, k, v = _rand_qkv(jax.random.key(0), shape)
    base = xla_attention(q, k, v)
    out = ring_attention_jit(mesh)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-6)


def ring_attention_jit(mesh, batch_axis=None):
    return jax.jit(
        lambda q, k, v: ra.ring_attention(q, k, v, mesh, batch_axis=batch_axis)
    )


def test_ring_with_dp_batch_axis():
    """(dp=2, sp=4): batch rows sharded over dp while each row's sequence
    rings over sp — the combined layout for high-res batched sampling."""
    mesh = pmesh.make_mesh(dp=2, tp=1, sp=4)
    q, k, v = _rand_qkv(jax.random.key(1), (4, 2, 64, 32))
    base = xla_attention(q, k, v)
    out = ring_attention_jit(mesh, batch_axis="dp")(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-6)


def test_ring_gradients_match_full_softmax():
    """The ppermute ring must transpose correctly: d(loss)/d(q,k,v) through
    the ring == through the reference full-softmax path (the ring is what a
    sequence-parallel train step would differentiate through)."""
    mesh = pmesh.make_mesh(dp=1, tp=1, sp=8)
    q, k, v = _rand_qkv(jax.random.key(2), (1, 2, 64, 16))
    cot = jax.random.normal(jax.random.key(3), q.shape)

    def loss_ring(q, k, v):
        return jnp.sum(ra.ring_attention(q, k, v, mesh) * cot)

    def loss_base(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * cot)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_base = jax.grad(loss_base, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_base, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"ring d{name} != full-softmax d{name}",
        )


def test_ring_multihead_entry():
    """(B, L, D) wrapper matches multihead XLA attention."""
    mesh = pmesh.make_mesh(dp=1, tp=1, sp=8)
    B, L, H, d = 2, 128, 4, 24
    kq, kk, kv = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(kq, (B, L, H * d))
    k = jax.random.normal(kk, (B, L, H * d))
    v = jax.random.normal(kv, (B, L, H * d))
    from sliders_tpu.ops.attention import multihead_attention

    base = multihead_attention(q, k, v, H, impl="xla")
    out = jax.jit(
        lambda q, k, v: ra.ring_multihead_attention(q, k, v, H, mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-6)


def test_ring_context_routes_unet_self_attention():
    """ops.attention.ring_context: a full UNet forward with every unmasked
    self-attention ringed over sp equals the plain forward — high-res
    sequence parallelism with NO model code changes. Cross-attention
    (Lq=77 text context) must keep its single-chip path (shape-gated)."""
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import attention as attn

    mesh = pmesh.make_mesh(dp=1, tp=1, sp=4)
    cfg = unet2d.TINY
    params = unet2d.init_params(jax.random.key(5), cfg)
    x = jax.random.normal(jax.random.key(6), (1, 16, 16, 4)) * 0.3
    emb = jax.random.normal(jax.random.key(7), (1, 7, cfg.cross_attention_dim)) * 0.2
    t = jnp.asarray(500.0)

    base = unet2d.apply(params, cfg, x, t, emb)
    # min_seq 64: the tiny UNet's level-0 self-attention is L=256 (16x16),
    # level-1 is L=64 — both ring; the L=7-kv cross-attentions are excluded
    # by the self-attention shape gate, or routing would crash (7 % 4 != 0)
    with attn.ring_context(mesh, min_seq=64):
        ringed = jax.jit(
            lambda p, x, t, e: unet2d.apply(p, cfg, x, t, e)
        )(params, x, t, emb)
    np.testing.assert_allclose(
        np.asarray(ringed), np.asarray(base), atol=1e-5,
        err_msg="ring-routed UNet forward != plain forward",
    )


def test_ring_rejects_bad_shapes():
    mesh = pmesh.make_mesh(dp=1, tp=1, sp=8)
    q = jnp.zeros((1, 2, 100, 16))  # 100 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        ra.ring_attention(q, q, q, mesh)
    q2 = jnp.zeros((1, 2, 64, 16))
    kv = jnp.zeros((1, 2, 32, 16))  # cross-attention shape: unsupported
    with pytest.raises(ValueError, match="self-attention"):
        ra.ring_attention(q2, kv, kv, mesh)
    with pytest.raises(ValueError, match="no 'sp' axis"):
        ra.ring_attention(q2, q2, q2, pmesh.make_mesh(dp=8, tp=1))


def test_ring_q_chunked_matches_full_softmax():
    """Within-shard q-chunking (VERDICT r3 weak 6): forcing q_chunk below
    the local length must keep forward AND gradient parity with the
    unchunked ring and with full-softmax attention — only the peak score
    memory changes (one (q_chunk, Lloc) block at a time)."""
    mesh = pmesh.make_mesh(dp=1, tp=1, sp=4)
    shape = (1, 2, 512, 40)  # Lloc = 128 per shard; q_chunk 32 -> 4 chunks
    q, k, v = _rand_qkv(jax.random.key(3), shape)
    base = xla_attention(q, k, v)

    chunked = jax.jit(
        lambda q, k, v: ra.ring_attention(q, k, v, mesh, q_chunk=32)
    )
    out = chunked(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-6)

    def loss_c(q, k, v):
        return (chunked(q, k, v) ** 2).sum()

    def loss_b(q, k, v):
        return (xla_attention(q, k, v) ** 2).sum()

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_b, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gc, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # non-dividing q_chunk falls back to the single-block path (still exact)
    odd = jax.jit(lambda q, k, v: ra.ring_attention(q, k, v, mesh, q_chunk=48))
    np.testing.assert_allclose(np.asarray(odd(q, k, v)), np.asarray(base), atol=2e-6)
