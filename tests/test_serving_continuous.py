"""Step-level continuous batching (serving/server.py continuous=True).

The contracts under test:
  - the chunked per-row-step-position program produces byte-identical PNGs
    to the whole-loop program at the same batch size (a request served by
    the continuous engine == the same request through the batch-boundary
    engine with a matching bucket);
  - a request JOINING a live batch mid-denoise changes nothing: both the
    in-flight request and the joiner get exactly the images they get when
    served alone (per-row independence across step positions);
  - admission compatibility: signature mismatch and rank-bucket overflow
    defer (correct results either way), sliderless batches are their own
    class;
  - validation (stochastic samplers rejected, chunk bounds) and close().
"""

import threading
import time

import numpy as np
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import SliderEngine

    root = tmp_path_factory.mktemp("serve_cont")
    snap = make_tiny_snapshot(str(root / "sd_tiny"))
    models = loader.load_sd(snap, dtype=jnp.float32, load_vae=True)

    def mk_slider(key, rank, shift):
        w = lnet.create_slider_network(
            jax.random.key(key), models.unet_params, rank=rank,
            train_method="noxattn",
        )
        return {m: {**e, "up": e["up"] + shift} for m, e in w.items()}

    sliders = {
        "age": mk_slider(20, 2, 0.4),
        "smile": mk_slider(21, 2, -0.4),
        "wide": mk_slider(22, 3, 0.2),  # pow2 rank bucket 4 > age's 2
    }

    kw = dict(steps=6, image_size=64, compute_dtype=jnp.float32,
              start_noise=1000.0)
    regular = SliderEngine(models, buckets=(4,), **kw)
    cont = SliderEngine(
        models, buckets=(1, 2, 4), continuous=True, continuous_rows=4,
        chunk_steps=1, **kw,
    )
    for name, w in sliders.items():
        regular.register_slider(name, w)
        cont.register_slider(name, w)
    yield regular, cont
    regular.close()
    cont.close()


def test_continuous_matches_whole_loop_program(engines):
    """Chunked per-row program == whole-loop program, byte for byte, at
    the same batch size (3 scales pad to 4 rows in both engines)."""
    regular, cont = engines
    kw = dict(seed=7, slider="age", scales=[-1.0, 0.0, 1.0])
    ref = regular.generate("photo", **kw)
    out = cont.generate("photo", **kw)
    assert [s for s, _ in out] == [s for s, _ in ref]
    for (_, a), (_, b) in zip(out, ref):
        assert a == b, "continuous image != batch-boundary image"
    # sliderless requests too (the LoRA-free executable)
    ref = regular.generate("a cat", seed=9, scales=[0.0, 0.0])
    out = cont.generate("a cat", seed=9, scales=[0.0, 0.0])
    assert [p for _, p in out] == [p for _, p in ref]


def test_midflight_join_bit_parity(engines):
    """A request that joins a LIVE batch mid-denoise gets exactly its solo
    images, and the in-flight request is untouched."""
    _, cont = engines
    kw_a = dict(seed=31, slider="age", scales=[1.0, -1.0])
    kw_b = dict(seed=32, slider="smile", scales=[0.5])
    solo_a = cont.generate("photo", **kw_a)
    solo_b = cont.generate("a cat", **kw_b)

    # deterministic mid-flight arrival: hold the device lock so A's batch
    # cannot start, enqueue A (the worker admits it, then blocks on the
    # lock), enqueue B, release — B is guaranteed to be in the queue
    # before A's second chunk's admission round, so it joins a LIVE batch
    pa = cont._make_pending("photo", **kw_a)
    pb = cont._make_pending("a cat", **kw_b)
    with cont._lock:
        with cont._queue_cv:
            cont._queue.append(pa)
            cont._queue_cv.notify()
        time.sleep(0.05)  # let the worker admit A and block on the lock
        with cont._queue_cv:
            cont._queue.append(pb)
            cont._queue_cv.notify()
    for p in (pa, pb):
        assert p.event.wait(timeout=600)
        assert p.error is None
    assert [png for _, png in pa.result] == [png for _, png in solo_a]
    assert [png for _, png in pb.result] == [png for _, png in solo_b]


def test_overlap_reduces_chunks(engines):
    """Under overlapping arrivals the engine spends fewer chunk calls than
    serial service would (the continuous-batching win)."""
    _, cont = engines
    chunks0 = cont.stats["chunks"]
    pa = cont._make_pending("photo", seed=51, slider="age", scales=[1.0])
    pb = cont._make_pending("photo", seed=52, slider="age", scales=[1.0])
    # same lock trick as above: B is queued before A's batch can advance,
    # so B provably overlaps A (joins at chunk 1 or shares A's admission)
    with cont._lock:
        with cont._queue_cv:
            cont._queue.append(pa)
            cont._queue_cv.notify()
        time.sleep(0.05)
        with cont._queue_cv:
            cont._queue.append(pb)
            cont._queue_cv.notify()
    for p in (pa, pb):
        assert p.event.wait(timeout=600) and p.error is None
    used = cont.stats["chunks"] - chunks0
    # serial service would need 12 chunks (6 steps x chunk 1 each); the
    # overlap bounds it by 8 (6 if both landed in one admission round)
    assert used <= 8, used


def test_rank_bucket_defer_and_signature_classes(engines):
    """A rank-bucket-mismatched request defers to its own batch (EXACT
    bucket equality: zero rank-padding is a no-op on TPU but XLA:CPU
    reassociates the wider einsum by ~1e-6, which would break the
    bit-parity contract) — results still exactly solo either way."""
    import jax

    from sliders_tpu.lora import network as lnet

    _, cont = engines
    solo_wide = cont.generate("photo", seed=61, slider="wide", scales=[1.0])
    solo_age = cont.generate("photo", seed=61, slider="age", scales=[1.0])

    # _cont_fits is the admission gate: rank buckets must match exactly
    q_wide = cont._make_pending("x", slider="wide", scales=[0.0])  # bucket 4
    q_age = cont._make_pending("x", slider="age", scales=[0.0])  # bucket 2
    q_smile = cont._make_pending("x", slider="smile", scales=[0.0])  # 2
    b_age = cont._cont_req_buckets(q_age)
    b_wide = cont._cont_req_buckets(q_wide)
    assert not cont._cont_fits(q_wide, b_age)
    assert not cont._cont_fits(q_age, b_wide)
    assert cont._cont_fits(q_smile, b_age)
    assert set(b_wide.values()) == {4} and set(b_age.values()) == {2}

    # e2e: wide behind age still serves correctly (deferred batch)
    pa = cont._make_pending("photo", seed=61, slider="age", scales=[1.0])
    pb = cont._make_pending("photo", seed=61, slider="wide", scales=[1.0])
    with cont._queue_cv:
        cont._queue.extend([pa, pb])
        cont._queue_cv.notify()
    for p in (pa, pb):
        assert p.event.wait(timeout=600) and p.error is None
    assert [p for _, p in pa.result] == [p for _, p in solo_age]
    assert [p for _, p in pb.result] == [p for _, p in solo_wide]

    # different module set never merges but serves fine
    w4 = lnet.create_slider_network(
        jax.random.key(30), cont.models.unet_params, rank=2,
        train_method="xattn",
    )
    cont.register_slider("xonly", w4)
    out = cont.generate("photo", seed=62, slider="xonly", scales=[1.0, 0.0])
    assert len(out) == 2


def test_continuous_warmup_and_validation(engines, tmp_path_factory):
    import jax.numpy as jnp

    from sliders_tpu.models import loader
    from sliders_tpu.pipelines import text2image as t2i
    from sliders_tpu.serving.server import SliderEngine

    _, cont = engines
    # warmup exercises fresh + join + decode without errors
    cont.warmup(with_slider="age", n_scales=2, multi_tenant=True)

    # stochastic samplers cannot run continuous
    from sliders_tpu.diffusion import make_sampler, make_schedule

    with pytest.raises(NotImplementedError, match="stochastic"):
        t2i.make_continuous_step_fn(
            cont.models.unet_config,
            make_sampler(make_schedule(), "ddpm", 6),
            chunk=2,
        )
    with pytest.raises(ValueError, match="chunk_steps"):
        SliderEngine(
            cont.models, steps=6, image_size=64,
            compute_dtype=jnp.float32, continuous=True, chunk_steps=0,
        )
    with pytest.raises(NotImplementedError, match="stochastic"):
        SliderEngine(
            cont.models, scheduler="euler_a", steps=6, image_size=64,
            compute_dtype=jnp.float32, continuous=True,
        )


def test_continuous_close_drains():
    """close() lets queued work finish, then the worker exits."""
    import jax.numpy as jnp

    # separate engine so closing doesn't kill the module fixture
    import tempfile

    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import SliderEngine

    with tempfile.TemporaryDirectory() as d:
        snap = make_tiny_snapshot(d + "/sd_tiny")
        models = loader.load_sd(snap, dtype=jnp.float32, load_vae=True)
        eng = SliderEngine(
            models, steps=3, image_size=64, compute_dtype=jnp.float32,
            continuous=True, continuous_rows=2, chunk_steps=1,
        )
        out = eng.generate("photo", seed=1, scales=[0.0])
        assert len(out) == 1
        eng.close()
        with pytest.raises(RuntimeError, match="closed"):
            eng.generate("photo", scales=[0.0])
