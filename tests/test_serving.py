"""Serving subsystem e2e: warm engine + HTTP API on the tiny snapshot.

Pins the central serving claim: hot-swapping sliders with the same adapter
structure reuses the compiled program (no retrace), and scale sweeps pad to
buckets so request sizes k <= bucket share one executable."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest

from helpers import make_tiny_snapshot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import SliderEngine, make_http_server

    root = tmp_path_factory.mktemp("serve")
    snap = make_tiny_snapshot(str(root / "sd_tiny"))
    models = loader.load_sd(snap, dtype=jnp.float32, load_vae=True)

    ckpts = []
    for i in range(2):
        w = lnet.create_slider_network(
            jax.random.key(20 + i), models.unet_params, rank=2, train_method="noxattn"
        )
        w = {m: {**e, "up": e["up"] + (0.4 if i == 0 else -0.4)} for m, e in w.items()}
        p = str(root / f"s{i}.safetensors")
        lora_io.save_slider(p, w)
        ckpts.append(p)

    engine = SliderEngine(
        models, steps=3, image_size=64, compute_dtype=jnp.float32,
        start_noise=1000.0,
    )
    server = make_http_server(engine, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield engine, server.server_address[1], ckpts
    engine.close()
    server.shutdown()


def _req(port, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_health_load_generate_and_hot_swap(served):
    engine, port, ckpts = served

    status, health = _req(port, "GET", "/healthz")
    assert status == 200 and health["ok"] and health["sliders"] == []

    status, _ = _req(port, "POST", "/sliders", {"name": "age", "path": ckpts[0]})
    assert status == 200

    status, out = _req(
        port, "POST", "/generate",
        {"prompt": "photo", "seed": 5, "slider": "age", "scales": [-1, 0, 1]},
    )
    assert status == 200
    assert [e["scale"] for e in out["images"]] == [-1.0, 0.0, 1.0]
    from PIL import Image

    imgs = {
        e["scale"]: np.asarray(Image.open(io.BytesIO(base64.b64decode(e["png"]))))
        for e in out["images"]
    }
    assert imgs[0.0].shape == (16, 16, 3)
    assert (imgs[-1.0] != imgs[1.0]).any()

    # hot swap: same adapter structure + same scale bucket -> no recompile
    n_before = engine.fn._cache_size()
    status, _ = _req(port, "POST", "/sliders", {"name": "smile", "path": ckpts[1]})
    assert status == 200
    status, out2 = _req(
        port, "POST", "/generate",
        {"prompt": "photo", "seed": 5, "slider": "smile", "scales": [0, 0.5, 1]},
    )
    assert status == 200
    assert engine.fn._cache_size() == n_before
    img2 = np.asarray(
        Image.open(io.BytesIO(base64.b64decode(out2["images"][2]["png"])))
    )
    assert (img2 != imgs[1.0]).any()  # different slider, different output


def test_composition_and_errors(served):
    engine, port, ckpts = served

    _req(port, "POST", "/sliders", {"name": "age", "path": ckpts[0]})
    status, _ = _req(
        port, "POST", "/sliders",
        {"name": "both", "compose": [{"name": "age", "scale": 1.5},
                                     {"path": ckpts[1], "scale": -0.5}]},
    )
    assert status == 200
    status, out = _req(
        port, "POST", "/generate",
        {"prompt": "photo", "slider": "both", "scales": [0, 1]},
    )
    assert status == 200 and [e["scale"] for e in out["images"]] == [0.0, 1.0]

    status, err = _req(port, "POST", "/generate", {"prompt": "x", "slider": "nope"})
    assert status == 404 and "nope" in err["error"]

    # duplicate scales each get their own image (ordered response)
    status, out = _req(
        port, "POST", "/generate", {"prompt": "photo", "scales": [1, 1.0]}
    )
    assert status == 200 and [e["scale"] for e in out["images"]] == [1.0, 1.0]

    # malformed field types are a clean 400, not a dropped connection
    status, err = _req(port, "POST", "/generate", {"prompt": "x", "scales": 5})
    assert status == 400
    status, err = _req(port, "POST", "/generate", {"prompt": "x", "scales": [None]})
    assert status == 400

    # missing required fields are 400 (not 404: that's for unknown sliders)
    status, err = _req(port, "POST", "/generate", {})
    assert status == 400 and "prompt" in err["error"]
    status, err = _req(port, "POST", "/sliders", {"name": "x"})
    assert status == 400 and "path" in err["error"]

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/generate", body=b"{not json")
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()

    status, _ = _req(port, "GET", "/nothere")
    assert status == 404

    # too many scales is a clean 400, not a compile
    status, err = _req(
        port, "POST", "/generate", {"prompt": "x", "scales": list(range(20))}
    )
    assert status == 400 and "at most" in err["error"]


_NEGATIVE_BODIES = [
    # (path, raw_or_dict, expected_status, error_substring)
    ("/generate", b"", 400, "prompt"),  # empty body parses as {}
    ("/generate", b"[1,2,3]", 400, "object"),
    ("/generate", b'"prompt"', 400, "object"),
    ("/generate", b"\xff\xfe\x00bad", 400, "bad json"),
    ("/generate", {"prompt": "x", "scales": "abc"}, 400, None),
    ("/generate", {"prompt": "x", "scales": {"a": 1}}, 400, None),
    ("/generate", {"prompt": "x", "scales": [[1.0]]}, 400, None),
    ("/generate", {"prompt": "x", "seed": "not-an-int"}, 400, None),
    ("/generate", {"prompt": "x", "guidance_scale": "hot"}, 400, None),
    ("/generate", {"prompt": "x", "start_noise": "early"}, 400, None),
    ("/generate", {"prompt": "x", "scales": list(range(99))}, 400, "at most"),
    ("/generate", {"prompt": "x", "slider": "never-loaded"}, 404, "never-loaded"),
    ("/sliders", {"name": "x", "path": "/nonexistent/ckpt.pt"}, 400, None),
    ("/sliders", {"name": "x", "compose": [{"scale": 1.0}]}, 400, "name"),
    ("/sliders", {"name": "x", "compose": [{"name": "ghost"}]}, 404, "ghost"),
    ("/sliders", b"{bad", 400, "bad json"),
]


@pytest.mark.parametrize("path,body,want_status,want_sub", _NEGATIVE_BODIES)
def test_http_negative_paths(served, path, body, want_status, want_sub):
    """Table-driven hostile-input sweep: every malformed body gets a clean
    JSON error with the right status — never a dropped connection, never a
    500 for a client mistake, and never device work."""
    _, port, _ = served
    if isinstance(body, bytes):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", path, body=body)
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        status = resp.status
    else:
        status, out = _req(port, "POST", path, body)
    assert status == want_status, (body, status, out)
    assert "error" in out
    if want_sub:
        assert want_sub in out["error"], (body, out)


def test_concurrent_load_slider_vs_generate(served):
    """Hot-swapping a slider registry entry while /generate traffic is in
    flight must never corrupt a response: every request is served 200 with
    the right image count (the registry lock is split from the device
    lock, so loads never wait behind a denoise and vice versa)."""
    engine, port, ckpts = served
    engine.load_slider("hot", ckpts[0])

    errs = []
    results = []
    stop = threading.Event()

    def swapper():
        i = 0
        while not stop.is_set():
            try:
                engine.load_slider("hot", ckpts[i % 2])
            except Exception as e:
                errs.append(e)
                return
            i += 1

    def requester(seed):
        try:
            status, out = _req(
                port, "POST", "/generate",
                {"prompt": "photo", "seed": seed, "slider": "hot",
                 "scales": [-1.0, 1.0]},
            )
            results.append((status, len(out.get("images", []))))
        except Exception as e:
            errs.append(e)

    sw = threading.Thread(target=swapper)
    reqs = [threading.Thread(target=requester, args=(i,)) for i in range(4)]
    sw.start()
    for t in reqs:
        t.start()
    for t in reqs:
        t.join()
    stop.set()
    sw.join()
    assert not errs, errs
    assert all(s == 200 and n == 2 for s, n in results), results


def test_dynamic_batching_coalesces_and_matches_solo(served):
    """Compatible queued requests run as ONE batched denoise and each gets
    exactly the images a solo run produces (per-row math is independent;
    ddim is batching-invariant)."""
    engine, port, ckpts = served
    engine.load_slider("age", ckpts[0])

    reqs = [
        dict(prompt="photo", seed=31, slider="age", scales=[-1.0, 1.0]),
        dict(prompt="a cat", seed=32, slider="age", scales=[0.5]),
        dict(prompt="photo", seed=33, slider="age", scales=[2.0, 0.0, -2.0]),
    ]
    solo = [engine.generate(r["prompt"], **{k: v for k, v in r.items() if k != "prompt"})
            for r in reqs]

    # stuff the queue while the worker sleeps, then wake it once: the drain
    # must take all three compatible requests in a single batch
    pendings = [
        engine._make_pending(r["prompt"], **{k: v for k, v in r.items() if k != "prompt"})
        for r in reqs
    ]
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend(pendings)
        engine._queue_cv.notify()
    for p in pendings:
        assert p.event.wait(timeout=600)
        assert p.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    assert engine.stats["requests"] == before["requests"] + 3
    assert engine.stats["rows"] == before["rows"] + 6

    for p, ref in zip(pendings, solo):
        assert [s for s, _ in p.result] == [s for s, _ in ref]
        for (_, png_b), (_, png_s) in zip(p.result, ref):
            assert png_b == png_s, "batched image != solo image"

    # different start_noise/guidance still merge (per-row vectors) and each
    # row keeps its own gate: results match the solo runs bit for bit
    kw1 = dict(seed=41, slider="age", scales=[1.0], start_noise=1000.0)
    kw2 = dict(seed=41, slider="age", scales=[1.0], start_noise=-1.0,
               guidance_scale=3.0)
    solo1 = engine.generate("photo", **kw1)
    solo2 = engine.generate("photo", **kw2)
    p1 = engine._make_pending("photo", **kw1)
    p2 = engine._make_pending("photo", **kw2)
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend([p1, p2])
        engine._queue_cv.notify()
    for p in (p1, p2):
        assert p.event.wait(timeout=600) and p.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    assert p1.result[0][1] == solo1[0][1]
    assert p2.result[0][1] == solo2[0][1]
    # gate actually differs per row: always-on vs always-off sliders diverge
    assert p1.result[0][1] != p2.result[0][1]

    # DIFFERENT sliders with the same adapter structure merge too: the rows
    # carry per-row stacked weights (lora/batch.py) and each request still
    # gets bit-exactly its solo images
    engine.load_slider("smile", ckpts[1])
    kw_a = dict(seed=42, slider="age", scales=[1.0, -1.0])
    kw_s = dict(seed=43, slider="smile", scales=[0.5])
    solo_a = engine.generate("photo", **kw_a)
    solo_s = engine.generate("a cat", **kw_s)
    q1 = engine._make_pending("photo", **kw_a)
    q2 = engine._make_pending("a cat", **kw_s)
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend([q1, q2])
        engine._queue_cv.notify()
    for q in (q1, q2):
        assert q.event.wait(timeout=600) and q.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    assert [png for _, png in q1.result] == [png for _, png in solo_a]
    assert [png for _, png in q2.result] == [png for _, png in solo_s]

    # a DIFFERENT-RANK adapter merges too (heterogeneous rank padding,
    # lora/batch.py): rank-1 rows ride zero-padded next to rank-2 rows and
    # each request still gets exactly its solo images
    import jax

    from sliders_tpu.lora import network as lnet

    w3 = lnet.create_slider_network(
        jax.random.key(77), engine.models.unet_params, rank=1,
        train_method="noxattn",
    )
    w3 = {m: {**e, "up": e["up"] + 0.6} for m, e in w3.items()}
    engine.register_slider("thin", w3)
    solo_thin = engine.generate("photo", seed=44, slider="thin", scales=[1.0])
    solo_age = engine.generate("photo", seed=44, slider="age", scales=[1.0])
    q1 = engine._make_pending("photo", seed=44, slider="age", scales=[1.0])
    q2 = engine._make_pending("photo", seed=44, slider="thin", scales=[1.0])
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend([q1, q2])
        engine._queue_cv.notify()
    for q in (q1, q2):
        assert q.event.wait(timeout=600) and q.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    assert [png for _, png in q1.result] == [png for _, png in solo_age]
    assert [png for _, png in q2.result] == [png for _, png in solo_thin]

    # a different MODULE SET (train method) must NOT merge: its program
    # has a different LoRA tree structure entirely
    w4 = lnet.create_slider_network(
        jax.random.key(78), engine.models.unet_params, rank=2,
        train_method="xattn",
    )
    engine.register_slider("xonly", w4)
    q1 = engine._make_pending("photo", seed=45, slider="age", scales=[1.0])
    q2 = engine._make_pending("photo", seed=45, slider="xonly", scales=[1.0])
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend([q1, q2])
        engine._queue_cv.notify()
    for q in (q1, q2):
        assert q.event.wait(timeout=600) and q.error is None
    assert engine.stats["batches"] == before["batches"] + 2

    # multi-tenant warmup drives the stacked path once (1 solo batch +
    # 1 coalesced stacked batch) without errors
    before = dict(engine.stats)
    engine.warmup(with_slider="age", n_scales=2, multi_tenant=True)
    assert engine.stats["batches"] == before["batches"] + 2
    with pytest.raises(ValueError, match="needs with_slider"):
        engine.warmup(multi_tenant=True)


def test_custom_buckets(served):
    """buckets=(2,) serves exactly that program: 1-scale requests pad to 2,
    3-scale requests are rejected up front; mesh engines require dp
    multiples."""
    import jax.numpy as jnp
    import pytest as _pytest

    from sliders_tpu.parallel.mesh import make_mesh
    from sliders_tpu.serving.server import SliderEngine

    engine, _, ckpts = served
    eng = SliderEngine(
        engine.models, steps=2, image_size=64, compute_dtype=jnp.float32,
        buckets=(2,),
    )
    assert eng._buckets == (2,)
    out = eng.generate("photo", scales=[0.5])
    assert len(out) == 1 and out[0][0] == 0.5
    with _pytest.raises(ValueError, match="at most"):
        eng.generate("photo", scales=[0.0, 1.0, 2.0])
    eng.close()

    with _pytest.raises(ValueError, match="multiples of"):
        SliderEngine(
            engine.models, steps=2, image_size=64,
            compute_dtype=jnp.float32, mesh=make_mesh(dp=8), buckets=(5,),
        )

    # malformed buckets fail loudly at construction (ADVICE round 3)
    for bad in ((), (0,), (4, -1)):
        with _pytest.raises(ValueError, match="positive"):
            SliderEngine(
                engine.models, steps=2, image_size=64,
                compute_dtype=jnp.float32, buckets=bad,
            )


def test_engine_lifecycle_and_stochastic_no_coalesce(served):
    """close() stops the worker and rejects new requests; stochastic
    samplers never coalesce (outputs must not depend on traffic)."""
    import jax.numpy as jnp

    from sliders_tpu.serving.server import SliderEngine

    engine, _, _ = served
    eng2 = SliderEngine(
        engine.models, scheduler="ddpm", steps=2, image_size=64,
        compute_dtype=jnp.float32,
    )
    assert eng2._coalesce is False
    p1 = eng2._make_pending("photo", seed=1, scales=[0.0, 1.0])
    p2 = eng2._make_pending("photo", seed=2, scales=[0.0])
    with eng2._queue_cv:
        eng2._queue.extend([p1, p2])
        eng2._queue_cv.notify()
    for p in (p1, p2):
        assert p.event.wait(timeout=600) and p.error is None
    assert eng2.stats["batches"] == 2  # ddpm: one request per denoise

    # multi-tenant warmup on a non-coalescing engine is an explicit error,
    # not a silent solo-batch no-op (ADVICE round 3)
    with pytest.raises(ValueError, match="coalescing is disabled"):
        eng2.warmup(with_slider="whatever", multi_tenant=True)

    eng2.close()
    eng2.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        eng2.generate("photo")


def test_xl_engine_batches_added_conds(tmp_path_factory):
    """SDXL serving: the pooled-embeds/time-ids added conds concatenate
    correctly across a coalesced batch (the XL-only branch of
    _generate_batch), and batched results match solo runs."""
    import jax
    import jax.numpy as jnp

    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import SliderEngine

    snap = make_tiny_snapshot(
        str(tmp_path_factory.mktemp("serve_xl") / "sdxl_tiny"), xl=True
    )
    models = loader.load_sdxl(snap, dtype=jnp.float32, load_vae=True)
    engine = SliderEngine(
        models, steps=2, image_size=64, compute_dtype=jnp.float32,
        start_noise=1000.0,
    )
    w = lnet.create_slider_network(
        jax.random.key(8), models.unet_params, rank=2, train_method="noxattn"
    )
    engine.sliders["s"] = {m: {**e, "up": e["up"] + 0.3} for m, e in w.items()}

    reqs = [
        dict(prompt="photo", seed=1, slider="s", scales=[-1.0, 1.0]),
        dict(prompt="a cat", seed=2, slider="s", scales=[0.5]),
    ]
    solo = [engine.generate(r["prompt"], **{k: v for k, v in r.items() if k != "prompt"})
            for r in reqs]
    pendings = [
        engine._make_pending(r["prompt"], **{k: v for k, v in r.items() if k != "prompt"})
        for r in reqs
    ]
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend(pendings)
        engine._queue_cv.notify()
    for p in pendings:
        assert p.event.wait(timeout=600) and p.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    for p, ref in zip(pendings, solo):
        for (_, a), (_, b) in zip(p.result, ref):
            assert a == b, "XL batched image != solo image"
    engine.close()


def test_mesh_engine_matches_single_device(served):
    """SliderEngine(mesh=dp8): request rows shard over the dp axis and the
    images match the unsharded engine's bit for bit (multi-chip serving)."""
    import jax.numpy as jnp

    from sliders_tpu.parallel.mesh import make_mesh
    from sliders_tpu.serving.server import SliderEngine

    engine, _, ckpts = served
    engine.load_slider("age", ckpts[0])
    meshed = SliderEngine(
        engine.models, steps=3, image_size=64, compute_dtype=jnp.float32,
        start_noise=1000.0, mesh=make_mesh(dp=8),
    )
    assert meshed._buckets[0] == 8  # buckets are dp multiples
    meshed.sliders["age"] = engine.sliders["age"]

    kw = dict(seed=5, slider="age", scales=[-1.0, 0.0, 1.0])
    solo = engine.generate("photo", **kw)
    sharded = meshed.generate("photo", **kw)
    assert [s for s, _ in sharded] == [s for s, _ in solo]
    for (_, a), (_, b) in zip(sharded, solo):
        assert a == b, "dp-sharded serving image != single-device image"

    # cross-slider stacked weights compose with the dp mesh too (the lora
    # in_sharding is P() — replicated — which is rank-agnostic): two
    # different sliders coalesce into one sharded denoise, outputs match
    # the unsharded engine row for row
    engine.load_slider("smile", ckpts[1])
    meshed.sliders["smile"] = engine.sliders["smile"]
    kw_a = dict(seed=6, slider="age", scales=[1.0])
    kw_s = dict(seed=7, slider="smile", scales=[-0.5, 0.5])
    solo_a = engine.generate("photo", **kw_a)
    solo_s = engine.generate("a cat", **kw_s)
    p1 = meshed._make_pending("photo", **kw_a)
    p2 = meshed._make_pending("a cat", **kw_s)
    before = dict(meshed.stats)
    with meshed._queue_cv:
        meshed._queue.extend([p1, p2])
        meshed._queue_cv.notify()
    for p in (p1, p2):
        assert p.event.wait(timeout=600) and p.error is None
    assert meshed.stats["batches"] == before["batches"] + 1
    assert [png for _, png in p1.result] == [png for _, png in solo_a]
    assert [png for _, png in p2.result] == [png for _, png in solo_s]
    meshed.close()


def test_flux_engine_serves_and_batches(tmp_path_factory):
    """FLUX serving (VERDICT r3 item 4): the engine runs the flow-matching
    pipeline (guidance embedding, step-index slider gate) behind the same
    queue/batching machinery — solo requests, cross-request coalescing with
    DIFFERENT sliders (stacked adapters through the MMDiT), and the HTTP
    surface with the skip_till alias, all bit-matching solo runs."""
    import jax
    import jax.numpy as jnp

    from helpers import make_tiny_flux_snapshot
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.lora import network as lnet
    from sliders_tpu.models import loader
    from sliders_tpu.serving.server import FluxSliderEngine, make_http_server

    root = tmp_path_factory.mktemp("serve_flux")
    snap = make_tiny_flux_snapshot(str(root / "flux_tiny"))
    models = loader.load_flux(snap, dtype=jnp.float32, load_vae=True)

    engine = FluxSliderEngine(
        models, steps=2, image_size=64, compute_dtype=jnp.float32,
    )
    assert engine.family == "flux" and engine._coalesce
    ckpts = []
    for i in range(2):
        w = lnet.create_slider_network(
            jax.random.key(30 + i), models.transformer_params, rank=2,
            train_method="xattn",
        )
        w = {m: {**e, "up": e["up"] + (0.3 if i == 0 else -0.3)}
             for m, e in w.items()}
        p = str(root / f"f{i}.safetensors")
        lora_io.save_slider(p, w)
        ckpts.append(p)
    engine.load_slider("s0", ckpts[0])
    engine.load_slider("s1", ckpts[1])

    # solo: a 3-scale sweep produces 3 distinct, ordered images
    out = engine.generate("a photo", seed=4, slider="s0",
                          scales=[-2.0, 0.0, 2.0])
    assert [s for s, _ in out] == [-2.0, 0.0, 2.0]
    assert out[0][1] != out[2][1]

    # coalescing two DIFFERENT flux sliders -> one stacked batch, results
    # bit-equal to the solo runs
    kw_a = dict(seed=5, slider="s0", scales=[1.0, -1.0])
    kw_b = dict(seed=6, slider="s1", scales=[0.5])
    solo_a = engine.generate("a photo", **kw_a)
    solo_b = engine.generate("a cat", **kw_b)
    p1 = engine._make_pending("a photo", **kw_a)
    p2 = engine._make_pending("a cat", **kw_b)
    before = dict(engine.stats)
    with engine._queue_cv:
        engine._queue.extend([p1, p2])
        engine._queue_cv.notify()
    for p in (p1, p2):
        assert p.event.wait(timeout=600) and p.error is None
    assert engine.stats["batches"] == before["batches"] + 1
    assert [png for _, png in p1.result] == [png for _, png in solo_a]
    assert [png for _, png in p2.result] == [png for _, png in solo_b]

    # the step-index gate changes outputs: skip_till=1000 (never on) at a
    # big scale must equal the scale-0 image; skip_till=-1 must differ
    base = engine.generate("a photo", seed=7, scales=[0.0])
    off = engine.generate("a photo", seed=7, slider="s0", scales=[3.0],
                          start_noise=1000.0)
    on = engine.generate("a photo", seed=7, slider="s0", scales=[3.0],
                         start_noise=-1.0)
    assert off[0][1] == base[0][1]
    assert on[0][1] != base[0][1]

    # HTTP surface: healthz reports the family; /generate takes skip_till
    import http.client
    import json as _json

    server = make_http_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status, health = _req(port, "GET", "/healthz")
        assert status == 200 and health["family"] == "flux"
        status, resp = _req(
            port, "POST", "/generate",
            {"prompt": "a photo", "seed": 7, "slider": "s0",
             "scales": [3.0], "skip_till": -1.0},
        )
        assert status == 200
        assert base64.b64decode(resp["images"][0]["png"]) == on[0][1]
    finally:
        server.shutdown()
        engine.close()
