"""Per-shape conv microbenchmark on the real chip.

Enumerates every conv2d call (shape, stride, count) in the SD1.5 / SDXL
UNet forwards at 512px by tracing with a recording wrapper, then times the
XLA conv for each distinct 3x3 shape with honest chained-fetch timing
(BASELINE.md round-2 methodology: warmup, >=3 samples of a K-call chain,
final host fetch data-depending on all calls, take the min).

Output: one JSON line per shape with measured ms, ideal bf16 ms
(FLOPs / 197 TFLOPS), and implied MXU utilization — the headroom map for
the Pallas conv kernel (VERDICT.md round-3 item 1a).

Run detached on the TPU:  nohup python experiments/conv_bench.py > /tmp/conv_bench.log 2>&1 &
"""

import json
import time
from collections import Counter
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sliders_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

PEAK_BF16 = 197e12  # v5e MXU peak


def enumerate_conv_shapes(cfg, batch, res):
    """Trace the UNet forward, recording every conv2d call."""
    from sliders_tpu.models import unet2d
    from sliders_tpu.ops import basic

    records = Counter()
    orig = basic.conv2d

    def recording_conv2d(p, x, *, stride=1, padding="SAME", lora=None, name=None):
        w = p["weight"]
        records[(x.shape, w.shape, stride)] += 1
        return orig(p, x, stride=stride, padding=padding, lora=lora, name=name)

    basic.conv2d = recording_conv2d
    # unet2d imported conv2d by name; patch there too
    orig_u = unet2d.conv2d
    unet2d.conv2d = recording_conv2d
    try:
        params = jax.eval_shape(
            lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16), jax.random.key(0)
        )
        x = jax.ShapeDtypeStruct((batch, res // 8, res // 8, cfg.in_channels), jnp.bfloat16)
        t = jax.ShapeDtypeStruct((batch,), jnp.int32)
        ehs = jax.ShapeDtypeStruct((batch, 77, cfg.cross_attention_dim), jnp.bfloat16)
        added = None
        if cfg.addition_embed_type == "text_time":
            added = {
                "text_embeds": jax.ShapeDtypeStruct((batch, 1280), jnp.bfloat16),
                "time_ids": jax.ShapeDtypeStruct((batch, 6), jnp.float32),
            }
        jax.eval_shape(partial(unet2d.apply, cfg=cfg), params, sample=x, timesteps=t,
                       encoder_hidden_states=ehs, added_cond=added)
    finally:
        basic.conv2d = orig
        unet2d.conv2d = orig_u
    return records


def time_conv(xshape, wshape, stride, samples=4, inner=(20, 320)):
    """Time ONE conv differentially: run a data-chained conv loop inside a
    single jitted program at two trip counts and take the slope
    (t_long - t_short) / (n_long - n_short). This cancels BOTH the
    per-dispatch tunnel overhead (~25 ms, which floors a naive
    per-iteration estimate at ~0.5 ms) and the host-fetch latency."""
    kh, kw, cin, cout = wshape
    pad = "SAME" if kh == 3 else "VALID"

    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def run(x, w, b, prev, n):
        def body(i, carry):
            xx, acc = carry
            y = jax.lax.conv_general_dilated(
                xx, w, window_strides=(stride, stride), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + b
            # cheap data dependence: next input depends on this output
            link = y[0, 0, 0, 0].astype(jnp.float32)
            xx = xx * (1.0 + link * 1e-30).astype(xx.dtype)
            return (xx, acc + link)

        x = x * (1.0 + prev * 1e-30).astype(x.dtype)
        (_, acc) = jax.lax.fori_loop(0, n, body, (x, jnp.asarray(0.0)))
        return acc

    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, xshape, jnp.bfloat16)
    w = jax.random.normal(k2, wshape, jnp.bfloat16) * (cin * kh * kw) ** -0.5
    b = jnp.zeros((cout,), jnp.bfloat16)

    n0, n1 = inner
    best = {n0: float("inf"), n1: float("inf")}
    prev = run(x, w, b, jnp.asarray(0.0), n0)
    _ = np.asarray(prev)
    prev = run(x, w, b, prev, n1)
    _ = np.asarray(prev)  # both variants compiled + warm
    for _ in range(samples):
        for n in (n0, n1):
            t0 = time.perf_counter()
            prev = run(x, w, b, prev, n)
            _ = np.asarray(prev)
            best[n] = min(best[n], time.perf_counter() - t0)
    return (best[n1] - best[n0]) / (n1 - n0)


def main():
    from sliders_tpu.models import unet2d

    all_shapes = {}
    for mname, cfg, batch in (("sd15", unet2d.SD15, 2), ("sdxl", unet2d.SDXL, 2)):
        recs = enumerate_conv_shapes(cfg, batch, 512)
        print(f"# {mname}: {sum(recs.values())} conv calls, {len(recs)} distinct shapes", flush=True)
        for (xs, ws, st), n in sorted(recs.items(), key=lambda kv: -kv[1]):
            all_shapes.setdefault((xs, ws, st), {})[mname] = n

    total = {"sd15": {"meas": 0.0, "ideal": 0.0}, "sdxl": {"meas": 0.0, "ideal": 0.0}}
    for (xs, ws, st), counts in all_shapes.items():
        kh, kw, cin, cout = ws
        B, H, W, _ = xs
        Ho, Wo = H // st, W // st
        flops = 2 * B * Ho * Wo * kh * kw * cin * cout
        ideal_ms = flops / PEAK_BF16 * 1e3
        meas = time_conv(xs, ws, st) * 1e3
        mxu = ideal_ms / meas if meas > 0 else 0
        print(json.dumps({
            "x": list(xs), "w": list(ws), "stride": st,
            "ms": round(meas, 4), "ideal_ms": round(ideal_ms, 4),
            "mxu_pct": round(100 * mxu, 1), "counts": counts,
        }), flush=True)
        for m, n in counts.items():
            total[m]["meas"] += n * meas
            total[m]["ideal"] += n * ideal_ms
    for m, t in total.items():
        print(json.dumps({"model": m, "fwd_conv_ms_total": round(t["meas"], 2),
                          "fwd_conv_ms_ideal": round(t["ideal"], 2)}), flush=True)


if __name__ == "__main__":
    main()
