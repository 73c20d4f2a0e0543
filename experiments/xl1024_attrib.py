"""SDXL 1024px denoise attribution pass (VERDICT r4 item 3).

The xl1024 bench row (6307 ms round-3, 50-step CFG DDIM at the reference's
native eval resolution, generate_images_xl.py:443-445) was never broken
down the way the 512px train step was in round 2. This script joins three
measurements so the number is attributed, not asserted:

1. one full UNet forward at 1024px CFG batch 2 (the denoise-step body),
   Pallas-attention routing vs all-XLA attention — the end-to-end delta
   the custom kernel is worth at this resolution;
2. per-shape attention microbenches for every attention in that forward.
   Shape census (trace of models/unet2d.py at (2,128,128,4)):
     level 1: 10x self (2,10,4096,64) + 10x cross Lkv=77
     level 2: 60x self (2,20,1024,64) + 60x cross Lkv=77
   Both self shapes pass ops/pallas_attention.supports() (d=64 <= 128
   lanes, whole K/V in VMEM), so the custom kernel serves ALL self
   attention at 1024px; the stock flash kernel serves nothing; ring
   q-chunking never engages (no mesh in the sampling path). block_q
   alternatives (512/256/128) are A/B'd per shape;
3. the per-step residual: forward time minus the summed attention
   estimate = conv + FFN/proj matmul + norm territory, and the gap
   between 50x forward and the measured 50-step denoise = scheduler math
   + CFG combine + dispatch.

Timing protocol (CLAUDE.md traps 1-3): every timed unit is an IN-PROGRAM
`lax.fori_loop` chain (iteration i+1's input depends on i's output — the
~25 ms/dispatch tunnel overhead would swamp 1-2 ms kernels), ended with a
host fetch of a value depending on all compute, best-of-SAMPLES samples.

Run detached, AFTER any other TPU job finishes (one TPU owner at a time):
  nohup python experiments/xl1024_attrib.py > /tmp/xl1024_attrib.log 2>&1 &
  echo $! > /tmp/xl1024_attrib.pid
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (sets the persistent compile cache + SAMPLES)
from bench import best_sample
from sliders_tpu.lora import network as lnet
from sliders_tpu.lora.merge import add_deltas, lora_deltas
from sliders_tpu.models import unet2d
from sliders_tpu.ops import attention as attn_ops
from sliders_tpu.ops import pallas_attention as pa


def line(**kw):
    print(json.dumps(kw), flush=True)


# ---------------------------------------------------------------------------
# timed in-program loops
# ---------------------------------------------------------------------------


def time_loop(step_fn, x0, consts, repeats: int, samples: int = 6) -> float:
    """Best-of-`samples` seconds for `repeats` chained applications of
    step_fn(x, *consts) -> x-shaped output, all inside ONE program."""

    @jax.jit
    def loop(x, *consts):
        def body(i, x):
            return x0 * 1e-6 + step_fn(x, *consts) * (1.0 + 1e-6 * i)

        return jax.lax.fori_loop(0, repeats, body, x)

    out = loop(x0, *consts)  # compile + warmup
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    def run_once():
        nonlocal out
        out = loop(out, *consts)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    return best_sample(run_once, samples=samples) / repeats


# ---------------------------------------------------------------------------
# 1. full forward, Pallas vs XLA attention routing
# ---------------------------------------------------------------------------


def forwards():
    cfg = unet2d.SDXL
    params = jax.jit(lambda k: unet2d.init_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    lora = lnet.create_slider_network(
        jax.random.key(1), params, rank=4, alpha=1.0, train_method="noxattn"
    )
    # merged-weights path == what make_sampling_fn runs at scalar scale;
    # donate so only ONE 5.2 GB param copy lives in HBM alongside the
    # 1024px activations
    merged = jax.jit(
        lambda p, l: add_deltas(p, lora_deltas(l, jnp.asarray(1.0))),
        donate_argnums=(0,),
    )(params, lora)
    del params

    ks = jax.random.split(jax.random.key(2), 3)
    x0 = jax.random.normal(ks[0], (2, 128, 128, 4), jnp.bfloat16)
    ehs = jax.random.normal(ks[1], (2, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(ks[2], (2, 1280), jnp.bfloat16)
    tid = jnp.broadcast_to(
        jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32), (2, 6)
    )
    added = {"text_embeds": pooled, "time_ids": tid}
    t = jnp.full((2,), 500.0, jnp.float32)

    res = {}
    for label, impl in (("pallas_routing", "auto"), ("xla_attention", "xla")):
        attn_ops.set_default_attention_impl(impl)

        # fresh function object per impl: jit traces once per function and
        # the impl choice is baked in at trace time
        def fwd(x, p, e, a, _impl=impl):
            return unet2d.apply(p, cfg, x, t, e, added_cond=a)

        dt = time_loop(fwd, x0, (merged, ehs, added), repeats=10)
        res[label] = dt
        line(
            metric=f"xl1024_unet_forward_cfg2_{label}",
            value=round(dt * 1000, 2),
            unit="ms",
        )
    attn_ops.set_default_attention_impl("auto")
    return res


# ---------------------------------------------------------------------------
# 2. per-shape attention microbenches
# ---------------------------------------------------------------------------

SELF_SHAPES = [  # (B, H, L, d, count per forward)
    (2, 10, 4096, 64, 10),
    (2, 20, 1024, 64, 60),
]
CROSS_SHAPES = [  # (B, H, Lq, Lkv, d, count)
    (2, 10, 4096, 77, 64, 10),
    (2, 20, 1024, 77, 64, 60),
]


def micro_self():
    res = {}
    for B, H, L, d, count in SELF_SHAPES:
        ks = jax.random.split(jax.random.key(L), 3)
        q0 = jax.random.normal(ks[0], (B, H, L, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, L, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, L, d), jnp.bfloat16)
        picked = pa.pick_block_q(L, L, itemsize=2)
        impls = {
            f"pallas_bq{picked}": lambda q, k, v: pa.sd_attention(q, k, v),
            "xla": lambda q, k, v: attn_ops.xla_attention(q, k, v, None),
        }
        for bq in (512, 256, 128):
            if bq != picked and L % bq == 0:
                impls[f"pallas_bq{bq}"] = functools.partial(
                    lambda q, k, v, b: pa.sd_attention(q, k, v, block_q=b), b=bq
                )
        try:
            from sliders_tpu.ops import flash_attention as fa

            if fa.supports(q0.shape, k.shape):
                impls["stock_flash"] = lambda q, k, v: fa.flash_attention(q, k, v)
        except Exception:
            pass
        for label, fn in impls.items():
            def step(q, k, v, _fn=fn):
                return _fn(q, k, v).astype(q.dtype)

            dt = time_loop(step, q0, (k, v), repeats=50)
            res[(L, label)] = dt
            line(
                metric=f"xl1024_selfattn_L{L}_H{H}_d{d}_{label}",
                value=round(dt * 1e6, 1),
                unit="us",
                count_per_forward=count,
            )
    return res


def micro_cross():
    res = {}
    for B, H, Lq, Lkv, d, count in CROSS_SHAPES:
        ks = jax.random.split(jax.random.key(Lq + 7), 3)
        q0 = jax.random.normal(ks[0], (B, H, Lq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, Lkv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, Lkv, d), jnp.bfloat16)

        def step(q, k, v):
            return attn_ops.xla_attention(q, k, v, None).astype(q.dtype)

        dt = time_loop(step, q0, (k, v), repeats=50)
        res[Lq] = dt
        line(
            metric=f"xl1024_crossattn_Lq{Lq}_H{H}_d{d}_xla",
            value=round(dt * 1e6, 1),
            unit="us",
            count_per_forward=count,
        )
    return res


def main():
    line(note="xl1024 attribution", samples=bench.SAMPLES)
    self_res = micro_self()
    cross_res = micro_cross()
    fwd_res = forwards()

    # attribution join
    best_self = {
        L: min(v for (l, lab), v in self_res.items() if l == L)
        for L in (4096, 1024)
    }
    attn_pallas = sum(
        cnt
        * min(
            v
            for (l, lab), v in self_res.items()
            if l == L and lab.startswith("pallas")
        )
        for _, _, L, _, cnt in SELF_SHAPES
    )
    attn_xla = sum(
        cnt * self_res[(L, "xla")] for _, _, L, _, cnt in SELF_SHAPES
    )
    cross = sum(cnt * cross_res[Lq] for _, _, Lq, _, _, cnt in CROSS_SHAPES)
    fwd_p = fwd_res["pallas_routing"]
    fwd_x = fwd_res["xla_attention"]
    line(
        metric="xl1024_forward_breakdown",
        unit="ms",
        forward_pallas=round(fwd_p * 1000, 2),
        forward_all_xla=round(fwd_x * 1000, 2),
        selfattn_pallas_sum=round(attn_pallas * 1000, 2),
        selfattn_xla_sum=round(attn_xla * 1000, 2),
        crossattn_sum=round(cross * 1000, 2),
        residual_conv_mlp_norm=round((fwd_p - attn_pallas - cross) * 1000, 2),
        best_block_q={str(L): round(v * 1e6, 1) for L, v in best_self.items()},
    )


if __name__ == "__main__":
    main()
