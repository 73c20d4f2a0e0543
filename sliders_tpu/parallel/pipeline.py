"""Pipeline parallelism (``pp`` mesh axis): GPipe microbatching over ICI.

The reference is strictly single-GPU (SURVEY.md §2 preamble: no
torch.distributed anywhere) and its largest backbone, FLUX-dev, simply
cannot run where this framework's other axes already go: the full 19+38
block MMDiT at bf16 is ~23 GB of params — bigger than one v5e chip's 16 GB
HBM (BASELINE.md round-2 FLUX note). ``pp`` is the TPU-native capacity
axis that fixes that: block-stack params are sharded BY LAYER over the
``pp`` mesh axis (each chip holds only n_layers/pp blocks), and
activations flow stage-to-stage over the ICI ring via ``lax.ppermute``
while GPipe microbatches keep every stage busy.

Mechanism (classic GPipe schedule, expressed the JAX way — one program on
every device under ``shard_map``, stage identity = ``lax.axis_index``):

  - stack the per-layer param trees on a leading layer axis, reshape to
    (pp, layers_per_stage, ...), shard dim 0 over ``pp``;
  - split the batch into M microbatches;
  - run M + pp − 1 ticks in a ``lax.scan``: each tick every stage applies
    its local layers to its current microbatch, then ``ppermute``s the
    result to the next stage. Stage 0 injects microbatch t; the last
    stage deposits finished microbatches. Bubble fraction is the textbook
    (pp−1)/(M+pp−1);
  - one ``psum`` over ``pp`` at the end replicates the finished outputs
    (the surrounding jit consumes them replicated).

Everything is differentiable (``ppermute`` transposes to the reverse
rotation, the scan to its reverse), so the same engine serves training;
parameter gradients land sharded exactly like the params. LoRA slider
weights ride along as a second stacked tree with relative in-block names,
so slider inference/training composes with pp (the per-layer dict-name
lookup the non-pp path uses cannot cross a traced stage index).

Parity vs the sequential forward is pinned in tests/test_pipeline.py on
the 8-virtual-device CPU mesh (fwd + LoRA grads), and the driver dryrun
(__graft_entry__.dryrun_multichip) asserts it on every run.

Scope note: only FLUX gets a pp wiring. The SD/SDXL UNet is a poor
pipeline target by construction — its down→up skip connections would
have to be carried across every stage boundary (each up block consumes a
residual produced ~half the network earlier), its blocks are heterogeneous
(stacking requires one pytree structure), and every SD/SDXL config fits a
single chip anyway (BASELINE.md); dp/tp cover it. FLUX is the one model
family that both needs pp (23 GB bf16 params) and is shaped for it
(uniform residual block stacks).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from sliders_tpu.ops.basic import SliderLora
from sliders_tpu.parallel.mesh import PIPE_AXIS


def stack_layer_params(blocks: dict, n_layers: int):
    """{'0': tree, ..., 'n-1': tree} -> one tree with leading (n_layers,) dim.

    All layers must share a pytree structure (true for both FLUX block
    families and any uniform transformer stack)."""
    layers = [blocks[str(i)] for i in range(n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stack_layer_lora(
    weights: dict, prefix: str, n_layers: int, rel_prefix: str = "blk"
) -> Optional[dict]:
    """Stack per-layer LoRA entries for one block family.

    ``weights`` is the absolute-name dict ({'transformer_blocks.3.attn.to_q':
    {down, up, alpha}, ...} — lora/network.py naming); returns
    {f'{rel_prefix}.<rel>': stacked entry} with each leaf gaining a leading
    (n_layers,) dim, or None when no key matches ``prefix``. Every matched
    relative name must exist in EVERY layer (uniform targeting — true for
    all reference training methods, which filter by module kind, not layer
    index); raises ValueError otherwise because a traced stage index cannot
    select between per-layer dict shapes.
    """
    per_rel: dict[str, list] = {}
    for key, entry in weights.items():
        if not key.startswith(prefix + "."):
            continue
        rest = key[len(prefix) + 1:]
        idx_str, rel = rest.split(".", 1)
        per_rel.setdefault(rel, [None] * n_layers)[int(idx_str)] = entry
    if not per_rel:
        return None
    out = {}
    for rel, entries in per_rel.items():
        missing = [i for i, e in enumerate(entries) if e is None]
        if missing:
            raise ValueError(
                f"pipeline LoRA needs uniform targeting: {prefix}.*.{rel} "
                f"missing in layers {missing}"
            )
        out[f"{rel_prefix}.{rel}"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *entries
        )
    return out


def pad_stack_to_stages(stacked, n_stages: int):
    """Zero-pad a stacked layer tree to a multiple of n_stages.

    FLUX-dev has 19 double blocks — a prime, so even pp stages would only
    allow pp ∈ {1, 19}. Both FLUX block kinds use adaLN-zero gating: the
    residual update is `x + gate * f(x)` with every gate produced by the
    block's own modulation linear (models/flux.py _double_block /
    _single_block), so an ALL-ZERO block is an exact identity (zero
    modulation weight+bias -> all gates zero -> pure residual). Padding
    with zero blocks therefore changes nothing numerically; it wastes
    pad/n_padded of the stack's compute (1/20 for 19 -> pp=4)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    pad = (-n) % n_stages
    if pad == 0:
        return stacked
    return jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
        ),
        stacked,
    )


def split_microbatches(tree, num_microbatches: int):
    """Leading batch dim B -> (M, B // M) on every leaf."""
    def f(a):
        b = a.shape[0]
        if b % num_microbatches:
            raise ValueError(
                f"batch {b} not divisible by num_microbatches={num_microbatches}"
            )
        return a.reshape((num_microbatches, b // num_microbatches) + a.shape[1:])
    return jax.tree.map(f, tree)


def merge_microbatches(tree):
    return jax.tree.map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), tree
    )


def pipeline_blocks(
    block_fn: Callable[[Any, Any, Any, Optional[SliderLora]], Any],
    stacked_params,
    microbatches,
    mesh: Mesh,
    *,
    axis: str = PIPE_AXIS,
    stacked_lora: Optional[dict] = None,
    multiplier=None,
    consts=None,
    batch_axis: Optional[str] = None,
    remat: bool = False,
):
    """Run a uniform block stack over the pp axis with GPipe microbatching.

    block_fn(layer_params, state, consts, lora) -> state — ONE layer.
    stacked_params: pytree with leading (n_layers, ...) leaves.
    microbatches: pytree with leading (M, microbatch, ...) leaves
    (split_microbatches); returned with the same layout.
    stacked_lora/multiplier: optional stack_layer_lora output + traced
    slider scale (scalar only — per-sample multipliers would have to be
    microbatch-sliced; no pp caller needs them).
    batch_axis: optionally also shard the per-microbatch batch dim (dim 1)
    over a data axis of the same mesh — dp and pp compose in one shard_map
    (each dp row pipelines its own batch shard; no cross-dp collectives).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis (axes: {mesh.axis_names})")
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        raise ValueError(
            f"mesh has no {batch_axis!r} axis (axes: {mesh.axis_names})"
        )
    n_stages = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by pp={n_stages}")
    lps = n_layers // n_stages
    num_mb = jax.tree.leaves(microbatches)[0].shape[0]
    if multiplier is not None and jnp.ndim(multiplier) > 0:
        raise ValueError("pipeline LoRA multiplier must be a scalar")

    def to_stages(a):
        return a.reshape((n_stages, lps) + a.shape[1:])

    staged_params = jax.tree.map(to_stages, stacked_params)
    staged_lora = (
        jax.tree.map(to_stages, stacked_lora) if stacked_lora is not None else {}
    )
    mult = jnp.asarray(0.0 if multiplier is None else multiplier, jnp.float32)
    consts = {} if consts is None else consts
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def local(params, lora_w, mult, consts, mbs):
        params = jax.tree.map(lambda a: a[0], params)  # (lps, ...)
        lora_w = jax.tree.map(lambda a: a[0], lora_w)
        stage = lax.axis_index(axis)

        def run_stage(state):
            for j in range(lps):
                pl = jax.tree.map(lambda a: a[j], params)
                lora = None
                if lora_w:
                    lw = {
                        name: jax.tree.map(lambda a: a[j], entry)
                        for name, entry in lora_w.items()
                    }
                    lora = SliderLora(weights=lw, multiplier=mult)
                state = block_fn(pl, state, consts, lora)
            return state

        # the scan carry must be marked pp-varying up front (its per-tick
        # values differ by stage), or the vma check rejects the loop.
        # (batch_axis variance is already inherited from the dp-sharded
        # microbatches; pcast rejects axes that are already varying)
        def vary(a):
            return lax.pcast(a, (axis,), to="varying")

        zeros_state = jax.tree.map(lambda a: vary(jnp.zeros_like(a[0])), mbs)
        outputs = jax.tree.map(lambda a: vary(jnp.zeros_like(a)), mbs)
        # stage s -> s+1 only; stage 0's input comes from injection, so no
        # wrap-around (devices with no inbound edge receive zeros)
        perm = [(j, j + 1) for j in range(n_stages - 1)]

        def tick(carry, t):
            state, outputs = carry
            mb_idx = jnp.clip(t, 0, num_mb - 1)
            inject = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False),
                mbs,
            )
            x = jax.tree.map(
                lambda i, s: jnp.where(stage == 0, i, s), inject, state
            )
            y = run_stage(x)
            out_t = t - (n_stages - 1)
            valid = (out_t >= 0) & (stage == n_stages - 1)
            out_idx = jnp.clip(out_t, 0, num_mb - 1)

            def deposit(buf, val):
                cur = lax.dynamic_index_in_dim(buf, out_idx, 0, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, cur), out_idx, 0
                )

            outputs = jax.tree.map(deposit, outputs, y)
            if perm:
                y = jax.tree.map(lambda a: lax.ppermute(a, axis, perm), y)
            return (y, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (zeros_state, outputs), jnp.arange(num_mb + n_stages - 1)
        )
        # replicate the finished microbatches from the last stage to all
        return jax.tree.map(
            lambda o: lax.psum(
                jnp.where(stage == n_stages - 1, o, jnp.zeros_like(o)), axis
            ),
            outputs,
        )

    mb_spec = P() if batch_axis is None else P(None, batch_axis)
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), mb_spec),
        out_specs=mb_spec,
    )
    return f(staged_params, staged_lora, mult, consts, microbatches)


# ---------------------------------------------------------------------------
# FLUX over pp: the capacity path for the full 19+38-block MMDiT
# ---------------------------------------------------------------------------


def flux_apply_pp(
    params: dict,
    cfg,
    packed_latents: jax.Array,  # (B, L_img, in_channels)
    timestep: jax.Array,  # (B,) in [0, 1]
    pooled: jax.Array,
    encoder_hidden_states: jax.Array,
    txt_ids_arr: jax.Array,
    img_ids_arr: jax.Array,
    mesh: Mesh,
    guidance: Optional[jax.Array] = None,
    lora: Optional[SliderLora] = None,
    axis: str = PIPE_AXIS,
    num_microbatches: int = 1,
    batch_axis: Optional[str] = None,
    remat: bool = False,
) -> jax.Array:
    """models/flux.apply with both block stacks pipeline-parallel over pp.

    Numerically identical to the sequential apply (tests/test_pipeline.py);
    params must be passed with transformer_blocks/single_transformer_blocks
    stacked-and-sharded via flux_pp_params (each chip stores only its
    stage's blocks — how full FLUX-dev fits a v5e-8)."""
    from sliders_tpu.models import flux

    img, txt, temb = flux.embed_inputs(
        params, cfg, packed_latents, timestep, pooled, encoder_hidden_states,
        guidance,
    )
    ids = jnp.concatenate([txt_ids_arr, img_ids_arr], axis=0)
    cos, sin = flux.rope_tables(ids, cfg)
    consts = {"cos": cos, "sin": sin}

    n_stages = mesh.shape[axis]
    stacked_d = params["transformer_blocks"]
    stacked_s = params["single_transformer_blocks"]
    if isinstance(stacked_d, dict) and "0" in stacked_d:  # unstacked tree
        stacked_d = stack_layer_params(stacked_d, cfg.num_layers)
        stacked_s = stack_layer_params(stacked_s, cfg.num_single_layers)
    # identity (zero-block) padding to a stage multiple — see pad_stack_to_stages
    stacked_d = pad_stack_to_stages(stacked_d, n_stages)
    stacked_s = pad_stack_to_stages(stacked_s, n_stages)
    lora_d = lora_s = None
    mult = None
    if lora is not None:
        mult = lora.multiplier
        lora_d = stack_layer_lora(lora.weights, "transformer_blocks", cfg.num_layers)
        lora_s = stack_layer_lora(
            lora.weights, "single_transformer_blocks", cfg.num_single_layers
        )
        # zero LoRA entries on the padded identity layers (down=0 -> no-op)
        if lora_d is not None:
            lora_d = pad_stack_to_stages(lora_d, n_stages)
        if lora_s is not None:
            lora_s = pad_stack_to_stages(lora_s, n_stages)

    def double_fn(pl, state, consts, lora):
        img, txt = flux._double_block(
            pl, state["img"], state["txt"], state["temb"],
            consts["cos"], consts["sin"], cfg, lora, "blk",
        )
        return {"img": img, "txt": txt, "temb": state["temb"]}

    # temb rides the microbatch state so each stage modulates its CURRENT
    # microbatch (a stage can't know which mb it holds from consts alone),
    # but it is invariant through every block — so the original embed-time
    # temb serves the single-stack input and final_layer below, and XLA
    # DCEs the unused temb deposit/psum chains.
    mb_temb = split_microbatches({"t": temb}, num_microbatches)["t"]
    mbs = split_microbatches({"img": img, "txt": txt}, num_microbatches)
    mbs["temb"] = mb_temb
    out = pipeline_blocks(
        double_fn, stacked_d, mbs, mesh, axis=axis,
        stacked_lora=lora_d, multiplier=mult, consts=consts,
        batch_axis=batch_axis, remat=remat,
    )

    def single_fn(pl, state, consts, lora):
        x = flux._single_block(
            pl, state["x"], state["temb"], consts["cos"], consts["sin"],
            cfg, lora, "blk",
        )
        return {"x": x, "temb": state["temb"]}

    x_mb = {
        "x": jnp.concatenate([out["txt"], out["img"]], axis=2),
        "temb": mb_temb,
    }
    out_s = pipeline_blocks(
        single_fn, stacked_s, x_mb, mesh, axis=axis,
        stacked_lora=lora_s, multiplier=mult, consts=consts,
        batch_axis=batch_axis, remat=remat,
    )
    img_out = merge_microbatches({"x": out_s["x"]})["x"][:, txt.shape[1]:]
    return flux.final_layer(params, img_out, temb)


def flux_pp_params(mesh: Mesh, params: dict, cfg, axis: str = PIPE_AXIS) -> dict:
    """Stack the two block families and shard them by layer over pp; the
    small non-block params (embedders, norm_out, proj_out) replicate.

    This is the placement that makes pp a CAPACITY axis: per chip only
    (padded n_layers)/pp of each stack is resident. Each stacked leaf is
    built DIRECTLY into its shards with jax.make_array_from_callback — no
    device ever materializes a whole family stack (FLUX-dev's double stack
    alone is ~half the 23 GB that motivates pp). For the full model, load
    the source params to host (numpy — models/convert.py reads safetensors
    that way) so the only device-resident copies are the shards themselves;
    identity padding per pad_stack_to_stages (19 double blocks are prime).
    """
    import numpy as np

    from jax.sharding import NamedSharding

    from sliders_tpu.utils import pytree

    n_stages = mesh.shape[axis]
    out = dict(params)
    for fam, n in (
        ("transformer_blocks", cfg.num_layers),
        ("single_transformer_blocks", cfg.num_single_layers),
    ):
        blocks = params[fam]
        flats = [pytree.flatten(blocks[str(i)]) for i in range(n)]
        n_pad = -(-n // n_stages) * n_stages
        sh = NamedSharding(mesh, P(axis))
        stacked_flat = {}
        for path, leaf0 in flats[0].items():
            shape = (n_pad,) + tuple(leaf0.shape)
            dtype = np.asarray(leaf0).dtype if not hasattr(leaf0, "dtype") else leaf0.dtype

            def cb(index, _path=path, _shape=shape, _dtype=dtype):
                sl = index[0]
                start = sl.start or 0
                stop = _shape[0] if sl.stop is None else sl.stop
                rows = [
                    np.asarray(flats[i][_path]) if i < n
                    else np.zeros(_shape[1:], _dtype)
                    for i in range(start, stop)
                ]
                return np.stack(rows)

            stacked_flat[path] = jax.make_array_from_callback(shape, sh, cb)
        out[fam] = pytree.unflatten(stacked_flat)
    rep = NamedSharding(mesh, P())
    for k, v in out.items():
        if k not in ("transformer_blocks", "single_transformer_blocks"):
            out[k] = jax.tree.map(lambda a: jax.device_put(a, rep), v)
    return out
