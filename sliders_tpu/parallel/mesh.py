"""Device mesh + sharding rules.

The reference is strictly single-GPU (`torch.device(f"cuda:{args.device}")`,
train_lora.py:367; no torch.distributed anywhere — SURVEY.md §2). This module
is the TPU-native scaling layer it lacks: one `jax.sharding.Mesh` with a
``dp`` (data) axis and a ``tp`` (tensor/model) axis, plus opt-in ``sp``
(sequence, feeding ops.ring_attention past the single-chip sequence
ceiling) and ``pp`` (pipeline, feeding parallel.pipeline past the
single-chip HBM ceiling) axes. There is no ``ep`` axis because no model
in the reference's zoo (SD1/2, SDXL, FLUX) has MoE experts to shard.

Sharding strategy for slider training:
  - batch (initial latents / noise / per-sample timesteps) sharded on ``dp``;
  - UNet + text-encoder params replicated (frozen) — or, for SDXL at high
    resolution, attention/ff matmuls sharded on ``tp`` via the rules below;
  - LoRA params replicated; the jitted loss mean over the dp-sharded batch
    makes XLA insert the psum for LoRA grads automatically.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"
SEQ_AXIS = "sp"  # sequence-parallel axis for ops.ring_attention (opt-in)
PIPE_AXIS = "pp"  # pipeline axis for parallel.pipeline (opt-in)


def maybe_initialize_distributed() -> int:
    """Multi-host (DCN) process-group stub — SURVEY.md §5.8.

    When launched under a multi-process TPU runtime (GKE/JobSet or
    `gcloud ... tpu-vm ssh --worker=all`), the env exposes
    SLIDERS_NUM_PROCESSES (or the standard JAX coordination vars) and each
    process must join the cluster before any device op so `jax.devices()`
    returns the GLOBAL device list. Single-process runs (everything
    testable in this environment) are a no-op.

    Multi-host data paths ride DCN; everything this framework shards
    (dp batch, tp attention/ff) is laid out so collectives stay on ICI
    within a slice — the dp axis should span hosts only for pure
    gradient psum (LoRA grads are KB-sized, DCN-tolerable).

    Called by the training CLIs before any device op. Triggers on either
    the explicit SLIDERS_* vars or, when only the standard coordination
    var JAX_COORDINATOR_ADDRESS is present, defers to
    ``jax.distributed.initialize()``'s own cluster auto-detection
    (Cloud TPU / GKE / SLURM). Returns the process count (1 when
    single-process). Untestable beyond the single-process path in this
    environment (one real chip).
    """
    import os

    n = int(os.environ.get("SLIDERS_NUM_PROCESSES", "1"))
    if n > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("SLIDERS_COORDINATOR"),
            num_processes=n,
            process_id=int(os.environ.get("SLIDERS_PROCESS_ID", "0")),
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        n = jax.process_count()
    return n


def make_mesh(
    dp: int = -1, tp: int = 1, sp: int = 1, pp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, tp[, sp][, pp]) mesh. dp=-1 means all remaining devices.

    The ``sp`` (sequence-parallel) and ``pp`` (pipeline) axes are only
    materialized when > 1 — ``sp`` feeds ops.ring_attention for sequences
    past the single-chip ceiling, ``pp`` feeds parallel.pipeline for models
    past the single-chip HBM ceiling (full FLUX-dev); every
    reference-protocol shape fits one chip (SURVEY.md §5.7), so the default
    mesh stays 2-axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp == -1:
        if n % (tp * sp * pp) != 0:
            raise ValueError(
                f"{n} devices not divisible by tp*sp*pp={tp * sp * pp}"
            )
        dp = n // (tp * sp * pp)
    if dp * tp * sp * pp > n:
        raise ValueError(
            f"mesh {dp}x{tp}x{sp}x{pp} needs {dp * tp * sp * pp} devices, have {n}"
        )
    shape = [dp, tp]
    names = [DATA_AXIS, MODEL_AXIS]
    if sp > 1:
        shape.append(sp)
        names.append(SEQ_AXIS)
    if pp > 1:
        shape.append(pp)
        names.append(PIPE_AXIS)
    k = int(np.prod(shape))
    return Mesh(devices[:k].reshape(shape), tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in `tree` with its leading dim sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


# --- tensor-parallel param sharding rules (opt-in, for SDXL @ 1024px) -------
#
# Regex rules over the diffusers-style param paths (matched with re.search).
# Attention head projections and the transformer MLP are sharded on their
# output features (heads dim), the output projections on input features, so
# each attention / ff block needs a single psum on its output — the Megatron
# split, expressed purely through NamedSharding and left to XLA to turn into
# ICI collectives. Per-head ops between the shardings (SD softmax heads,
# FLUX RMS q/k norm + RoPE — both reduce only over the head dim) stay local.

_TP_RULES: list[tuple[str, tuple]] = [
    # attention qkv (SD + FLUX img stream): (in, out) -> shard out (heads*dh)
    (r"to_[qkv]\.weight$", (None, MODEL_AXIS)),
    (r"to_[qkv]\.bias$", (MODEL_AXIS,)),
    # FLUX double-block context-stream qkv
    (r"add_[qkv]_proj\.weight$", (None, MODEL_AXIS)),
    (r"add_[qkv]_proj\.bias$", (MODEL_AXIS,)),
    # attention out projections: shard in (bias replicated: added post-psum)
    (r"to_out\.0\.weight$", (MODEL_AXIS, None)),
    (r"to_add_out\.weight$", (MODEL_AXIS, None)),
    # SD GEGLU ff: proj (in, 2*hidden) sharded on out; down proj on in
    (r"ff\.net\.0\.proj\.weight$", (None, MODEL_AXIS)),
    (r"ff\.net\.0\.proj\.bias$", (MODEL_AXIS,)),
    (r"ff\.net\.2\.weight$", (MODEL_AXIS, None)),
    # FLUX MLPs (double-block ff/ff_context share the net.0/net.2 naming)
    (r"ff_context\.net\.0\.proj\.weight$", (None, MODEL_AXIS)),
    (r"ff_context\.net\.0\.proj\.bias$", (MODEL_AXIS,)),
    (r"ff_context\.net\.2\.weight$", (MODEL_AXIS, None)),
    # FLUX single blocks: fused mlp up-proj on out; the (5D, D) fused out
    # projection on in (its input concat[attn_out, mlp] is tp-sharded on
    # features, so the contraction stays local until the single psum).
    # Anchored under the block index so the model-level proj_out (final
    # patch de-embedding, models/flux.py:280) stays replicated.
    (r"single_transformer_blocks\.\d+\.proj_mlp\.weight$", (None, MODEL_AXIS)),
    (r"single_transformer_blocks\.\d+\.proj_mlp\.bias$", (MODEL_AXIS,)),
    (r"single_transformer_blocks\.\d+\.proj_out\.weight$", (MODEL_AXIS, None)),
]

_TP_RULES_COMPILED = None


def param_spec(path: str, tp_enabled: bool) -> P:
    """PartitionSpec for one param path under the tp rules."""
    global _TP_RULES_COMPILED
    if tp_enabled:
        if _TP_RULES_COMPILED is None:
            import re

            _TP_RULES_COMPILED = [(re.compile(pat), axes) for pat, axes in _TP_RULES]
        for pat, axes in _TP_RULES_COMPILED:
            if pat.search(path):
                return P(*axes)
    return P()


def shard_params(mesh: Mesh, params: dict, tp_enabled: bool = False) -> dict:
    """Apply param_spec over a nested param tree."""
    from sliders_tpu.utils import pytree

    flat = pytree.flatten(params)
    out = {}
    for path, leaf in flat.items():
        spec = param_spec(path, tp_enabled)
        # drop the rule if the array rank doesn't match (e.g. conv kernels)
        if len(spec) > getattr(leaf, "ndim", 0):
            spec = P()
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return pytree.unflatten(out)
