"""Device mesh + sharding rules.

The reference is strictly single-GPU (`torch.device(f"cuda:{args.device}")`,
train_lora.py:367; no torch.distributed anywhere — SURVEY.md §2). This module
is the TPU-native scaling layer it lacks: one `jax.sharding.Mesh` with a
``dp`` (data) axis and a ``tp`` (tensor/model) axis.

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


def make_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp == -1:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    mesh_devices = devices[: dp * tp].reshape(dp, tp)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


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
# Path-suffix rules over the diffusers-style param paths. Attention head
# projections and the transformer MLP are sharded on their output features
# (heads dim), the output projections on input features, so each attention /
# ff block needs a single psum on its output — the Megatron split, expressed
# purely through NamedSharding and left to XLA to turn into ICI collectives.

_TP_RULES: list[tuple[str, tuple]] = [
    # attention qkv: weight stored (in, out) -> shard out(features=heads*dh)
    ("to_q.weight", (None, MODEL_AXIS)),
    ("to_k.weight", (None, MODEL_AXIS)),
    ("to_v.weight", (None, MODEL_AXIS)),
    ("to_q.bias", (MODEL_AXIS,)),
    ("to_k.bias", (MODEL_AXIS,)),
    ("to_v.bias", (MODEL_AXIS,)),
    # attention out proj: shard in
    ("to_out.0.weight", (MODEL_AXIS, None)),
    # GEGLU ff: proj (in, 2*hidden) sharded on out; down proj on in
    ("ff.net.0.proj.weight", (None, MODEL_AXIS)),
    ("ff.net.0.proj.bias", (MODEL_AXIS,)),
    ("ff.net.2.weight", (MODEL_AXIS, None)),
]


def param_spec(path: str, tp_enabled: bool) -> P:
    """PartitionSpec for one param path under the tp rules."""
    if tp_enabled:
        for suffix, axes in _TP_RULES:
            if path.endswith(suffix):
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
