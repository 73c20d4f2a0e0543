"""Sharded train-state checkpointing over a device mesh.

The reference saves LoRA weights only and cannot resume at all
(trainscripts/textsliders/lora.py:231-248, train_lora.py:311-328 — the
optimizer state is dropped on the floor). driver.py already goes further
with a single-host msgpack train state (gathered to host, byte-identical
resume). This module is the multi-chip production path on top of that:
orbax/tensorstore writes every array together with its sharding, so

  - on a multi-host pod each process writes only its local shards — no
    host gather, no O(model) traffic to process 0;
  - restore places shards directly onto the *target* state's mesh, which
    may differ from the save-time mesh (elastic restart: checkpoint a dp=8
    run, resume it on dp=4 or on a single chip, or vice versa).

Single-process CPU meshes exercise exactly the same code path, which is
how tests/test_checkpoint_sharded.py pins the reshard-on-restore claim on
the virtual 8-device mesh.

The state's typed PRNG key is stored as raw key data (same convention as
driver._state_bytes / _state_from_bytes).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _strip_key(state):
    """Typed PRNG keys are not serializable; carry the raw key data."""
    return state.replace(key=jax.random.key_data(state.key))


def save_sharded(directory: str, state) -> None:
    """Write the train state under ``directory`` as a step-named checkpoint.

    Crash-safe overwriting: each save lands in ``directory/<step>/`` via
    orbax's tmp-dir+rename commit, and the PREVIOUS step is pruned only
    after the new one is committed (max_to_keep=2) — a preemption mid-save
    never destroys the last good resume state. Every leaf is saved with its
    sharding; call this from all processes of a multi-host run (orbax
    coordinates the barrier internally).
    """
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=2),
    )
    try:
        mgr.save(
            int(state.step), args=ocp.args.StandardSave(_strip_key(state)), force=True
        )
        mgr.wait_until_finished()
    finally:
        mgr.close()


def restore_sharded(directory: str, template):
    """Restore the latest step saved under ``directory`` onto ``template``'s
    mesh.

    ``template`` is a concrete state with the *target* placement (typically
    a freshly created SliderTrainState whose lora/opt trees were sharded for
    the resuming run's mesh) — its shapes/dtypes must match the checkpoint,
    its shardings need not: orbax reshards each array on read.
    """
    import orbax.checkpoint as ocp

    tmpl = _strip_key(template)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.asarray(x).dtype, sharding=getattr(x, "sharding", None)
        ),
        tmpl,
    )
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    try:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {directory}")
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    finally:
        mgr.close()
    return restored.replace(
        key=jax.random.wrap_key_data(jnp.asarray(restored.key))
    )
