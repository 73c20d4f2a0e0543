"""Sharded checkpointing (training/checkpoint.py) on the virtual 8-device
mesh: arrays are saved WITH their shardings and restored onto a different
mesh layout (elastic restart), and the driver resumes from an orbax
directory exactly like it resumes from msgpack.

The reference has no train-state checkpointing at all (SURVEY.md §5.4:
save-only LoRA weights, optimizer state dropped)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _sharded_state(mesh, spec_for):
    """Tiny SliderTrainState with lora leaves placed per spec_for(path)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding

    from sliders_tpu.training.text_slider import SliderTrainState

    lora = {
        "blk.attn1.to_q": {
            "down": jnp.arange(64.0).reshape(8, 8) / 64.0,
            "up": jnp.arange(128.0).reshape(8, 16) / 128.0,
            "alpha": jnp.asarray(1.0),
        },
        "blk.ff.net.0.proj": {
            "down": jnp.arange(32.0).reshape(4, 8) / 32.0,
            "up": jnp.ones((8, 4)),
            "alpha": jnp.asarray(4.0),
        },
    }
    lora = {
        m: {
            k: jax.device_put(v, NamedSharding(mesh, spec_for(m, k, v)))
            for k, v in e.items()
        }
        for m, e in lora.items()
    }
    opt = optax.adamw(1e-3)
    state = SliderTrainState.create(jax.random.key(3), lora, opt)
    return state.replace(step=jnp.asarray(5, jnp.int32))


def test_save_reshard_restore(tmp_path):
    """Save on a 4x2 dp*tp mesh with tp-sharded rows, restore onto an 8x1
    mesh with different specs: values byte-identical, placement follows the
    RESTORING run's mesh, PRNG key and step survive."""
    import jax
    from jax.sharding import PartitionSpec as P

    from sliders_tpu.parallel.mesh import make_mesh
    from sliders_tpu.training import checkpoint as ckpt

    mesh_a = make_mesh(dp=4, tp=2)

    def spec_a(m, k, v):
        return P("tp", None) if k == "down" and v.ndim == 2 and v.shape[0] % 2 == 0 else P()

    state = _sharded_state(mesh_a, spec_a)
    path = str(tmp_path / "st.orbax")
    ckpt.save_sharded(path, state)
    assert os.path.isdir(path)

    # target: fresh (zero-information) state on a different mesh layout
    mesh_b = make_mesh(dp=8, tp=1)

    def spec_b(m, k, v):
        return P(None, "dp") if k == "up" and v.shape[-1] % 8 == 0 else P()

    import jax.numpy as jnp

    template = _sharded_state(mesh_b, spec_b)
    template = template.replace(
        step=jnp.asarray(0, jnp.int32),
        lora=jax.tree.map(lambda x: x * 0, template.lora),
        key=jax.random.key(999),
    )
    restored = ckpt.restore_sharded(path, template)

    assert int(restored.step) == 5
    for m, e in state.lora.items():
        for k in e:
            np.testing.assert_array_equal(
                np.asarray(restored.lora[m][k]), np.asarray(state.lora[m][k])
            )
    # placement follows the template (the restoring run's mesh), not the save
    up = restored.lora["blk.attn1.to_q"]["up"]
    assert up.sharding.mesh.shape["dp"] == 8
    assert up.sharding.spec == spec_b("blk.attn1.to_q", "up", up)
    # PRNG key restored to the saved stream, not the template's
    assert float(jax.random.uniform(restored.key)) == float(
        jax.random.uniform(state.key)
    )


def test_driver_resumes_from_orbax_dir(run_env, tmp_path):
    """Mesh'd driver run checkpoints to an orbax dir; a fresh mesh'd run
    resumed from that dir finishes with the same LoRA as an uninterrupted
    run (the msgpack determinism guarantee, now for sharded state)."""
    import jax.numpy as jnp

    from sliders_tpu.models import loader
    from sliders_tpu.parallel.mesh import make_mesh
    from sliders_tpu.prompts import load_prompts_from_yaml
    from sliders_tpu.training.driver import train_text_sliders

    cfg, snapshot = run_env
    models = loader.load_sd(snapshot, dtype=jnp.float32)
    prompts = load_prompts_from_yaml(cfg.prompts_file)
    mesh = make_mesh(dp=8)

    cfg_a = cfg.model_copy(deep=True)
    cfg_a.save.path = str(tmp_path / "a")
    cfg_a.save.name = "full"
    full = train_text_sliders(cfg_a, prompts, models, seed=7, mesh=mesh)

    cfg_b = cfg.model_copy(deep=True)
    cfg_b.save.path = str(tmp_path / "b")
    cfg_b.save.name = "part"
    cfg_b.train.iterations = 3  # steps 0..2, checkpoints at step 2
    train_text_sliders(cfg_b, prompts, models, seed=7, mesh=mesh)
    ckpt_dir = str(tmp_path / "b" / "part_trainstate.orbax")
    assert os.path.isdir(ckpt_dir), "mesh run should write the orbax layout"

    cfg_c = cfg.model_copy(deep=True)
    cfg_c.save.path = str(tmp_path / "c")
    cfg_c.save.name = "resumed"
    resumed = train_text_sliders(
        cfg_c, prompts, models, seed=7, mesh=mesh, resume_from=ckpt_dir
    )

    for m in full:
        np.testing.assert_allclose(
            np.asarray(full[m]["up"]), np.asarray(resumed[m]["up"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(full[m]["down"]), np.asarray(resumed[m]["down"]), atol=1e-6
        )


@pytest.fixture(scope="module")
def run_env(tmp_path_factory):
    from helpers import make_tiny_snapshot

    from sliders_tpu.core.config import RootConfig

    snapshot = make_tiny_snapshot(str(tmp_path_factory.mktemp("sd_tiny")))
    out = tmp_path_factory.mktemp("out")
    prompts_file = out / "prompts.yaml"
    prompts_file.write_text(
        "- target: person\n  positive: old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 2\n"
        "  resolution: 64\n  batch_size: 1\n"
    )
    cfg = RootConfig(
        **{
            "prompts_file": str(prompts_file),
            "pretrained_model": {"name_or_path": snapshot},
            "network": {"rank": 2, "alpha": 1.0, "training_method": "noxattn"},
            "train": {
                "precision": "float32",
                "noise_scheduler": "ddim",
                "iterations": 6,
                "lr": 1e-3,
                "optimizer": "adamw",
                "lr_scheduler": "constant",
                "max_denoising_steps": 5,
            },
            "save": {"name": "tiny_slider", "path": str(out), "per_steps": 3},
            "logging": {"verbose": False, "log_every": 2},
            "tpu": {"remat": False, "donate": False, "state_checkpoint_every": 2},
        }
    )
    return cfg, snapshot
