"""Fleet training (training/fleet.py): K sliders in one jitted step.

The contracts under test:
  - row r of a fleet run reproduces a solo make_text_slider_step run
    keyed fold_in(fleet_key, r) (same pairs, sampler, optimizer): identical
    sampled t_to/pair draws and float-identical trajectories up to XLA's
    batch-shape-dependent reduction tiling amplified by adam's m/sqrt(v)
    (measured <=1.8e-6 after two full optimizer steps; gated at 1e-5);
  - rows are exactly isolated (changing row 1's data cannot move row 0's
    weights by a single bit);
  - helper round-trips, pair-count padding, and the documented
    sampler/optimizer rejections.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sliders_tpu.diffusion import make_sampler, make_schedule
from sliders_tpu.lora import network as lnet
from sliders_tpu.models import unet2d
from sliders_tpu.training import optimizers as opt_factory
from sliders_tpu.training.fleet import (
    fleet_size,
    make_fleet_text_step,
    stack_fleet,
    stack_fleet_pairs,
    unstack_fleet,
)
from sliders_tpu.training.text_slider import (
    SliderTrainState,
    make_text_slider_step,
    stack_prompt_pairs,
)


def _make_pairs(key, n_pairs=2, L=7, D=32, gs=4.0):
    ks = jax.random.split(key, 4 * n_pairs)
    pairs = []
    for i in range(n_pairs):
        pairs.append(
            {
                "target": jax.random.normal(ks[4 * i], (L, D)),
                "positive": jax.random.normal(ks[4 * i + 1], (L, D)),
                "neutral": jax.random.normal(ks[4 * i + 2], (L, D)),
                "unconditional": jax.random.normal(ks[4 * i + 3], (L, D)),
                "guidance_signed": jnp.asarray(gs),
            }
        )
    return stack_prompt_pairs(pairs)


def _make_loras(unet_params, k, fleet_key):
    return [
        lnet.create_slider_network(
            jax.random.fold_in(fleet_key, r), unet_params, rank=4, alpha=1.0,
            train_method="noxattn",
        )
        for r in range(k)
    ]


# ---------------------------------------------------------------------------
# helpers (fast tier)
# ---------------------------------------------------------------------------


def test_stack_unstack_roundtrip():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    loras = _make_loras(params, 3, jax.random.key(1))
    fleet = stack_fleet(loras)
    assert fleet_size(fleet) == 3
    # no `rank` leaf: ops/basic must use the static down.shape[-1]
    assert set(next(iter(fleet.values()))) == {"down", "up", "alpha"}
    back = unstack_fleet(fleet)
    for a, b in zip(loras, back):
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def test_stack_fleet_rejects_mixed_ranks():
    params = unet2d.init_params(jax.random.key(0), unet2d.TINY)
    a = lnet.create_slider_network(jax.random.key(1), params, rank=2)
    b = lnet.create_slider_network(jax.random.key(2), params, rank=4)
    with pytest.raises(ValueError, match="one rank"):
        stack_fleet([a, b])


def test_stack_fleet_pairs_pads_and_bounds():
    p1 = _make_pairs(jax.random.key(0), n_pairs=1)
    p2 = _make_pairs(jax.random.key(1), n_pairs=3)
    stacked = stack_fleet_pairs([p1, p2])
    assert stacked["target"].shape[:2] == (2, 3)
    np.testing.assert_array_equal(stacked["n_pairs"], [1, 3])
    # padded rows replicate the last real pair (never sampled: randint
    # bound is n_pairs[r])
    np.testing.assert_array_equal(stacked["target"][0, 2], stacked["target"][0, 0])


def test_stratified_t_to_marginal_and_spread():
    """stratified t_to: each row's marginal is exactly Uniform{1..T-1}
    (chi-square over 20k steps), within-step spread is bounded by the
    stratum width, and the empirical E[max_K] sits near the analytic
    (T-1)/S*((S-1)/2 + K/(K+1)) + 1 — well below per_row's (T-1)*K/(K+1)."""
    from sliders_tpu.training.fleet import draw_fleet_t_to

    K, T, S, N = 4, 50, 8, 20000
    fleet_key = jax.random.key(7)
    rows = jnp.arange(K)

    def one_step(step):
        keys = jax.vmap(
            lambda r: jax.random.fold_in(jax.random.fold_in(fleet_key, r), step)
        )(rows)
        k_t = jax.vmap(lambda k: jax.random.split(k, 5))(keys)[:, 1]
        return (
            draw_fleet_t_to(fleet_key, step, k_t, T, mode="stratified", strata=S),
            draw_fleet_t_to(fleet_key, step, k_t, T, mode="per_row"),
        )

    strat, per_row = jax.jit(jax.vmap(one_step))(jnp.arange(N))
    strat, per_row = np.asarray(strat), np.asarray(per_row)  # (N, K)

    assert strat.min() >= 1 and strat.max() <= T - 1
    R = T - 1
    # per-row marginal uniform over {1..49}: chi-square, dof=48,
    # p=0.999 critical value ~ 83.7 -> gate loosely at 90
    for r in range(K):
        counts = np.bincount(strat[:, r], minlength=T)[1:T]
        expected = N / R
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        assert chi2 < 90, (r, chi2)

    # within-step spread bounded by stratum width (+1 for the floor seam)
    spread = strat.max(axis=1) - strat.min(axis=1)
    assert spread.max() <= int(np.ceil(R / S)) + 1

    # loop-length economics: E[max] near analytic, far below per_row's
    e_max_strat = strat.max(axis=1).mean()
    e_max_perrow = per_row.max(axis=1).mean()
    analytic = R / S * ((S - 1) / 2 + K / (K + 1)) + 1
    assert abs(e_max_strat - analytic) < 1.0, (e_max_strat, analytic)
    assert e_max_strat < 0.75 * e_max_perrow  # ~27.3 vs ~40.2


def test_fleet_t_to_mode_validation():
    schedule = make_schedule()
    lr = opt_factory.make_lr_schedule("constant", 1e-4, 10)
    opt = opt_factory.make_optimizer("adamw", lr)
    kw = dict(n_sliders=2)
    with pytest.raises(ValueError, match="conflicts"):
        make_fleet_text_step(
            unet2d.TINY, schedule, make_sampler(schedule, "ddim", 10), opt,
            shared_t_to=True, t_to_mode="stratified", **kw,
        )
    with pytest.raises(ValueError, match="t_to_mode"):
        make_fleet_text_step(
            unet2d.TINY, schedule, make_sampler(schedule, "ddim", 10), opt,
            t_to_mode="bogus", **kw,
        )
    with pytest.raises(ValueError, match="t_to_strata"):
        make_fleet_text_step(
            unet2d.TINY, schedule, make_sampler(schedule, "ddim", 10), opt,
            t_to_mode="stratified", t_to_strata=0, **kw,
        )


def test_generate_cli_fleet_arg_guards(tmp_path):
    """--fleet arg validation fires BEFORE model load: duplicate basenames
    (folder-collision) and per-checkpoint scale-sweep disagreement without
    an explicit --scales both SystemExit fast."""
    from sliders_tpu.cli.generate_images import build_parser, main

    common = ["--base", "/nonexistent", "--prompts_path", "/nonexistent.csv",
              "--save_path", str(tmp_path)]
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    for d in (d1, d2):
        (d / "ageslider_last.pt").write_bytes(b"")
    args = build_parser().parse_args(
        common + ["--fleet", str(d1 / "ageslider_last.pt"),
                  "--fleet", str(d2 / "ageslider_last.pt")]
    )
    with pytest.raises(SystemExit, match="share basename"):
        main(args)

    # hspace slider (+-5 sweep) mixed with a normal one (default sweep)
    hs = tmp_path / "thing_hspace_last.pt"
    norm = tmp_path / "otherslider_last.pt"
    hs.write_bytes(b""); norm.write_bytes(b"")
    args = build_parser().parse_args(
        common + ["--fleet", str(hs), "--fleet", str(norm)]
    )
    with pytest.raises(SystemExit, match="different scale sweeps"):
        main(args)


def test_fleet_rejects_global_optimizers():
    schedule = make_schedule()
    lr = opt_factory.make_lr_schedule("constant", 1e-4, 10)
    opt = opt_factory.make_optimizer("adamw", lr)
    with pytest.raises(NotImplementedError, match="couple fleet rows"):
        make_fleet_text_step(
            unet2d.TINY, schedule, make_sampler(schedule, "ddim", 10), opt,
            n_sliders=2, optimizer_name="prodigy",
        )


# ---------------------------------------------------------------------------
# jitted-step contracts (slow tier)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    cfg = unet2d.TINY
    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)
    lr_sched = opt_factory.make_lr_schedule("constant", 2e-4, 100)
    fleet_key = jax.random.key(2)
    loras = _make_loras(unet_params, 2, jax.random.key(1))
    pair_sets = [
        _make_pairs(jax.random.key(10), n_pairs=2, gs=4.0),
        _make_pairs(jax.random.key(11), n_pairs=3, gs=-2.0),
    ]

    def mk_opt(tree):
        return opt_factory.make_optimizer(
            "adamw", lr_sched, trainable_mask=lnet.trainable_mask(tree)
        )

    return cfg, unet_params, fleet_key, loras, pair_sets, mk_opt


def _run_fleet(cfg, unet_params, fleet_key, loras, pair_sets, mk_opt, steps=2,
               mesh=None):
    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    step = make_fleet_text_step(
        cfg, make_schedule(), make_sampler(make_schedule(), "ddim", 10),
        optimizer, n_sliders=len(loras), max_denoising_steps=10,
        resolution=128, batch_size=1, compute_dtype=jnp.float32, remat=False,
        donate=False, mesh=mesh,
    )
    state = SliderTrainState.create(fleet_key, fleet, optimizer)
    ms = []
    for _ in range(steps):
        state, m = step(state, unet_params, stack_fleet_pairs(pair_sets))
        ms.append(m)
    return state, ms


@pytest.mark.slow
def test_fleet_rows_match_solo_runs(setup):
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", num_steps=10)

    fleet_state, fleet_ms = _run_fleet(
        cfg, unet_params, fleet_key, loras, pair_sets, mk_opt, steps=2
    )
    solo_final = unstack_fleet(jax.device_get(fleet_state.lora))

    for r in range(2):
        optimizer = mk_opt(loras[r])
        solo_step = make_text_slider_step(
            cfg, schedule, sampler, optimizer, max_denoising_steps=10,
            resolution=128, batch_size=1, compute_dtype=jnp.float32,
            remat=False, donate=False,
        )
        state = SliderTrainState.create(
            jax.random.fold_in(fleet_key, r), loras[r], optimizer
        )
        for i in range(2):
            state, m = solo_step(state, unet_params, pair_sets[r])
            assert int(m["t_to"]) == int(fleet_ms[i]["t_to"][r])
            assert int(m["pair"]) == int(fleet_ms[i]["pair"][r])
            np.testing.assert_allclose(
                float(m["loss"]), float(fleet_ms[i]["loss"][r]), rtol=1e-5
            )
        for name, solo_w in jax.device_get(state.lora).items():
            for leaf in ("down", "up", "alpha"):
                # a few-ULP grad gap is expected (the fleet batches 2K/3K/K
                # rows where solo batches 2/3/1 -> different XLA reduction
                # tiling) and adam's m/sqrt(v) normalization amplifies it at
                # early steps: measured <=1.8e-6 over 2 steps. Past 1e-5
                # would be a real semantic divergence.
                np.testing.assert_allclose(
                    solo_final[r][name][leaf], solo_w[leaf], rtol=0, atol=1e-5,
                    err_msg=f"row {r} {name}.{leaf} diverged from solo run",
                )


@pytest.mark.slow
def test_fleet_lms_k4_rows_match_solo_runs():
    """LMS fleet parity at the adversarial size K*B == LMS_ORDER == 4.

    Regression for a freeze-mask bug: freeze_rows used to tell the
    row-major latent carry apart from the history-major (ORDER, KB, ...)
    LMS derivs carry by shape sniffing, so at KB == 4 the derivs leaf was
    misclassified and the per-row freeze landed on the history axis,
    corrupting every row's LMS history (K=2 matched, K=4 diverged)."""
    cfg = unet2d.TINY
    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "lms", num_steps=10)
    lr_sched = opt_factory.make_lr_schedule("constant", 1e-4, 100)
    fleet_key = jax.random.key(3)
    K = 4
    loras = _make_loras(unet_params, K, jax.random.key(5))
    pair_sets = [
        _make_pairs(jax.random.key(20 + r), n_pairs=2, gs=4.0 - 2.0 * r)
        for r in range(K)
    ]

    def mk_opt(tree):
        return opt_factory.make_optimizer(
            "adamw", lr_sched, trainable_mask=lnet.trainable_mask(tree)
        )

    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    kw = dict(
        max_denoising_steps=10, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    step = make_fleet_text_step(
        cfg, schedule, sampler, optimizer, n_sliders=K, **kw
    )
    state = SliderTrainState.create(fleet_key, fleet, optimizer)
    fleet_ms = []
    for _ in range(2):
        state, m = step(state, unet_params, stack_fleet_pairs(pair_sets))
        fleet_ms.append(m)

    for r in range(K):
        solo_opt = mk_opt(loras[r])
        solo_step = make_text_slider_step(
            cfg, schedule, sampler, solo_opt, **kw
        )
        solo_state = SliderTrainState.create(
            jax.random.fold_in(fleet_key, r), loras[r], solo_opt
        )
        for i in range(2):
            solo_state, m = solo_step(solo_state, unet_params, pair_sets[r])
            assert int(m["t_to"]) == int(fleet_ms[i]["t_to"][r])
            np.testing.assert_allclose(
                float(m["loss"]), float(fleet_ms[i]["loss"][r]), rtol=1e-5,
                err_msg=f"row {r} step {i} lms loss diverged from solo",
            )


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["ddpm", "euler_a"])
def test_fleet_ancestral_rows_match_solo_runs(kind):
    """Ancestral samplers in the fleet: row r reproduces the solo run's
    per-step noise stream exactly (the vmapped fold_in(k_anc, i) draws
    passed through Sampler.step's noise override)."""
    cfg = unet2d.TINY
    unet_params = unet2d.init_params(jax.random.key(0), cfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, kind, num_steps=10)
    lr_sched = opt_factory.make_lr_schedule("constant", 1e-4, 100)
    fleet_key = jax.random.key(9)
    K = 2
    loras = _make_loras(unet_params, K, jax.random.key(6))
    pair_sets = [
        _make_pairs(jax.random.key(40 + r), n_pairs=2, gs=3.0) for r in range(K)
    ]

    def mk_opt(tree):
        return opt_factory.make_optimizer(
            "adamw", lr_sched, trainable_mask=lnet.trainable_mask(tree)
        )

    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    kw = dict(
        max_denoising_steps=10, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    step = make_fleet_text_step(
        cfg, schedule, sampler, optimizer, n_sliders=K, **kw
    )
    state = SliderTrainState.create(fleet_key, fleet, optimizer)
    state, m = step(state, unet_params, stack_fleet_pairs(pair_sets))

    for r in range(K):
        solo_opt = mk_opt(loras[r])
        solo_step = make_text_slider_step(cfg, schedule, sampler, solo_opt, **kw)
        solo_state = SliderTrainState.create(
            jax.random.fold_in(fleet_key, r), loras[r], solo_opt
        )
        solo_state, sm = solo_step(solo_state, unet_params, pair_sets[r])
        assert int(sm["t_to"]) == int(m["t_to"][r])
        np.testing.assert_allclose(
            float(sm["loss"]), float(m["loss"][r]), rtol=1e-5,
            err_msg=f"{kind} row {r} loss diverged from solo",
        )


@pytest.mark.slow
def test_fleet_row_isolation_bitwise(setup):
    """Changing row 1's prompts must not move row 0 by a single bit."""
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    s_a, _ = _run_fleet(cfg, unet_params, fleet_key, loras, pair_sets, mk_opt)
    altered = [pair_sets[0], _make_pairs(jax.random.key(99), n_pairs=3, gs=7.0)]
    s_b, _ = _run_fleet(cfg, unet_params, fleet_key, loras, altered, mk_opt)
    row0_a = unstack_fleet(jax.device_get(s_a.lora))[0]
    row0_b = unstack_fleet(jax.device_get(s_b.lora))[0]
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), row0_a, row0_b)
    # and row 1 DID move (the altered data was actually consumed)
    row1_a = unstack_fleet(jax.device_get(s_a.lora))[1]
    row1_b = unstack_fleet(jax.device_get(s_b.lora))[1]
    diffs = jax.tree.leaves(
        jax.tree.map(lambda x, y: float(np.abs(x - y).max()), row1_a, row1_b)
    )
    assert max(diffs) > 0


@pytest.mark.slow
def test_fleet_pair_sampling_respects_per_row_bounds(setup):
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    _, ms = _run_fleet(
        cfg, unet_params, fleet_key, loras, pair_sets, mk_opt, steps=4
    )
    for m in ms:
        pair_idx = np.asarray(m["pair"])
        assert pair_idx[0] < 2  # row 0 has 2 pairs
        assert pair_idx[1] < 3  # row 1 has 3
        assert np.asarray(m["loss"]).shape == (2,)
        assert np.all(np.isfinite(np.asarray(m["loss"])))


@pytest.mark.slow
def test_fleet_dp_mesh_matches_unmeshed(setup):
    """Fleet rows shard over dp with zero grad collectives; results match
    the single-device run."""
    from sliders_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    mesh = make_mesh(dp=2)
    s_plain, m_plain = _run_fleet(
        cfg, unet_params, fleet_key, loras, pair_sets, mk_opt
    )
    s_mesh, m_mesh = _run_fleet(
        cfg, unet_params, fleet_key, loras, pair_sets, mk_opt, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(m_plain[-1]["loss"]), np.asarray(m_mesh[-1]["loss"]), rtol=1e-5
    )
    for a, b in zip(
        unstack_fleet(jax.device_get(s_plain.lora)),
        unstack_fleet(jax.device_get(s_mesh.lora)),
    ):
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=1e-5), a, b
        )


@pytest.mark.slow
def test_fleet_chunked_scan_matches_stepwise(setup):
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 10)
    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    kw = dict(
        n_sliders=2, max_denoising_steps=10, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    step1 = make_fleet_text_step(cfg, schedule, sampler, optimizer, **kw)
    step2 = make_fleet_text_step(cfg, schedule, sampler, optimizer, chunk=2, **kw)
    pairs = stack_fleet_pairs(pair_sets)
    s = SliderTrainState.create(fleet_key, fleet, optimizer)
    s_a, m1 = step1(s, unet_params, pairs)
    s_a, m2 = step1(s_a, unet_params, pairs)
    s_b, ms = step2(
        SliderTrainState.create(fleet_key, fleet, optimizer), unet_params, pairs
    )
    np.testing.assert_allclose(
        np.asarray(m2["loss"]), np.asarray(ms["loss"][1]), rtol=1e-6
    )
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=1e-7),
        jax.device_get(s_a.lora), jax.device_get(s_b.lora),
    )


# ---------------------------------------------------------------------------
# CLI e2e on the tiny snapshot (slow tier)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_fleet_cli_end_to_end(tmp_path):
    """Drive cli.train_fleet on a synthesized snapshot: two prompts files
    -> two sliders trained concurrently, solo-format artifacts for each,
    chunked dispatch (steps_per_call=2) aligned to the save cadence."""
    from helpers import make_tiny_snapshot

    snap = make_tiny_snapshot(str(tmp_path / "snap"))
    pa = tmp_path / "age.yaml"
    pa.write_text(
        "- target: person\n  positive: old person\n  unconditional: ''\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 2\n"
        "  resolution: 64\n  batch_size: 1\n"
    )
    pb = tmp_path / "smile.yaml"
    pb.write_text(
        "- target: person\n  positive: smiling\n  unconditional: frowning\n"
        "  neutral: person\n  action: enhance\n  guidance_scale: 1\n"
        "  resolution: 64\n  batch_size: 1\n"
        "- target: person\n  positive: smiling\n  unconditional: ''\n"
        "  neutral: person\n  action: erase\n  guidance_scale: 1\n"
        "  resolution: 64\n  batch_size: 1\n"
    )
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"""
prompts_file: {pa}
pretrained_model:
  name_or_path: {snap}
network:
  rank: 2
  training_method: noxattn
train:
  precision: float32
  noise_scheduler: ddim
  iterations: 6
  lr: 0.001
  max_denoising_steps: 5
save:
  name: pair
  path: {tmp_path}/out
  per_steps: 2
logging:
  verbose: false
  log_every: 2
tpu:
  remat: false
  donate: false
  steps_per_call: 2
  state_checkpoint_every: 2
"""
    )

    from sliders_tpu.cli.train_fleet import build_parser, main
    from sliders_tpu.lora import io as lora_io
    from sliders_tpu.models import loader

    args = build_parser().parse_args(
        [
            "--config_file", str(cfg),
            "--prompts_file", str(pa), str(pb),
            "--names", "age,smile",
        ]
    )
    main(args)

    out = tmp_path / "out" / "pair_alpha1.0_rank2_noxattn_fleet"
    suffix = "_alpha1.0_rank2_noxattn"
    for name in ("age", "smile"):
        assert (out / f"{name}{suffix}_last.safetensors").exists()
        assert (out / f"{name}{suffix}_2steps.safetensors").exists()
        assert (out / f"{name}{suffix}_4steps.safetensors").exists()
    assert (out / f"pair{suffix}_fleet_metadata.json").exists()
    assert (out / f"pair{suffix}_fleet_trainstate.msgpack").exists()

    models = loader.load_sd(snap, dtype=jnp.float32)
    w_age = lora_io.load_slider(
        str(out / f"age{suffix}_last.safetensors"), models.unet_params
    )
    w_smile = lora_io.load_slider(
        str(out / f"smile{suffix}_last.safetensors"), models.unet_params
    )
    assert set(w_age) == set(w_smile)
    # trained on different prompts -> different adapters, both finite+moving
    moved = 0
    for name in w_age:
        assert np.isfinite(w_age[name]["down"]).all()
        if np.abs(w_age[name]["down"] - w_smile[name]["down"]).max() > 0:
            moved += 1
    assert moved > 0


# ---------------------------------------------------------------------------
# image-slider fleet (slow tier)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_fleet_image_rows_match_solo_runs():
    """Image fleet row r == solo make_image_slider_step run keyed
    fold_in(fleet_key, r): identical t_to draws, losses, and weights to
    the same tolerance as the text fleet (no loop masking here — the image
    step has no denoise loop, so rows vectorize exactly)."""
    from sliders_tpu.models import vae
    from sliders_tpu.training.fleet import make_fleet_image_step
    from sliders_tpu.training.image_slider import make_image_slider_step

    ucfg = unet2d.TINY
    vcfg = vae.TINY
    unet_params = unet2d.init_params(jax.random.key(0), ucfg)
    vae_params = vae.init_params(jax.random.key(1), vcfg)
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 10)
    fleet_key = jax.random.key(3)
    loras = _make_loras(unet_params, 2, jax.random.key(2))
    D = ucfg.cross_attention_dim

    def solo_batch(r):
        k = jax.random.fold_in(jax.random.key(40), r)
        ks = jax.random.split(k, 5)
        return {
            "images_low": jnp.clip(jax.random.normal(ks[0], (1, 32, 32, 3)) * 0.3, -1, 1),
            "images_high": jnp.clip(jax.random.normal(ks[1], (1, 32, 32, 3)) * 0.3 + 0.2, -1, 1),
            "scale": jnp.asarray(1.0 + r, jnp.float32),
            "positive": jax.random.normal(ks[2], (7, D)),
            "neutral": jax.random.normal(ks[3], (7, D)),
        }

    solo_batches = [solo_batch(0), solo_batch(1)]
    fleet_batch = {
        k: jnp.stack([b[k] for b in solo_batches]) for k in solo_batches[0]
    }

    def mk_opt(tree):
        # lr 1e-4: adam normalizes near-zero grads to +-lr, so ULP grad
        # noise produces weight drift PROPORTIONAL to lr (measured 0.6% of
        # lr on one zero-init up element at lr 1e-2); a small lr keeps the
        # 1e-5 gate meaningful while O(lr) row-mixing bugs still trip it
        return opt_factory.make_optimizer(
            "adamw", opt_factory.make_lr_schedule("constant", 1e-4, 50),
            trainable_mask=lnet.trainable_mask(tree),
        )

    fleet_tree = stack_fleet(loras)
    fleet_opt = mk_opt(fleet_tree)
    fstep = make_fleet_image_step(
        ucfg, vcfg, schedule, sampler, fleet_opt, n_sliders=2,
        max_denoising_steps=10, compute_dtype=jnp.float32, remat=False,
        donate=False,
    )
    fstate = SliderTrainState.create(fleet_key, fleet_tree, fleet_opt)
    fms = []
    for _ in range(2):
        fstate, fm = fstep(fstate, unet_params, vae_params, fleet_batch)
        fms.append(fm)
    finals = unstack_fleet(jax.device_get(fstate.lora))

    for r in range(2):
        opt = mk_opt(loras[r])
        sstep = make_image_slider_step(
            ucfg, vcfg, schedule, sampler, opt, max_denoising_steps=10,
            compute_dtype=jnp.float32, remat=False, donate=False,
        )
        st = SliderTrainState.create(jax.random.fold_in(fleet_key, r), loras[r], opt)
        for i in range(2):
            st, m = sstep(st, unet_params, vae_params, solo_batches[r])
            assert int(m["t_to"]) == int(fms[i]["t_to"][r])
            np.testing.assert_allclose(
                float(m["loss"]), float(fms[i]["loss"][r]), rtol=1e-5
            )
            assert float(fms[i]["scale"][r]) == 1.0 + r
        for name, w in jax.device_get(st.lora).items():
            for leaf in ("down", "up", "alpha"):
                np.testing.assert_allclose(
                    finals[r][name][leaf], w[leaf], rtol=0, atol=1e-5,
                    err_msg=f"image fleet row {r} {name}.{leaf} diverged",
                )


@pytest.mark.slow
def test_fleet_shared_t_to(setup):
    """shared_t_to=True: every row gets row 0's t_to draw (loop inflation
    removed); row 0 keeps exact solo/per-row parity."""
    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 10)
    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    kw = dict(
        n_sliders=2, max_denoising_steps=10, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
    )
    per_row = make_fleet_text_step(cfg, schedule, sampler, optimizer, **kw)
    shared = make_fleet_text_step(
        cfg, schedule, sampler, optimizer, shared_t_to=True, **kw
    )
    pairs = stack_fleet_pairs(pair_sets)
    s_a, m_a = per_row(
        SliderTrainState.create(fleet_key, fleet, optimizer), unet_params, pairs
    )
    s_b, m_b = shared(
        SliderTrainState.create(fleet_key, fleet, optimizer), unet_params, pairs
    )
    t_b = np.asarray(m_b["t_to"])
    assert (t_b == t_b[0]).all()
    assert int(t_b[0]) == int(np.asarray(m_a["t_to"])[0])  # row 0's own draw
    np.testing.assert_allclose(
        float(m_a["loss"][0]), float(m_b["loss"][0]), rtol=1e-5
    )
    row0_a = unstack_fleet(jax.device_get(s_a.lora))[0]
    row0_b = unstack_fleet(jax.device_get(s_b.lora))[0]
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=1e-5),
        row0_a, row0_b,
    )
    assert np.isfinite(np.asarray(m_b["loss"])).all()


@pytest.mark.slow
def test_fleet_stratified_t_to_step(setup):
    """t_to_mode='stratified' runs end-to-end: the step's reported t_to
    draws live in bounds, sit within one stratum of each other, and match
    draw_fleet_t_to's prediction for the same (key, step); losses finite
    and weights move."""
    from sliders_tpu.training.fleet import draw_fleet_t_to

    cfg, unet_params, fleet_key, loras, pair_sets, mk_opt = setup
    schedule = make_schedule()
    sampler = make_sampler(schedule, "ddim", 10)
    fleet = stack_fleet(loras)
    optimizer = mk_opt(fleet)
    T, S = 10, 3
    step = make_fleet_text_step(
        cfg, schedule, sampler, optimizer, n_sliders=2,
        max_denoising_steps=T, resolution=128, batch_size=1,
        compute_dtype=jnp.float32, remat=False, donate=False,
        t_to_mode="stratified", t_to_strata=S,
    )
    state0 = SliderTrainState.create(fleet_key, fleet, optimizer)
    state, m = step(state0, unet_params, stack_fleet_pairs(pair_sets))
    t = np.asarray(m["t_to"])
    assert t.min() >= 1 and t.max() <= T - 1
    assert t.max() - t.min() <= int(np.ceil((T - 1) / S)) + 1

    rows = jnp.arange(2)
    keys = jax.vmap(
        lambda r: jax.random.fold_in(jax.random.fold_in(state0.key, r), state0.step)
    )(rows)
    k_t = jax.vmap(lambda k: jax.random.split(k, 5))(keys)[:, 1]
    expected = draw_fleet_t_to(
        state0.key, state0.step, k_t, T, mode="stratified", strata=S
    )
    np.testing.assert_array_equal(t, np.asarray(expected))
    assert np.isfinite(np.asarray(m["loss"])).all()
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.lora, state0.lora,
    ))
    assert max(moved) > 0
