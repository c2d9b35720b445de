"""End-to-end PPO trainer smoke tests (small geometry, CPU)."""

import os

import numpy as np
import pandas as pd

from tpu_plume.core.config import (
    CurriculumConfig,
    EnvConfig,
    PPOConfig,
    RolloutConfig,
    TrainConfig,
)
from tpu_plume.train import train_ppo


def _tiny_cfg(**kw):
    return TrainConfig(
        name="ppo_v2_0",
        env=EnvConfig(max_steps=40, plume_sigma=500 / 16),
        ppo=PPOConfig(minibatch_size=128, epochs=2),
        curriculum=CurriculumConfig(window_size=16),
        rollout=RolloutConfig(num_envs=32, unroll_length=32),
        total_episodes=60,
        **kw,
    )


def test_train_smoke_end_to_end(tmp_path):
    out = str(tmp_path / "run")
    res = train_ppo(_tiny_cfg(), out, capture_netcdf=True, verbose=False, log_every=1)
    assert res.episodes >= 60
    assert res.env_steps > 0 and res.steps_per_sec > 0

    # CSV schema parity (reference train_ppo2.0.py:129-135)
    df = pd.read_csv(os.path.join(out, "training_results.csv"))
    assert list(df.columns) == [
        "Episode", "Total_Reward", "Success", "Conc_Reward", "Explore_Reward",
        "Move_Penalty", "TKE_Penalty", "Boundary_Penalty", "Steps",
        "Final_Conc", "Current_Radius",
    ]
    assert len(df) == res.episodes
    assert df["Episode"].iloc[0] == 1 and df["Episode"].is_monotonic_increasing
    assert df["Steps"].between(1, 40).all()
    # reward decomposition consistency per row (bonus only on success rows)
    comp = (df.Conc_Reward + df.Explore_Reward + df.Move_Penalty
            + df.TKE_Penalty + df.Boundary_Penalty)
    bonus = np.where(df.Success == 1,
                     np.minimum(500.0, 150.0 * 50.0 / df.Current_Radius), 0.0)
    np.testing.assert_allclose(df.Total_Reward, comp + bonus, rtol=1e-3, atol=1e-2)

    # checkpoint bundle + reference .pth artifact exist
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    assert os.path.exists(os.path.join(out, "model", "ppo_successful_models.pth"))

    # NetCDF capture written (successful episodes at smallest radii)
    from tpu_plume.data import read_nc

    nc = read_nc(os.path.join(out, "training_data.nc"))
    written = ~np.isnan(nc["source_x"])
    if written.any():
        i = int(np.argmax(written))
        steps_i = int(np.sum(~np.isnan(nc["x"][i])))
        assert nc["is_source"][i, steps_i - 1] == 1

    # train log captured throughput
    log = pd.read_csv(os.path.join(out, "train_log.csv"))
    assert "throughput/env_steps_per_sec" in log.columns


def test_resume_checkpoint_restores(tmp_path):
    from tpu_plume.data.checkpoint import restore_checkpoint

    out = str(tmp_path / "run")
    cfg = _tiny_cfg()
    res = train_ppo(cfg, out, verbose=False, max_iterations=2)
    bundle = restore_checkpoint(os.path.join(out, "checkpoint"))
    assert "params" in bundle and "opt_state" in bundle and "curriculum" in bundle
    # params in the bundle match the returned params
    leaf = bundle["params"]["params"]["Dense_0"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(res.params["params"]["Dense_0"]["kernel"])
    )


def test_snapshot_every(tmp_path):
    """Periodic snapshots land at drain-window boundaries and carry the FULL
    resume bundle (SURVEY.md §5 — the reference saves params only,
    PPOV2.0/train_ppo2.0.py:254-256)."""
    from tpu_plume.data.checkpoint import restore_checkpoint

    out = str(tmp_path / "run")
    train_ppo(_tiny_cfg(), out, verbose=False, max_iterations=3,
              write_csv=False, snapshot_every=2)
    # sync_every defaults to 8 > max_iterations, so the only drain window is
    # the final one at iteration 3.
    snap = os.path.join(out, "checkpoint_iter000003")
    assert os.path.isdir(snap)
    bundle = restore_checkpoint(snap)
    for k in ("params", "opt_state", "rollout", "curriculum", "key", "counters"):
        assert k in bundle, k
    assert int(bundle["counters"]["iteration"]) == 3


def test_kill_and_resume_equivalence(tmp_path):
    """A run killed after a snapshot and resumed from it is bit-identical to
    the uninterrupted run: params, counters, curriculum, and the per-episode
    CSV all match (mid-run full resume, SURVEY.md §5)."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(_tiny_cfg(), total_episodes=100_000)

    full = train_ppo(cfg, str(tmp_path / "full"), verbose=False,
                     max_iterations=6, sync_every=2)

    part_dir = str(tmp_path / "part")
    train_ppo(cfg, part_dir, verbose=False, max_iterations=4, sync_every=2,
              snapshot_every=2)
    res = train_ppo(cfg, part_dir, verbose=False, max_iterations=6,
                    sync_every=2,
                    resume_from=os.path.join(part_dir, "checkpoint_iter000004"))

    jax.tree.map(np.testing.assert_array_equal, full.params, res.params)
    assert res.episodes == full.episodes
    assert res.successes == full.successes
    assert res.env_steps == full.env_steps
    np.testing.assert_array_equal(
        np.asarray(full.curriculum.radius), np.asarray(res.curriculum.radius)
    )

    df_full = pd.read_csv(os.path.join(str(tmp_path / "full"),
                                       "training_results.csv"))
    df_part = pd.read_csv(os.path.join(part_dir, "training_results.csv"))
    pd.testing.assert_frame_equal(df_full, df_part)

    # resume + warm-start params are mutually exclusive
    import pytest

    with pytest.raises(ValueError):
        train_ppo(cfg, str(tmp_path / "bad"), verbose=False, max_iterations=5,
                  init_params=full.params,
                  resume_from=os.path.join(part_dir, "checkpoint_iter000004"))


def test_grad_histograms_logged(tmp_path):
    """With TensorBoard on, the fused step emits a full-batch gradient tree
    (reference logs per-gradient histograms each episode,
    PPOV1.1/train_ppo1.0.py:156-162) and the logger writes event files."""
    import glob

    import jax

    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry, build_train_step, make_train_state,
    )

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    ts = make_train_state(cfg, key)
    rollout = init_rollout(
        key, cfg.env, cfg.rollout.num_envs,
        radius=cfg.curriculum.initial_radius,
        explore_bonus=cfg.env.explore_bonus_init,
    )
    loop = LoopCarry(
        train_state=ts, rollout=rollout,
        curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
        key=key,
    )
    _, stats, _ = build_train_step(cfg, with_grads=True)(loop)
    grads = stats["grads"]
    assert jax.tree.structure(grads) == jax.tree.structure(ts.params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    # at least one leaf nonzero (a real gradient, not a placeholder)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in jax.tree.leaves(grads))

    # e2e: the TB event files appear and carry grads/ histograms
    out = str(tmp_path / "run")
    train_ppo(_tiny_cfg(), out, verbose=False, max_iterations=2,
              write_csv=False, use_tensorboard=True, log_every=1)
    events = glob.glob(os.path.join(out, "tb", "events.out.tfevents.*"))
    assert events
    data = b"".join(open(e, "rb").read() for e in events)
    assert b"grads/" in data and b"params/" in data


def test_behavior_cloning_fits_oracle(tmp_path):
    """BC pretrainer: fit the policy to phase-oracle demonstrations, save a
    bundle loadable as a warm start, beat chance accuracy by a wide margin."""
    import jax

    from tpu_plume.core import get_preset
    from tpu_plume.evaluation import generate_expert_data, make_oracle
    from tpu_plume.train.bc import train_bc

    cfg = get_preset("ppo_v2_0")
    path = str(tmp_path / "expert.npz")
    oracle = make_oracle("phase", cfg.env)
    generate_expert_data(
        None, None, cfg.env, jax.random.PRNGKey(0), num_episodes=24,
        path=path, oracle=oracle,
    )
    res = train_bc(cfg, str(tmp_path / "bc"), path, epochs=25, verbose=False)
    assert res.val_accuracy > 0.45  # chance = 0.2 over 5 actions
    assert res.train_loss < 1.0

    from tpu_plume.data.checkpoint import restore_checkpoint

    bundle = restore_checkpoint(str(tmp_path / "bc" / "checkpoint"))
    assert "params" in bundle


def test_behavior_cloning_rejects_lstm_arch(tmp_path):
    import dataclasses

    import pytest

    from tpu_plume.core import get_preset
    from tpu_plume.train.bc import train_bc

    cfg = get_preset("ppo_v2_0")
    cfg = cfg.replace(ppo=dataclasses.replace(cfg.ppo, arch="lstm"))
    with pytest.raises(ValueError, match="feedforward"):
        train_bc(cfg, None, "unused.npz")


def test_dagger_mechanics(tmp_path):
    """DAgger against the phase oracle: round 0 is oracle-driven (its
    rollout success@40 must be near the oracle's own ~85%), later rounds
    aggregate student-visited states, and the student's closed-loop
    success must clear the pure-BC collapse level (~5%, measured round 3).
    Improvement round-over-round is NOT asserted — at this scale the
    binding constraint is that the oracle's action is only ~55%
    obs-inferable off-path (the representational finding that motivates
    the recurrent student)."""
    import dataclasses

    from tpu_plume.core import get_preset
    from tpu_plume.train.dagger import train_dagger

    cfg = get_preset("ppo_v2_0")
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, obs_memory=True, max_steps=120)
    )
    res = train_dagger(
        cfg, str(tmp_path / "dagger"),
        rounds=4, episodes_per_round=64, epochs_per_round=12, verbose=False,
    )
    assert res.samples > 1000
    assert res.eval_success[0] >= 0.6  # oracle-driven round
    assert res.eval_success[-1] > 0.05  # student above BC-collapse level

    from tpu_plume.data.checkpoint import restore_checkpoint

    bundle = restore_checkpoint(str(tmp_path / "dagger" / "checkpoint"))
    assert "params" in bundle


def test_sequence_dagger_lstm_student(tmp_path):
    """Sequence DAgger: the recurrent student trains by full-episode BPTT
    on oracle labels; round 0 must track the oracle and the saved bundle
    must load into the recurrent model."""
    import dataclasses

    from tpu_plume.core import get_preset
    from tpu_plume.train.dagger import train_dagger

    cfg = get_preset("ppo_v2_0")
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, obs_memory=True, max_steps=100),
        ppo=dataclasses.replace(cfg.ppo, arch="lstm", lstm_layer_norm=True),
    )
    res = train_dagger(
        cfg, str(tmp_path / "sdagger"),
        rounds=2, episodes_per_round=32, epochs_per_round=6, verbose=False,
    )
    assert res.eval_success[0] >= 0.6  # oracle-driven round
    assert res.samples > 500

    from tpu_plume.data.checkpoint import restore_checkpoint

    bundle = restore_checkpoint(str(tmp_path / "sdagger" / "checkpoint"))
    assert "params" in bundle


def test_bf16_update_split_step():
    """--bf16-update: one fused step with the bf16-compute update twin —
    params stay f32 (master weights), the restored apply_fn is the f32
    rollout one, and the loss actually ran in bfloat16 (differs from the
    pure-f32 step from the same init)."""
    import jax
    import jax.numpy as jnp

    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry, build_train_step, make_train_state,
    )

    import dataclasses

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)

    def one_step(cfg):
        ts = make_train_state(cfg, key)
        rollout = init_rollout(
            key, cfg.env, cfg.rollout.num_envs,
            radius=cfg.curriculum.initial_radius,
            explore_bonus=cfg.env.explore_bonus_init,
        )
        loop = LoopCarry(
            train_state=ts, rollout=rollout,
            curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
            key=key,
        )
        out, stats, _ = build_train_step(cfg)(loop)
        return ts, out, stats

    bf_cfg = dataclasses.replace(
        cfg, ppo=dataclasses.replace(cfg.ppo, bf16_update=True))
    ts0, out, stats = one_step(bf_cfg)
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(out.train_state.params))
    assert out.train_state.apply_fn is ts0.apply_fn
    assert np.isfinite(float(stats["loss/total"]))
    _, _, stats_f32 = one_step(cfg)
    assert float(stats["loss/total"]) != float(stats_f32["loss/total"])

def test_f32_heads_split_step():
    """--f32-heads under --bf16-update: same f32 param tree (checkpoint
    compatible), runs finite, and differs from both the pure-bf16-update
    and pure-f32 losses (heads really computed at a third precision mix).
    A no-op without a bf16 path: the f32+f32_heads step matches plain f32
    bit-for-bit."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rollout.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry, build_train_step, make_train_state,
    )

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)

    def one_step(cfg):
        ts = make_train_state(cfg, key)
        rollout = init_rollout(
            key, cfg.env, cfg.rollout.num_envs,
            radius=cfg.curriculum.initial_radius,
            explore_bonus=cfg.env.explore_bonus_init,
        )
        loop = LoopCarry(
            train_state=ts, rollout=rollout,
            curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
            key=key,
        )
        out, stats, _ = build_train_step(cfg)(loop)
        return ts, out, stats

    mk = lambda **kw: dataclasses.replace(
        cfg, ppo=dataclasses.replace(cfg.ppo, **kw))
    _, out_h, stats_h = one_step(mk(bf16_update=True, f32_heads=True))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(out_h.train_state.params))
    assert np.isfinite(float(stats_h["loss/total"]))
    _, _, stats_bf = one_step(mk(bf16_update=True))
    _, _, stats_f32 = one_step(cfg)
    assert float(stats_h["loss/total"]) != float(stats_bf["loss/total"])
    assert float(stats_h["loss/total"]) != float(stats_f32["loss/total"])
    _, _, stats_noop = one_step(mk(f32_heads=True))
    assert float(stats_noop["loss/total"]) == float(stats_f32["loss/total"])

def test_guided_finetune_step():
    """Policy-in-the-loop fine-tuning: the eval-time guide rides the
    training rollout — override mask emitted, overridden steps weighted
    out of the policy surrogate (zero weights => zero policy loss), value
    loss trains on every step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpu_plume.evaluation.guidance import make_guide
    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.rl.ppo import PPOBatch, ppo_loss
    from tpu_plume.rollout.rollout import init_rollout
    from tpu_plume.train.ppo_trainer import (
        LoopCarry, build_train_step, make_train_state,
    )

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, obs_memory=True,
                                     reward_variant="delta"))
    guide = make_guide(cfg.env, terminate_radius=50.0,
                       success_radius=cfg.eval.success_distance)
    key = jax.random.PRNGKey(0)
    ts = make_train_state(cfg, key)
    rollout = init_rollout(
        key, cfg.env, cfg.rollout.num_envs,
        radius=cfg.curriculum.initial_radius,
        explore_bonus=cfg.env.explore_bonus_init,
        guide=guide,
    )
    assert rollout.guide_state is not None
    loop = LoopCarry(
        train_state=ts, rollout=rollout,
        curriculum=curriculum_init(cfg.curriculum, cfg.env.explore_bonus_init),
        key=key,
    )
    out, stats, traj = build_train_step(cfg, guide=guide)(loop)
    assert traj.override is not None
    assert traj.override.dtype == jnp.bool_
    assert np.isfinite(float(stats["loss/total"]))
    # guide state persists in the next carry
    assert out.rollout.guide_state is not None

    # weighted loss semantics: all-zero weights kill the policy surrogate
    b = 32
    obs = jnp.zeros((b, cfg.env.obs_dim))
    batch = PPOBatch(
        obs=obs, actions=jnp.zeros(b, jnp.int32),
        old_log_probs=jnp.full(b, -1.6), advantages=jnp.ones(b),
        returns=jnp.ones(b), old_values=jnp.zeros(b),
        weights=jnp.zeros(b),
    )
    _, m0 = ppo_loss(ts.params, ts.apply_fn, batch, cfg.ppo)
    assert float(m0["loss/policy"]) == 0.0
    assert float(m0["loss/value"]) > 0.0
