"""Recurrent (LSTM) PPO policy tests.

The PPO+LSTM policy is a new capability: the reference's name advertises it
but its LSTMs are offline stop predictors only (SURVEY.md §2.5).  The
correctness-critical piece is the BPTT bookkeeping: the update must replay
the exact hidden states the rollout acted with, from the stored chunk-start
carry and done-derived reset flags.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig, PPOConfig, RolloutConfig, TrainConfig
from tpu_plume.models.recurrent import RecurrentActorCritic
from tpu_plume.rollout.rollout import init_rollout, rollout_chunk


def _small_cfg(**env_kw):
    return TrainConfig(
        env=EnvConfig(max_steps=6, **env_kw),
        ppo=PPOConfig(arch="lstm", lstm_hidden=16, lstm_embed=16,
                      minibatch_size=16, epochs=2),
        rollout=RolloutConfig(num_envs=8, unroll_length=12),
    )


def test_step_sequence_equivalence():
    """sequence() must equal a chain of step() calls with the same resets."""
    m = RecurrentActorCritic(lstm_hidden=16, embed_size=16)
    carry = m.initial_state(4)
    params = m.init(jax.random.PRNGKey(0), carry, jnp.zeros((4, 6)))
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (10, 4, 6))
    resets = jnp.zeros((10, 4), bool).at[5, 1].set(True).at[7, 3].set(True)

    _, lseq, vseq = m.apply(params, carry, obs_seq, resets, method="sequence")

    c = carry
    zero = m.initial_state(4)
    logits_chain, values_chain = [], []
    for t in range(10):
        mask = resets[t][:, None]
        c = jax.tree.map(lambda z, cc: jnp.where(mask, z, cc), zero, c)
        c, lt, vt = m.apply(params, c, obs_seq[t])
        logits_chain.append(lt)
        values_chain.append(vt)
    np.testing.assert_allclose(np.asarray(lseq), np.asarray(jnp.stack(logits_chain)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vseq), np.asarray(jnp.stack(values_chain)), atol=1e-5)


def test_layer_norm_cell_step_sequence_equivalence():
    """The LayerNorm-LSTM variant must satisfy the same step/sequence
    contract the BPTT replay depends on."""
    m = RecurrentActorCritic(lstm_hidden=16, embed_size=16, layer_norm_cell=True)
    carry = m.initial_state(4)
    params = m.init(jax.random.PRNGKey(0), carry, jnp.zeros((4, 6)))
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 6))
    resets = jnp.zeros((8, 4), bool).at[3, 2].set(True)
    _, lseq, vseq = m.apply(params, carry, obs_seq, resets, method="sequence")

    c = carry
    zero = m.initial_state(4)
    chain = []
    for t in range(8):
        mask = resets[t][:, None]
        c = jax.tree.map(lambda z, cc: jnp.where(mask, z, cc), zero, c)
        c, lt, _ = m.apply(params, c, obs_seq[t])
        chain.append(lt)
    np.testing.assert_allclose(
        np.asarray(lseq), np.asarray(jnp.stack(chain)), atol=1e-5
    )
    assert np.isfinite(np.asarray(vseq)).all()


def test_rollout_replay_parity():
    """The update-side sequence replay (h_init + done-shifted resets) must
    reproduce the rollout's log_probs exactly — episode boundaries included
    (max_steps=6 < unroll 12 forces mid-chunk auto-resets)."""
    cfg = _small_cfg()
    m = RecurrentActorCritic(
        num_actions=cfg.env.num_actions, lstm_hidden=16, embed_size=16
    )
    n = cfg.rollout.num_envs
    params = m.init(
        jax.random.PRNGKey(0), m.initial_state(1), jnp.zeros((1, cfg.env.obs_dim))
    )
    carry = init_rollout(
        jax.random.PRNGKey(1), cfg.env, n, radius=50.0, explore_bonus=0.6,
        hidden=m.initial_state(n),
    )
    h_init = carry.hidden
    carry2, traj, _ = rollout_chunk(
        params, None, carry, cfg.env, cfg.rollout.unroll_length, rnn=m
    )
    assert bool(traj.done.any()), "need episode boundaries for this test"

    resets = jnp.concatenate(
        [jnp.zeros((1, n), bool), traj.done[:-1]], axis=0
    )
    _, logits, values = m.apply(params, h_init, traj.obs, resets, method="sequence")
    lp = jnp.sum(
        jax.nn.log_softmax(logits)
        * jax.nn.one_hot(traj.action, logits.shape[-1]),
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(traj.log_prob), atol=1e-5)
    np.testing.assert_allclose(np.asarray(values), np.asarray(traj.value), atol=1e-5)


def test_recurrent_update_square_shapes():
    """Regression: with T == N == lstm_hidden the old shape-based minibatch
    dispatch misread h_init [N, H] as a time-major [T, N] leaf and permuted
    hidden UNITS instead of envs (trace-time broadcast error).  The split
    now dispatches by field name and must work for square shapes."""
    import optax
    from flax.training.train_state import TrainState

    from tpu_plume.rl.ppo import RecurrentPPOBatch, ppo_update_recurrent

    T = N = H = 8
    key = jax.random.PRNGKey(0)
    m = RecurrentActorCritic(num_actions=5, lstm_hidden=H, embed_size=16)
    params = m.init(key, m.initial_state(1), jnp.zeros((1, 6)))
    ts = TrainState.create(apply_fn=m.apply, params=params, tx=optax.adam(1e-3))

    ks = jax.random.split(key, 6)
    batch = RecurrentPPOBatch(
        obs=jax.random.normal(ks[0], (T, N, 6)),
        actions=jax.random.randint(ks[1], (T, N), 0, 5),
        old_log_probs=-jnp.abs(jax.random.normal(ks[2], (T, N))),
        advantages=jax.random.normal(ks[3], (T, N)),
        returns=jax.random.normal(ks[4], (T, N)),
        old_values=jnp.zeros((T, N)),
        resets=jnp.zeros((T, N), bool),
        h_init=(jax.random.normal(ks[5], (N, H)),
                jax.random.normal(ks[5], (N, H))),
    )
    # minibatch_size=2*T -> 2 envs per minibatch, 4 minibatches
    cfg = PPOConfig(arch="lstm", lstm_hidden=H, lstm_embed=16,
                    minibatch_size=2 * T, epochs=2)
    ts2, metrics = jax.jit(
        lambda ts, b, k: ppo_update_recurrent(ts, b, k, cfg)
    )(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss/total"]))
    assert ts2.step == 2 * 4  # epochs * minibatches


def test_recurrent_train_step_smoke():
    """Fused recurrent train step: finite loss, hidden threads through."""
    from tpu_plume.rl.curriculum import curriculum_init
    from tpu_plume.train.ppo_trainer import (
        LoopCarry,
        build_train_step,
        make_policy_model,
        make_train_state,
    )

    cfg = _small_cfg()
    key = jax.random.PRNGKey(0)
    model = make_policy_model(cfg)
    loop = LoopCarry(
        train_state=make_train_state(cfg, key),
        rollout=init_rollout(
            key, cfg.env, cfg.rollout.num_envs, radius=50.0, explore_bonus=0.6,
            hidden=model.initial_state(cfg.rollout.num_envs),
        ),
        curriculum=curriculum_init(cfg.curriculum, 0.6),
        key=key,
    )
    step = build_train_step(cfg)
    for _ in range(2):
        loop, stats, traj = step(loop)
    assert np.isfinite(float(stats["loss/total"]))
    assert loop.rollout.hidden[0].shape == (cfg.rollout.num_envs, 16)
    # hidden is zeroed at done boundaries inside the chunk
    assert int(np.asarray(traj.done).sum()) > 0


def test_cli_lstm_train_eval(tmp_path, capsys):
    import json
    import os

    from tpu_plume.cli.main import main

    out_dir = str(tmp_path / "lstm_run")
    main([
        "train", "--preset", "ppo_v2_0", "--out", out_dir, "--arch", "lstm",
        "--envs", "8", "--unroll", "16", "--minibatch", "64",
        "--iterations", "2", "--episodes", "100000",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["env_steps"] == 2 * 8 * 16
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))
    # lstm arch persists via Orbax only (no reference .pth layout)
    assert not os.path.exists(
        os.path.join(out_dir, "model", "ppo_successful_models.pth")
    )

    main([
        "eval", "--preset", "ppo_v2_0", "--arch", "lstm",
        "--ckpt", os.path.join(out_dir, "checkpoint"), "--episodes", "4",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mean_deviation" in summary

    expert = str(tmp_path / "expert_lstm.npz")
    main([
        "expert", "--preset", "ppo_v2_0", "--arch", "lstm",
        "--ckpt", os.path.join(out_dir, "checkpoint"),
        "--episodes", "3", "--out", expert,
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["samples"] > 0


def test_gail_rejects_lstm(tmp_path):
    import pytest

    from tpu_plume.core import get_preset
    from tpu_plume.train.gail_trainer import train_ppo_gail

    cfg = get_preset("ppo_v1_1")
    cfg = cfg.replace(ppo=dataclasses.replace(cfg.ppo, arch="lstm"))
    with pytest.raises(ValueError, match="mlp policy only"):
        train_ppo_gail(cfg, str(tmp_path), "nonexistent.npz")
