"""Fused rollout tests (tpu_plume.rollout)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_plume.core.config import EnvConfig
from tpu_plume.models import ActorCritic
from tpu_plume.rollout import init_rollout, rollout_chunk

CFG = EnvConfig(max_steps=30, plume_sigma=500 / 16)


def _setup(n=32):
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    carry = init_rollout(jax.random.PRNGKey(1), CFG, n)
    return model, params, carry


def test_rollout_shapes_and_bootstrap():
    n, t = 32, 40
    model, params, carry = _setup(n)
    carry, traj, boot = jax.jit(
        rollout_chunk, static_argnames=("apply_fn", "cfg", "length", "greedy")
    )(params, model.apply, carry, CFG, t)
    assert traj.obs.shape == (t, n, 6)
    assert traj.action.shape == (t, n)
    assert boot.shape == (n,)
    assert traj.pos.shape == (t, n, 2)
    # max_steps=30 < t=40: every env must complete at least one episode
    assert np.asarray(traj.done).sum(axis=0).min() >= 1


def test_episode_records_consistent():
    n, t = 16, 64
    model, params, carry = _setup(n)
    carry, traj, _ = rollout_chunk(params, model.apply, carry, CFG, t)
    ep = jax.tree.map(np.asarray, traj.episode)
    done = ep.done
    assert done.any()
    # steps within [1, max_steps]; done at max_steps unless success
    steps = ep.steps[done]
    assert steps.min() >= 1 and steps.max() <= CFG.max_steps
    succ = ep.success[done]
    at_limit = steps == CFG.max_steps
    assert np.all(succ | at_limit)
    # success iff final distance <= radius
    np.testing.assert_array_equal(succ, ep.distance[done] <= ep.radius[done])
    # component sums + terminal bonus == total reward
    comp = (ep.conc_reward + ep.explore_reward + ep.move_penalty
            + ep.tke_penalty + ep.boundary_penalty)[done]
    bonus = np.where(succ, np.minimum(500.0, 150.0 * CFG.initial_radius / ep.radius[done]), 0.0)
    np.testing.assert_allclose(ep.total_reward[done], comp + bonus, rtol=1e-4, atol=1e-3)
    # non-success rows record final_conc = 0 (reference train_ppo2.0.py:200-207)
    assert np.all(ep.final_conc[done][~succ] == 0.0)


def test_accumulators_reset_after_done():
    """Per-env totals must restart at episode boundaries: per-step rewards
    summed between dones equal the emitted record total."""
    n, t = 8, 90
    model, params, carry = _setup(n)
    carry, traj, _ = rollout_chunk(params, model.apply, carry, CFG, t)
    rewards = np.asarray(traj.reward)
    done = np.asarray(traj.done)
    totals = np.asarray(traj.episode.total_reward)
    for env in range(n):
        start = 0
        for step_i in range(t):
            if done[step_i, env]:
                expect = rewards[start:step_i + 1, env].sum()
                np.testing.assert_allclose(totals[step_i, env], expect, rtol=1e-4, atol=1e-3)
                start = step_i + 1


def test_greedy_rollout_deterministic_actions():
    n, t = 8, 10
    model, params, carry = _setup(n)
    _, traj, _ = rollout_chunk(params, model.apply, carry, CFG, t, greedy=True)
    logits, _ = model.apply(params, traj.obs.reshape(-1, 6))
    expect = np.asarray(jnp.argmax(logits, -1)).reshape(t, n)
    np.testing.assert_array_equal(np.asarray(traj.action), expect)


def test_guide_in_rollout_override_semantics():
    """Round-5 policy-in-the-loop fine-tune contract (rollout.py guide=):
    an identity guide is a bit-exact no-op with override all-False; an
    always-shifting guide marks every step overridden, stores the
    POLICY's action (credit assignment), and drives different dynamics."""
    n, t = 8, 20
    model, params, _ = _setup(n)

    def identity_fn(gs, pos, conc, action):
        return gs + 1.0, action, 0.0

    def shift_fn(gs, pos, conc, action):
        return gs + 1.0, (action + 1) % CFG.num_actions, 0.0

    _, traj0, _ = rollout_chunk(
        params, model.apply,
        init_rollout(jax.random.PRNGKey(1), CFG, n), CFG, t)

    ident = (jnp.zeros(()), identity_fn)
    _, traj_id, _ = rollout_chunk(
        params, model.apply,
        init_rollout(jax.random.PRNGKey(1), CFG, n, guide=ident),
        CFG, t, guide=ident)
    assert not np.asarray(traj_id.override).any()
    np.testing.assert_array_equal(np.asarray(traj_id.action),
                                  np.asarray(traj0.action))
    np.testing.assert_allclose(np.asarray(traj_id.pos),
                               np.asarray(traj0.pos))

    shift = (jnp.zeros(()), shift_fn)
    _, traj_sh, _ = rollout_chunk(
        params, model.apply,
        init_rollout(jax.random.PRNGKey(1), CFG, n, guide=shift),
        CFG, t, guide=shift)
    ov = np.asarray(traj_sh.override)
    assert ov.all()
    # first step: same obs/key as the unguided run, so the stored
    # (policy) action matches — the EXECUTED action differed, which the
    # next positions prove
    np.testing.assert_array_equal(np.asarray(traj_sh.action[0]),
                                  np.asarray(traj0.action[0]))
    assert (np.asarray(traj_sh.pos) != np.asarray(traj0.pos)).any()
