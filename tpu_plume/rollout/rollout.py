"""Fused on-device rollout: policy inference + env.step in one ``lax.scan``.

This replaces the reference's hot loop — a per-step Python ``while`` that
crosses the host<->device boundary on every step
(PPOV2.0/train_ppo2.0.py:156-198, SURVEY.md §3.1) — with a single compiled
scan over T steps of N vmapped envs: the actor-critic forward is one batched
MXU matmul, the env step is fused VPU arithmetic, and episode boundaries are
branchless auto-resets.  Per-episode statistics (the reference's
``episode_data`` accounting, train_ppo2.0.py:141-191) are carried as per-env
accumulators and emitted as masked ``EpisodeRecord`` rows at done steps for
host-side drain (CSV / NetCDF capture).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from tpu_plume.core.config import EnvConfig
from tpu_plume.env.methane import (
    EnvState,
    auto_reset_from_draws,
    reset,
    step_noise,
)


@struct.dataclass
class EpisodeAccum:
    """Running per-env episode totals (reference episode_data,
    train_ppo2.0.py:141-155)."""

    total_reward: jnp.ndarray
    conc_reward: jnp.ndarray
    explore_reward: jnp.ndarray
    move_penalty: jnp.ndarray
    tke_penalty: jnp.ndarray
    boundary_penalty: jnp.ndarray

    @classmethod
    def zeros(cls, n: int) -> "EpisodeAccum":
        z = jnp.zeros(n, jnp.float32)
        return cls(z, z, z, z, z, z)


@struct.dataclass
class EpisodeRecord:
    """One completed-episode row, valid where ``done`` (masked drain).

    Mirrors the reference's per-episode CSV row (train_ppo2.0.py:230-242)
    plus the NetCDF per-episode scalars (netcdf_writer.py:89-114)."""

    done: jnp.ndarray          # bool: row valid
    success: jnp.ndarray       # bool: ended by reaching the source
    total_reward: jnp.ndarray
    steps: jnp.ndarray         # i32 episode length
    conc_reward: jnp.ndarray
    explore_reward: jnp.ndarray
    move_penalty: jnp.ndarray
    tke_penalty: jnp.ndarray
    boundary_penalty: jnp.ndarray
    final_conc: jnp.ndarray    # conc at the final cell (0 unless success)
    final_x: jnp.ndarray
    final_y: jnp.ndarray
    source_x: jnp.ndarray
    source_y: jnp.ndarray
    radius: jnp.ndarray
    distance: jnp.ndarray      # final distance to source


@struct.dataclass
class RolloutStep:
    """Per-step outputs, stacked to [T, N, ...] by the scan."""

    obs: jnp.ndarray           # f32[N, 6] obs the policy acted on
    action: jnp.ndarray        # i32[N]
    log_prob: jnp.ndarray      # f32[N]
    value: jnp.ndarray         # f32[N]
    reward: jnp.ndarray        # f32[N]
    done: jnp.ndarray          # bool[N]
    pos: jnp.ndarray           # f32[N, 2] post-step position (NetCDF x/y)
    conc: jnp.ndarray          # f32[N] raw conc at new cell (NetCDF)
    episode: EpisodeRecord     # valid where done
    # Privileged-teacher label for the pre-step state (distilled PPO);
    # None unless the rollout was built with an oracle.
    oracle_action: Any = None
    # bool[N]: the executed action came from the terminal guide, not the
    # policy (guided fine-tuning masks these steps out of the policy
    # surrogate); None unless the rollout was built with a guide.
    override: Any = None


@struct.dataclass
class RolloutCarry:
    env_state: EnvState        # batched [N, ...]
    obs: jnp.ndarray           # f32[N, 6]
    accum: EpisodeAccum
    key: jax.Array
    # Recurrent-policy (c, h) carry, zeroed at episode boundaries; None for
    # the feedforward arch (pytree-stable: None is an empty subtree).
    hidden: Any = None
    # Terminal-guide per-env state (guided fine-tuning), re-initialized at
    # episode boundaries; None when no guide rides the rollout.
    guide_state: Any = None


def init_rollout(
    key: jax.Array,
    cfg: EnvConfig,
    num_envs: int,
    radius: jnp.ndarray | float | None = None,
    explore_bonus: jnp.ndarray | float | None = None,
    bank=None,
    hidden=None,
    guide=None,
) -> RolloutCarry:
    key, sub = jax.random.split(key)
    reset_keys = jax.random.split(sub, num_envs)
    env_state, obs = jax.vmap(lambda k: reset(k, cfg, radius, explore_bonus, bank))(reset_keys)
    guide_state = None
    if guide is not None:
        guide_state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + jnp.shape(x)),
            guide[0],
        )
    return RolloutCarry(
        env_state=env_state,
        obs=obs,
        accum=EpisodeAccum.zeros(num_envs),
        key=key,
        hidden=hidden,
        guide_state=guide_state,
    )


def rollout_chunk(
    params: Any,
    apply_fn: Callable,
    carry: RolloutCarry,
    cfg: EnvConfig,
    length: int,
    greedy: bool = False,
    bank=None,
    rnn=None,
    oracle=None,
    guide=None,
):
    """Run ``length`` fused policy+env steps for all envs.

    Returns ``(carry', traj: RolloutStep[T, N, ...], bootstrap_value: f32[N])``
    where ``bootstrap_value`` is V(obs_T) for GAE.  With ``greedy=True`` the
    policy takes argmax actions (the reference evaluators' mode,
    PPOV2.0/evaluate_with_lstm.py:79-82).

    ``rnn`` (a ``RecurrentActorCritic``) switches the policy to the
    recurrent step: ``carry.hidden`` is threaded through the scan and zeroed
    at episode boundaries alongside the env auto-reset.  The caller stores
    ``carry.hidden`` (the pre-chunk value) as the BPTT replay root; replay
    resets are ``done`` shifted by one step (rl/ppo.py
    ``ppo_update_recurrent``).

    ``oracle`` (a jittable ``fn(env_state) -> i32 action``, see
    ``evaluation.oracle.make_oracle``) labels every pre-step state into
    ``traj.oracle_action`` for distilled PPO — a handful of fused VPU ops
    per step, nothing when None.

    ``guide`` (``(init_state, step_fn)`` — the eval harness's terminal-
    guidance contract) runs IN the training rollout (round-5 policy-in-
    the-loop fine-tuning): the policy's sampled action is the guide's
    fallback, the env executes the guide's output, and ``traj.override``
    marks steps where the executed action differed from the policy's —
    the PPO update masks those from the policy surrogate (the policy was
    not in control, so its action carries no credit), while rewards,
    values, and GAE see the guided dynamics the eval protocol runs.
    ``carry.guide_state`` must be the vmapped guide state (see
    ``init_rollout``); it re-initializes at episode boundaries.
    """
    num_envs = carry.obs.shape[0]
    if guide is not None:
        guide_init, guide_fn = guide
        guide_init_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + jnp.shape(x)),
            guide_init,
        )

    # Pregenerate the chunk's randomness in three vectorized draws (one
    # threefry pass each) instead of splitting keys inside every scan step:
    # turbulence-displacement normals, Gumbel noise for categorical action
    # sampling (argmax(logits + gumbel) == Categorical sample), and reset
    # keys for episode-boundary field redraws.
    key, k_turb, k_gumbel, k_src, k_wind, k_bits = jax.random.split(carry.key, 6)
    turb_noise = jax.random.normal(
        k_turb, (length, num_envs, cfg.pos_dim), jnp.float32
    )
    if greedy:
        gumbel = jnp.zeros((length, num_envs, 1), jnp.float32)
    else:
        gumbel = jax.random.gumbel(
            k_gumbel, (length, num_envs, cfg.num_actions), jnp.float32
        )
    reset_u_src = jax.random.uniform(k_src, (length, num_envs, 2), jnp.float32)
    reset_u_wind = jax.random.uniform(k_wind, (length, num_envs, 2), jnp.float32)
    reset_bits = jax.random.bits(k_bits, (length, num_envs), jnp.uint32)
    carry = carry.replace(key=key)

    def body(c: RolloutCarry, xs):
        noise_t, gumbel_t, u_src_t, u_wind_t, bits_t = xs
        if rnn is not None:
            hidden, logits, value = rnn.apply(params, c.hidden, c.obs)
        else:
            hidden = c.hidden
            logits, value = apply_fn(params, c.obs)
        if greedy:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jnp.argmax(logits + gumbel_t, axis=-1)
        log_prob = jnp.sum(
            jax.nn.log_softmax(logits)
            * jax.nn.one_hot(action, logits.shape[-1], dtype=logits.dtype),
            axis=-1,
        )

        if guide is not None:
            new_gs, exec_action, _ = jax.vmap(guide_fn)(
                c.guide_state, c.env_state.pos, c.env_state.conc, action
            )
            override = exec_action != action
        else:
            new_gs, exec_action, override = c.guide_state, action, None

        env_state, trans = jax.vmap(lambda s, a, n: step_noise(s, a, n, cfg, bank))(
            c.env_state, exec_action, noise_t
        )
        info = trans.info

        acc = EpisodeAccum(
            total_reward=c.accum.total_reward + trans.reward,
            conc_reward=c.accum.conc_reward + info.concentration_reward,
            explore_reward=c.accum.explore_reward + info.explore_reward,
            move_penalty=c.accum.move_penalty + info.move_penalty,
            tke_penalty=c.accum.tke_penalty + info.tke_penalty,
            boundary_penalty=c.accum.boundary_penalty + info.boundary_penalty,
        )

        # Reference: source_conc / final coords recorded only on success
        # (train_ppo2.0.py:200-207).
        success = info.reached
        record = EpisodeRecord(
            done=trans.done,
            success=success,
            total_reward=acc.total_reward,
            steps=env_state.t,
            conc_reward=acc.conc_reward,
            explore_reward=acc.explore_reward,
            move_penalty=acc.move_penalty,
            tke_penalty=acc.tke_penalty,
            boundary_penalty=acc.boundary_penalty,
            final_conc=jnp.where(success, info.conc_raw, 0.0),
            final_x=env_state.pos[:, 0],
            final_y=env_state.pos[:, 1],
            source_x=env_state.field.source[:, 0],
            source_y=env_state.field.source[:, 1],
            radius=env_state.radius,
            distance=info.distance,
        )

        out = RolloutStep(
            obs=c.obs,
            action=action,
            log_prob=log_prob,
            value=value,
            reward=trans.reward,
            done=trans.done,
            pos=env_state.pos,
            conc=info.conc_raw,
            episode=record,
            oracle_action=(
                jax.vmap(oracle)(c.env_state) if oracle is not None else None
            ),
            override=override,
        )

        # Clear accumulators for envs that finished, then auto-reset them.
        done_f = trans.done.astype(jnp.float32)
        acc = jax.tree.map(lambda x: x * (1.0 - done_f), acc)
        env_state, next_obs = jax.vmap(
            lambda s, o, d, us, uw, b: auto_reset_from_draws(
                s, o, d, us, uw, b, cfg, bank
            )
        )(env_state, trans.obs, trans.done, u_src_t, u_wind_t, bits_t)
        if rnn is not None:
            # Episode-boundary memory reset, fused with the env auto-reset.
            hidden = jax.tree.map(
                lambda h: jnp.where(trans.done[:, None], 0.0, h), hidden
            )
        if guide is not None:
            # fresh guide state for envs that just reset (fused, branchless)
            new_gs = jax.tree.map(
                lambda g0, g: jnp.where(
                    trans.done.reshape((-1,) + (1,) * (g.ndim - 1)), g0, g
                ),
                guide_init_b, new_gs,
            )

        return RolloutCarry(env_state, next_obs, acc, c.key, hidden,
                            new_gs), out

    carry, traj = jax.lax.scan(
        body,
        carry,
        (turb_noise, gumbel, reset_u_src, reset_u_wind, reset_bits),
        length=length,
    )
    if rnn is not None:
        _, _, bootstrap_value = rnn.apply(params, carry.hidden, carry.obs)
    else:
        _, bootstrap_value = apply_fn(params, carry.obs)
    return carry, traj, bootstrap_value
